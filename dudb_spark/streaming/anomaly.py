"""Streaming rolling-window anomaly detection: the batch operator
(operators/timeseries.rolling_anomalies) as a custom stateful streaming
operator over ``applyInPandasWithState``.

Why streaming needs custom state here: the batch form is a trailing
ROWS-frame window, and Structured Streaming has no sliding row-frame
window — the built-in windowed aggregations are time-bucketed.  The
state that makes it incremental is tiny and exact: the last
``lookback`` (ts, id, quantized-value) triples per key — O(lookback)
rows per user regardless of stream length, sharded by user hash on a
real cluster.  Compare the batch plan, which sorts every user's full
partition; the stream pays that cost never and judges each event once,
on arrival.

Determinism carries over from the batch design: values are quantized to
integer units SPARK-SIDE (so the kernel never re-rounds floats), the
z-test is held entirely in int64 ((n·q−s)² > z²·(n·Σq²−s²)), and the
per-batch kernel is vectorized numpy prefix-sums — no per-event Python.

Ordering contract: within a micro-batch, events sort by (ts, id); the
operator assumes per-key event time is non-decreasing ACROSS
micro-batches (the replayed-file staging used by the gates guarantees
it; a live deployment gets it from any time-ordered source).  An event
arriving after a later-ts event of the same key is judged against the
trailing window available at arrival — the online best-effort — and
exact batch parity is certified under the ordered staging
(q161 == q159's SQL oracle, value-exact).

The reference has nothing stateful (SURVEY.md §2.9); this extends the
streaming family beside sessions.py and rollup.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("key", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_prior", T.LongType()),
        T.StructField("dev_n", T.LongType()),
        T.StructField("var_n", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

ANOMALY_STATE_SCHEMA = T.StructType(
    [
        # the last `lookback` events by (ts, id): the entire state
        T.StructField("ts_buf", T.ArrayType(T.LongType())),
        T.StructField("id_buf", T.ArrayType(T.LongType())),
        T.StructField("qv_buf", T.ArrayType(T.LongType())),
    ]
)


def _anomaly_fn(lookback: int, min_prior: int, z: int):
    import numpy as np

    z2 = int(z * z)

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            p_ts, p_id, p_qv = (
                np.asarray(a, dtype=np.int64) for a in state.get
            )
        else:
            p_ts = p_id = p_qv = np.empty(0, np.int64)

        ts_parts, id_parts, qv_parts, val_parts = [], [], [], []
        for pdf in pdfs:
            ts_parts.append(pdf["ts"].astype("int64").to_numpy() // 1000)
            id_parts.append(pdf["event_id"].to_numpy(dtype=np.int64))
            qv_parts.append(pdf["qv"].to_numpy(dtype=np.int64))
            val_parts.append(pdf["value"].to_numpy(dtype=np.float64))
        n_ts = np.concatenate(ts_parts) if ts_parts else np.empty(0, np.int64)
        n_id = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
        n_qv = np.concatenate(qv_parts) if qv_parts else np.empty(0, np.int64)
        n_val = (
            np.concatenate(val_parts) if val_parts
            else np.empty(0, np.float64)
        )
        if n_ts.size > 1:
            order = np.lexsort((n_id, n_ts))  # (ts, id) ascending
            n_ts, n_id, n_qv, n_val = (
                n_ts[order], n_id[order], n_qv[order], n_val[order]
            )

        npast = p_ts.size
        a_qv = np.concatenate([p_qv, n_qv])
        # prefix sums over the combined buffer; the trailing window of
        # judged event j (combined index npast+i) is the ≤lookback
        # entries before it — always fully present, because the state
        # buffer retains the last `lookback` of the past
        cs = np.concatenate(([0], np.cumsum(a_qv, dtype=np.int64)))
        cs2 = np.concatenate(
            ([0], np.cumsum(a_qv * a_qv, dtype=np.int64))
        )
        j = npast + np.arange(n_ts.size, dtype=np.int64)
        lo = np.maximum(j - lookback, 0)
        n = j - lo
        s = cs[j] - cs[lo]
        ss = cs2[j] - cs2[lo]
        dev_n = n * n_qv - s
        var_n = n * ss - s * s
        judged = n >= min_prior
        flag = dev_n * dev_n > z2 * var_n

        # next state: the last `lookback` of the combined (ordered) run
        a_ts = np.concatenate([p_ts, n_ts])
        a_id = np.concatenate([p_id, n_id])
        keep = slice(max(0, a_ts.size - lookback), a_ts.size)
        state.update((
            [int(x) for x in a_ts[keep]],
            [int(x) for x in a_id[keep]],
            [int(x) for x in a_qv[keep]],
        ))

        yield pd.DataFrame(
            {
                "id": n_id[judged],
                "key": np.full(int(judged.sum()), user_id, np.int64),
                "ts": pd.to_datetime(n_ts[judged], unit="us"),
                "value": n_val[judged],
                "n_prior": n[judged],
                "dev_n": dev_n[judged],
                "var_n": var_n[judged],
                "is_anomaly": flag[judged],
            }
        )

    return fn


def stream_rolling_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    lookback: int = 12,
    min_prior: int = 6,
    z: int = 3,
) -> DataFrame:
    """Apply the stateful rolling-anomaly operator to a streaming events
    frame.  Quantization happens HERE, Spark-side (same F.round as the
    batch operator), so the kernel's integers are bit-identical to the
    batch plan's."""
    qv = F.round(F.col(value_col) * scale).cast("long").alias("qv")
    # NULL values dropped up front, matching the batch operator — a NaN
    # reaching the kernel's int64 cast would kill the query, and a null
    # occupying a frame slot would diverge from the batch window
    events = events.where(F.col(value_col).isNotNull())
    return (
        events.select(
            F.col(id_col).alias("event_id"),
            F.col(key_col).alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            qv,
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _anomaly_fn(lookback, min_prior, z),
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
