"""Custom stateful streaming operator: per-user session windows.

The reference has nothing stateful (SURVEY.md §2.9); this is the engine's
demonstration of the ``applyInPandasWithState`` extension point — the
escape hatch for operators Structured Streaming lacks natively (session
windows with custom close conditions, per-key sketches, ...).

Semantics: consecutive events of one user belong to one session while the
gap between them is ≤ ``gap``; a longer gap closes the session and emits
one row ``(user_id, session_start, session_end, n_events, sum_value)``.
The still-open trailing session stays in state (a production pipeline
closes it via event-time timeout once the watermark passes; with
``availableNow`` test triggers the stream ends first, so trailing sessions
are intentionally unemitted).

State is one fixed-size tuple per user — bounded by the key cardinality,
the watermark expires idle keys — so a 1000-executor deployment shards it
by user hash with no skew beyond the busiest single user.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _us(ts) -> int:
    return int(ts.value // 1000)  # pandas Timestamp ns → µs


def _session_fn(gap_us: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            start, last, n, v = state.get
        else:
            start, last, n, v = None, None, 0, 0.0

        closed = []
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values("ts")
        for ts, val in zip(events["ts"], events["value"]):
            t = _us(ts)
            if start is None:
                start, last, n, v = t, t, 1, float(val)
            elif t - last > gap_us:
                closed.append((user_id, start, last, n, v))
                start, last, n, v = t, t, 1, float(val)
            else:
                last, n, v = t, n + 1, v + float(val)
        state.update((start, last, n, v))

        out = pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    return fn


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Apply the stateful session operator to a streaming events frame."""
    unit_us = {"minutes": 60_000_000, "seconds": 1_000_000, "hours": 3_600_000_000}
    qty, unit = gap.split()
    gap_us = int(qty) * unit_us[unit]
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch_oracle(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch restatement (lag + cumulative-sum session ids) used by tests:
    every session except each user's trailing one must match the stateful
    operator's emissions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    qty, unit = gap.split()
    gap_expr = f"INTERVAL {qty} {unit}"
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.select("user_id", "ts", "value")
        .withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | (F.col("ts") > F.expr(f"prev + {gap_expr}")),
        )
        .withColumn(
            "sess_id", F.sum(F.col("new_sess").cast("long")).over(w)
        )
    )
    agg = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    # drop each user's trailing (still-open) session
    wmax = Window.partitionBy("user_id")
    return (
        agg.withColumn("max_sess", F.max("sess_id").over(wmax))
        .where(F.col("sess_id") < F.col("max_sess"))
        .drop("sess_id", "max_sess")
    )
