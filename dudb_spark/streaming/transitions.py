"""Streaming first-order transition counting: the batch Markov
transition matrix (operators/timeseries.transition_matrix) as a
custom stateful streaming operator over ``applyInPandasWithState``.

Why streaming needs custom state here: adjacency crosses micro-batch
boundaries — the last event of batch k and the first event of batch
k+1 form a transition no window on either batch can see, and
Structured Streaming has no lag/lead on streams at all.  The state the
operator actually needs is ONE ROW per user (the last seen event's
label, wrapped with its (ts, id) order key): O(1) per group forever,
the most bounded state in the family (sessions hold open windows,
reservoirs hold n rows, register streams hold 2^p cells — this holds
three scalars).

Each micro-batch emits per-user transition-count DELTAS
(from_label, to_label, n); the consumer folds them with a plain
``groupBy(from,to).sum(n)`` — an exact integer aggregation, so the
streamed totals equal the batch window's counts value-for-value under
any time-ordered micro-batch split (certified against the identical
q184 oracle).

Ordering contract: batches must arrive per-user time-ordered (the file
source's mtime replay, a Kafka partition keyed by user, any
event-time-ordered ingest); within a batch rows sort by (ts, id) —
the batch operator's exact order — and the state row precedes the
batch by the contract.  Out-of-order delivery ACROSS batches is the
stream's problem, not this operator's (same contract as the
sessionizer's watermark assumption).

The reference has nothing stateful (SURVEY.md §2.9); this extends the
streaming family beside sessions.py, rollup.py, reservoir.py and
dedup.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("from_label", T.StringType()),
        T.StructField("to_label", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

TRANSITIONS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_label", T.StringType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def _transition_fn():
    import numpy as np

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        ts_parts, id_parts, lb_parts = [], [], []
        for pdf in pdfs:
            ts_parts.append(pdf["ts_us"].to_numpy(dtype=np.int64))
            id_parts.append(pdf["eid"].to_numpy(dtype=np.int64))
            lb_parts.append(pdf["lb"].to_numpy(dtype=object))
        ts = np.concatenate(ts_parts)
        ids = np.concatenate(id_parts)
        lbs = np.concatenate(lb_parts)
        # the batch operator's exact order: (ts, id)
        order = np.lexsort((ids, ts))
        ts, ids, lbs = ts[order], ids[order], lbs[order]

        labels = list(lbs)
        if state.exists:
            last_label, _lt, _li = state.get
            labels = [last_label] + labels
        counts: dict[tuple[str, str], int] = {}
        for a, b in zip(labels, labels[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        state.update((str(lbs[-1]), int(ts[-1]), int(ids[-1])))
        if counts:
            ks = list(counts)
            yield pd.DataFrame(
                {
                    "uid": np.full(len(ks), uid, np.int64),
                    "from_label": [k[0] for k in ks],
                    "to_label": [k[1] for k in ks],
                    "n": np.asarray([counts[k] for k in ks], np.int64),
                }
            )

    return fn


def stream_transitions(
    rows: DataFrame,
    key_col: str = "user_id",
    label_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Apply the stateful transition counter to a streaming frame.

    Returns per-micro-batch per-user count DELTAS; fold with
    ``groupBy("from_label", "to_label").agg(sum("n"))`` for the
    corpus matrix.  The (ts, id) order key is computed Spark-side
    (``unix_micros``) so the kernel only sorts int64s."""
    return (
        rows.select(
            F.col(key_col).alias("uid"),
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            F.col(id_col).alias("eid"),
            F.col(label_col).cast("string").alias("lb"),
        )
        .groupBy("uid")
        .applyInPandasWithState(
            _transition_fn(),
            outputStructType=TRANSITIONS_SCHEMA,
            stateStructType=TRANSITIONS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
