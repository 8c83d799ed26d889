"""Streaming weighted reservoir: the batch A-ES weighted sample
(pipeline/sampling.weighted_sample) as a custom stateful streaming
operator over ``applyInPandasWithState``.

Why streaming needs custom state here: "keep n rows drawn ∝ weight
from everything seen so far" is exactly the reservoir problem
Efraimidis & Spirakis designed A-ES for (IPL 2006) — and Structured
Streaming has no top-n aggregation (rank windows are unsupported on
streams; collecting all rows to rank later is unbounded state).  The
A-ES key makes the reservoir MERGEABLE: the top-n keys of a union are
the top-n of the per-shard top-n's, so per-micro-batch state is just
the current n best (key, id, weight) triples per group — O(n) rows per
group regardless of stream length, the same bounded-state argument as
the HLL/CMS/histogram register streams (rollup.py), here for SAMPLING.

Determinism carries over from the batch design: the key ``ln(u)/w`` is
computed SPARK-side from the exact 31-bit MINSTD coordinate (the same
column expression as the batch sampler), so the kernel only sorts and
truncates — identical doubles compare identically, and the streamed
reservoir equals the batch top-n value-for-value under any
micro-batch split (certified against the batch SQL oracle, q169).

Each batch emits the group's full current reservoir stamped with a
per-group ``batch_seq``; the consumer keeps the max-seq emission per
group (the final reservoir) — an update-shaped output through an
append-mode sink, the pattern complete-mode register streams get for
free but per-group custom state cannot use.

The reference has nothing stateful (SURVEY.md §2.9); this extends the
streaming family beside sessions.py, rollup.py and anomaly.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RESERVOIR_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("item_id", T.LongType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("batch_seq", T.LongType()),
    ]
)

RESERVOIR_STATE_SCHEMA = T.StructType(
    [
        # the current reservoir: n best (key, id, weight), plus the
        # per-group emission counter
        T.StructField("key_buf", T.ArrayType(T.DoubleType())),
        T.StructField("id_buf", T.ArrayType(T.LongType())),
        T.StructField("w_buf", T.ArrayType(T.DoubleType())),
        T.StructField("seq", T.LongType()),
    ]
)


def _reservoir_fn(n: int):
    import numpy as np

    def fn(key, pdfs, state: GroupState):
        (grp,) = key
        if state.exists:
            p_key, p_id, p_w, seq = state.get
            p_key = np.asarray(p_key, dtype=np.float64)
            p_id = np.asarray(p_id, dtype=np.int64)
            p_w = np.asarray(p_w, dtype=np.float64)
        else:
            p_key = np.empty(0, np.float64)
            p_id = np.empty(0, np.int64)
            p_w = np.empty(0, np.float64)
            seq = 0

        k_parts, i_parts, w_parts = [], [], []
        for pdf in pdfs:
            k_parts.append(pdf["aes_key"].to_numpy(dtype=np.float64))
            i_parts.append(pdf["item_id"].to_numpy(dtype=np.int64))
            w_parts.append(pdf["weight"].to_numpy(dtype=np.float64))
        a_key = np.concatenate([p_key] + k_parts)
        a_id = np.concatenate([p_id] + i_parts)
        a_w = np.concatenate([p_w] + w_parts)

        # top-n by (key desc, id asc) — the batch sampler's exact order
        order = np.lexsort((a_id, -a_key))[:n]
        a_key, a_id, a_w = a_key[order], a_id[order], a_w[order]
        seq = int(seq) + 1
        state.update((
            [float(x) for x in a_key],
            [int(x) for x in a_id],
            [float(x) for x in a_w],
            seq,
        ))
        yield pd.DataFrame(
            {
                "grp": np.full(a_id.size, grp, dtype=object),
                "item_id": a_id,
                "weight": a_w,
                "batch_seq": np.full(a_id.size, seq, np.int64),
            }
        )

    return fn


def stream_weighted_reservoir(
    rows: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    n: int,
    salt: int = 0,
) -> DataFrame:
    """Apply the stateful weighted-reservoir operator to a streaming
    frame.  The A-ES key is computed HERE, Spark-side (the identical
    expression as pipeline/sampling.weighted_sample), so the kernel's
    doubles are bit-identical to the batch plan's; NULL/non-positive
    weights are excluded up front — the batch sampler's w→0 contract,
    and a NaN key would poison the lexsort."""
    from dudb_spark.pipeline.sampling import aes_key

    wc = F.col(weight_col)
    rows = rows.where(wc.isNotNull() & (wc > 0))
    return (
        rows.select(
            F.col(group_col).cast("string").alias("grp"),
            F.col(id_col).alias("item_id"),
            wc.cast("double").alias("weight"),
            aes_key(F.col(id_col), wc, salt).alias("aes_key"),
        )
        .groupBy("grp")
        .applyInPandasWithState(
            _reservoir_fn(n),
            outputStructType=RESERVOIR_SCHEMA,
            stateStructType=RESERVOIR_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
