"""Distributed prefix sum (running total over a global order) and
sequence packing built on it.

A global running total is the textbook Spark scale trap: ``Window
.orderBy(x)`` with no partition key collapses the whole table into ONE
task.  The scalable shape is the classic two-phase parallel prefix sum:

1. range-partition by the order column (so partition i holds a
   contiguous, sorted slice);
2. per-partition running totals — a window partitioned by
   ``spark_partition_id()``, so every task sorts only its slice;
3. per-partition grand totals — a tiny frame (one row per partition)
   turned into exclusive offsets by a non-equi self-join (``r._pid <
   l._pid`` summed), NOT a window: even over #partitions rows an
   ``orderBy``-only window is an unpartitioned WindowExec, which both
   trips Spark's single-partition warning and would be a real serial
   stage if a caller passed a huge partition count;
4. broadcast-join the offsets back and add them to each local total.

Total cost: one range-exchange (+ its boundary-sampling pass) and a
broadcast of #partitions rows (the offsets join is a broadcast
nested-loop over #partitions² ~ 10³ cells — driver-trivial).  The
result is identical to the single-task window for any partition
boundaries, because range partitioning preserves the global order
between partitions — so the operator is deterministic even though the
sampled boundaries are not.

**Sequence packing** (the consumer): concat-and-chunk document packing
for LLM training — documents in a stable order, cut into shards of
``budget`` tokens.  ``shard = floor(exclusive_running_total / budget)``:
a document straddling a boundary goes to the shard where it started,
exactly the semantics of streaming concatenation.  One prefix sum, no
driver loop, restatable in ANSI SQL for the oracle.

The reference has no running-total operator (its folds are per-prefix,
stats/totals.go:144–209); this is a scale extension for the
training-pipeline surface (SURVEY.md §7 step 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exclusive_offsets(
    per_pid: DataFrame, sum_col: str, out: str = "_off"
) -> DataFrame:
    """``(_pid, out)`` where ``out`` = sum of ``sum_col`` over all rows
    with a strictly smaller ``_pid`` — the exclusive prefix of a tiny
    one-row-per-partition frame, computed with a non-equi self-join so
    the plan contains NO unpartitioned window (every WindowExec in a
    consumer's plan stays keyed; pinned by test_prefix/test_plans)."""
    left = per_pid.select("_pid").alias("l")
    right = per_pid.select("_pid", sum_col).alias("r")
    return (
        left.join(
            F.broadcast(right),
            F.col("r._pid") < F.col("l._pid"),
            "left",
        )
        .groupBy(F.col("l._pid").alias("_pid"))
        .agg(F.coalesce(F.sum(F.col(f"r.{sum_col}")), F.lit(0)).alias(out))
    )


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running total of ``value_col`` over the global
    ``order_col`` order, without a single-task global window.  Ties in
    ``order_col`` across a partition boundary would make the split
    ambiguous, so the order column must be unique (ids, paths)."""
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    d = df.repartitionByRange(int(n), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("_local", F.sum(value_col).over(w_local))
    # one row per partition — driver-size data, broadcast back
    offsets = exclusive_offsets(
        local.groupBy("_pid").agg(F.sum(value_col).alias("_psum")),
        "_psum",
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_local") + F.col("_off"))
        .drop("_pid", "_local", "_off")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    budget: int,
    shard_col: str = "shard",
) -> DataFrame:
    """Assign each document to a token-budgeted training shard
    (concat-and-chunk): shard = exclusive running token total / budget."""
    cum = distributed_cumsum(df, order_col, tokens_col, out="_cum_tokens")
    return (
        cum.withColumn(
            shard_col,
            F.floor(
                (F.col("_cum_tokens") - F.col(tokens_col)) / F.lit(budget)
            ).cast("long"),
        )
        .withColumnRenamed("_cum_tokens", "cum_tokens")
    )


def select_to_budget(
    df: DataFrame,
    score_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Greedy data selection under a global token budget: rank documents
    by (``score_col`` DESC, ``id_col`` ASC) and keep the maximal prefix
    whose running token total fits ``budget`` — whole documents only;
    the first straddler and everything below it are dropped.  The
    corpus-construction move behind "keep the best N tokens" quality
    filtering (Gopher/FineWeb-style), made deterministic and rerun-stable.

    Scale shape: the (score, id) rank is packed into ONE unique int64
    key — ``(2^30 - score) * 2^32 + id`` — so :func:`distributed_cumsum`
    applies unchanged: repartitionByRange on the key, per-partition
    running totals, broadcast offset join.  No unpartitioned window, no
    driver data; the budget cut is a scan-side filter on the summed
    column.  Domain (documented, not checked — a check would cost an
    action): integer score with |score| < 2^30, id in [0, 2^32); the
    packed key then peaks at exactly 2^63 - 1 (ANSI mode verifies this
    bound for free — an out-of-domain score overflows loudly, never
    silently misorders).
    """
    key = (
        (F.lit(1 << 30) - F.col(score_col).cast("long")) * F.lit(1 << 32)
        + F.col(id_col).cast("long")
    )
    cum = distributed_cumsum(
        df.withColumn("_bkey", key), "_bkey", tokens_col, out=cum_col
    )
    return cum.where(F.col(cum_col) <= budget).drop("_bkey")
