"""Physical-layout strategies for 100 TB: bucketing and skew salting.

- **Bucketing** (co-located joins): the metadata tables join on ``path``/
  ``parent`` constantly (entries↔prefixes in stats, staged↔previous in the
  incremental merge).  Writing both sides bucketed+sorted by the join key
  makes those joins shuffle-free sort-merge joins: Spark reads matching
  buckets pairwise and never exchanges the fact data.  At 100 TB the
  incremental merge over a re-scan becomes bucket-local.
- **Salting** (skew): a groupBy on a hot key (one uid owning half the
  corpus) funnels one reducer.  ``salted_group_sum`` spreads each key over
  ``n_salts`` sub-keys for the wide partial aggregation, then combines the
  (tiny) per-salt partials — two shuffles, both balanced.  AQE's skew-join
  splitting (enabled in session.py) covers the join case; this helper
  covers aggregation skew, which AQE does not rebalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed+sorted managed table (Parquet).  Joins between
    tables bucketed identically on the join key skip the exchange."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    writer = writer.sortBy(sort_col or bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Floor the partition count before a CPU-bound expression stage.

    Narrow inputs defeat wide clusters: a small Parquet file with one row
    group arrives as ONE split, so a signature/sketch computation that costs
    far more per row than the scan runs single-threaded no matter how many
    cores exist.  (`spark.sql.files.maxPartitionBytes` cannot split below
    the row-group boundary.)  When the scan has fewer input files than the
    cluster's default parallelism, pay one cheap round-robin shuffle of the
    raw rows to unlock the cores; when the input is already wide (the 100 TB
    case — thousands of splits), this is a no-op with zero added shuffle.

    Width is estimated from ``inputFiles()`` — a metadata-only listing —
    rather than ``df.rdd.getNumPartitions()``, which eagerly builds the
    physical plan outside AQE on every call.  Non-file-backed frames
    (in-memory fixtures, post-shuffle caches) report no files and take the
    repartition; at scale every hot input is a file scan, so the heuristic
    errs only on small local frames where the extra shuffle is noise.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits < target:
        return df.repartition(target)
    return df


def salted_group_sum(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof grouped sum: partial agg on (key, salt), then
    final agg on key.  The salt derives from a stable row hash, so results
    are deterministic; count columns survive because sum is associative."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    return partial.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
