"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact-to-fact join (entries ⋈
previous-snapshot entries during incremental merge, doc-pairs ⋈ docs,
…) is re-shuffling both sides on every run.  Hive-style bucketing
amortizes it: write each table hash-clustered into N buckets on the
join key, and Catalyst plans a SortMergeJoin with **zero Exchange** —
bucket i joins bucket i, data never moves.  The write itself pays one
clustering pass, which is the same shuffle the first join would have
needed; every later join is free.

Mechanics (all standard Spark):
- ``bucketBy(n, key)`` + ``sortBy(key)`` + ``saveAsTable`` — bucketing
  metadata lives in the session catalog (a path-only parquet write
  cannot carry it);
- both sides must agree on key and bucket count (or one side a
  multiple of the other with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- pick N so a bucket ≈ 100–200 MB at target scale: small enough to fit
  an executor's sort buffer, large enough to keep file counts sane.

The reference's analog is Badger's single sorted LSM keyspace — one
global clustering by path (SURVEY.md §1.3).  ``database compact``
covers the sorted-by-path layout; bucketing adds the hash-clustered
layout for equi-join-heavy workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted catalog table on ``key``."""
    keys = [key] if isinstance(key, str) else list(key)
    (
        df.write.mode(mode)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucketing metadata intact)."""
    return spark.table(table)
