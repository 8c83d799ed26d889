"""Z-order layout: key correctness and a QUANTITATIVE skipping benefit —
per-partition min/max spans (what Parquet footer pruning sees) must
shrink on BOTH dimensions vs a single-column sort layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from dudb_spark.plans.zorder import with_z, zorder_layout


def test_z_value_golden(spark):
    # two 2-bit-ish values: bounds (0..3) normalize 0→0, 3→65535;
    # interleave of (0,3) puts col2's bits at odd positions
    df = spark.createDataFrame(
        [(0, 0), (3, 3), (0, 3), (3, 0)], ["a", "b"]
    )
    z = {(r["a"], r["b"]): r["z"] for r in with_z(df, ["a", "b"]).collect()}
    assert z[(0, 0)] == 0
    # a=3 → 0xFFFF at even bits; b=3 → 0xFFFF at odd bits
    even = sum(1 << (2 * k) for k in range(16))
    odd = sum(1 << (2 * k + 1) for k in range(16))
    assert z[(3, 0)] == even
    assert z[(0, 3)] == odd
    assert z[(3, 3)] == even + odd


def _avg_spans(df, n_parts):
    spans = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        )
        .agg(F.avg("sa").alias("sa"), F.avg("sb").alias("sb"))
        .collect()[0]
    )
    return spans["sa"], spans["sb"]


def test_zorder_shrinks_file_ranges(spark):
    n = 100
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )
    parts = 16
    naive = grid.repartitionByRange(parts, "a").sortWithinPartitions("a")
    na, nb = _avg_spans(naive, parts)
    zed = zorder_layout(grid, ["a", "b"], parts)
    za, zb = _avg_spans(zed, parts)
    # single-column sort: tight on a, useless on b
    assert na < n / parts + 2 and nb > 0.9 * (n - 1)
    # z-order: BOTH dims well under the full range; total span much lower
    assert za < 0.5 * (n - 1) and zb < 0.5 * (n - 1)
    assert za + zb < 0.7 * (na + nb)
