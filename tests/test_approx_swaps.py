"""The documented 100 TB swaps (exact → sketch) must actually be
accurate: q39 documents approx_count_distinct as the HLL path and q45
documents percentile_approx as the t-digest path.  These tests pin the
error bounds those claims rely on, over skewed data (Zipf-ish), since
uniform data flatters sketches."""

from __future__ import annotations

import pyspark.sql.functions as F


def _skewed(spark, n=200_000):
    # value = id^2 mod m: heavy repetition at small values, long tail
    return spark.range(n).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") * F.col("id")) % 9973).alias("v"),
        (F.col("id") % 5000).alias("u"),
    )


def test_approx_count_distinct_within_rsd(spark):
    df = _skewed(spark)
    rows = (
        df.groupBy("g")
        .agg(
            F.countDistinct("u").alias("exact"),
            F.approx_count_distinct("u", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.06, (
            r.g,
            r.exact,
            r.approx,
        )


def test_percentile_approx_within_tolerance(spark):
    df = _skewed(spark)
    rows = (
        df.groupBy("g")
        .agg(
            F.expr("percentile(v, 0.99)").alias("exact"),
            F.percentile_approx("v", 0.99, 10_000).alias("approx"),
        )
        .collect()
    )
    for r in rows:
        # with accuracy=10k the rank error is <= n/10k rows; on this
        # distribution that's well under 1% of the value scale
        assert abs(r.approx - r.exact) / max(r.exact, 1) < 0.01, (
            r.g,
            r.exact,
            r.approx,
        )
