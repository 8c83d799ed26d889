"""Bucketed tables: the join plan must have NO Exchange — that's the
entire point of paying the clustering write."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dudb_spark.sources.bucketed import read_table, write_bucketed


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "t_bucket_a", "k", buckets=8)
    write_bucketed(b, "t_bucket_b", "k", buckets=8)
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # force the sort-merge path so a broadcast can't mask the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, ta).join(read_table(spark, tb), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        assert j.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_table(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 10_000
