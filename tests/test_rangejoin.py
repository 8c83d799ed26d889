"""Interval join: fuzz vs brute force; plan has no nested-loop join."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dudb_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 5000), min_size=1, max_size=30),
    st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 900)),
        min_size=1,
        max_size=15,
    ),
    st.sampled_from([60, 600, 3600]),
)
def test_interval_join_matches_bruteforce(spark, pts, ivs, bucket_s):
    points = [
        (i, T0 + dt.timedelta(seconds=s)) for i, s in enumerate(pts)
    ]
    intervals = [
        (
            j,
            T0 + dt.timedelta(seconds=lo),
            T0 + dt.timedelta(seconds=lo + ln),
        )
        for j, (lo, ln) in enumerate(ivs)
    ]
    pdf = spark.createDataFrame(points, ["pid", "ts"])
    idf = spark.createDataFrame(intervals, ["iid", "lo", "hi"])
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pdf, idf, bucket_s=bucket_s).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, ts in points
        for iid, lo, hi in intervals
        if lo <= ts <= hi
    )
    assert got == want


def test_no_nested_loop_in_plan(spark):
    pdf = spark.range(1000).select(
        F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    idf = spark.range(100).select(
        F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 600).alias("lo"),
        F.timestamp_seconds(F.col("id") * 600 + 1800).alias("hi"),
    )
    plan = (
        interval_join(pdf, idf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "hashpartitioning(_bucket" in plan or "Join _bucket" in plan or "[_bucket" in plan, plan
