"""The plan linter (dudb_spark/plans/linter.py) and its zero-findings
sweep over the ENTIRE query suite — the 100 TB scale audit as a test.
A new query that introduces a cartesian, an unpartitioned window, a
row-wise Python UDF, or a run of single-partition exchanges fails here
unless it is explicitly allowlisted with a written justification in
__spark_entry__.PLAN_LINT_ALLOW."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dudb_spark.plans.linter import lint_plan


def test_linter_flags_cartesian(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    spark.conf.set("spark.sql.crossJoin.enabled", "true")
    fs = lint_plan(a.crossJoin(b))
    assert any(f.rule in ("cartesian", "nested-loop") for f in fs), fs


def test_linter_flags_unpartitioned_ordered_window(spark):
    df = spark.range(100).select(
        F.col("id"),
        F.row_number().over(Window.orderBy("id")).alias("rn"),
    )
    fs = lint_plan(df)
    assert any(f.rule == "global-window" for f in fs), fs


def test_linter_accepts_partitioned_unordered_window(spark):
    df = spark.range(100).select(
        F.col("id"),
        F.count(F.lit(1)).over(
            Window.partitionBy(F.col("id") % 7)
        ).alias("c"),
    )
    assert [f for f in lint_plan(df) if f.rule == "global-window"] == []


def test_linter_flags_row_python_udf(spark):
    from pyspark.sql.functions import udf

    plus = udf(lambda x: x + 1, "bigint")
    fs = lint_plan(spark.range(10).select(plus("id").alias("y")))
    assert any(f.rule == "row-python-udf" for f in fs), fs


def test_linter_accepts_clean_aggregation(spark):
    df = spark.range(1000).groupBy((F.col("id") % 10).alias("g")).agg(
        F.sum("id").alias("s")
    )
    assert lint_plan(df) == []


def test_whole_suite_sweep_has_no_unallowed_findings(spark):
    """Every queries() plan, linted at sf0.001: findings must be empty
    or carry an allowlist justification.  This is the regression net
    behind PLANS.md's hand-audited census."""
    import __spark_entry__ as em
    from dudb_spark.plans.linter import lint_queries

    results = lint_queries(
        em.queries(), spark, "/root/testdata/sf0.001",
        allow=em.PLAN_LINT_ALLOW,
    )
    bad = {
        name: [(f.rule, f.detail) for f in fs if f.allowed is None]
        for name, fs in results.items()
    }
    bad = {k: v for k, v in bad.items() if v}
    assert bad == {}, bad
    # the allowlist itself must not rot: every allowed rule must still
    # fire (a stale entry hides future regressions behind a dead excuse)
    fired = {
        (name, f.rule)
        for name, fs in results.items()
        for f in fs
        if f.allowed is not None
    }
    stale = {
        (name, rule)
        for name, rules in em.PLAN_LINT_ALLOW.items()
        for rule in rules
        if (name, rule) not in fired
    }
    assert stale == set(), stale
