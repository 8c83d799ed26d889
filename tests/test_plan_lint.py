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


def test_linter_flags_unpruned_scan(spark):
    """A null-safe wrapper (coalesce) around a scan-column predicate
    blocks BOTH the comparison pushdown and the IsNotNull inference —
    the scan reads every row group while looking innocently filtered.
    The rule fires only for a Filter DIRECTLY on the scan: a filter
    that survives above a Project needs a computed column and genuinely
    cannot push."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = d.where(
        F.coalesce(F.col("source"), F.lit("x")) == "cc"
    ).groupBy("lang").count()
    assert any(f.rule == "unpruned-scan" for f in lint_plan(bad))

    good = d.where(F.col("source") == "cc").groupBy("lang").count()
    assert [f for f in lint_plan(good) if f.rule == "unpruned-scan"] == []

    # filter on a derived column: sits above a Project, exempt
    derived = (
        d.select((F.length("text") % 7).alias("b"), "lang")
        .where(F.col("b") == 3)
        .groupBy("lang").count()
    )
    assert [f for f in lint_plan(derived)
            if f.rule == "unpruned-scan"] == []


def test_collect_site_audit_has_no_unallowed_or_stale():
    """Round-10 verdict item 5a: a data-proportional collect() is
    invisible to any plan, so the audit reads the SOURCE — every
    .collect()/.toPandas() in the package must carry a written
    boundedness reason in linter.COLLECT_ALLOW, and every reason must
    still match a live site."""
    from dudb_spark.plans.linter import lint_collect_sites

    unallowed, stale = lint_collect_sites()
    assert unallowed == {}, unallowed
    assert stale == set(), stale


def test_pin_site_audit_has_no_unallowed_or_stale():
    """Round-11 verdict item 7 (spill-aware pin policy): every
    .localCheckpoint() in the package must carry a written size/storage
    rationale in linter.PIN_ALLOW — what bounds the pinned frame at
    100 TB, or an explicit corpus-sized warning naming the
    cluster-scale alternative — and every rationale must still match a
    live site."""
    from dudb_spark.plans.linter import lint_pin_sites

    unallowed, stale = lint_pin_sites()
    assert unallowed == {}, unallowed
    assert stale == set(), stale


def test_collect_site_scanner_sees_through_nesting(tmp_path):
    """The AST scanner attributes sites to their nested qualname and
    ignores comments/strings."""
    from dudb_spark.plans.linter import collect_sites

    pkg = tmp_path / "pkg"
    pkg.mkdir()
    (pkg / "m.py").write_text(
        "def outer():\n"
        "    def inner(df):\n"
        "        return df.collect()\n"
        "    # df.collect() in a comment\n"
        "    s = 'df.collect()'\n"
        "    return inner\n"
        "x = None\n"
    )
    sites = collect_sites(str(pkg))
    assert sites == [("m.py", "outer.inner", 3)]
