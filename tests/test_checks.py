"""Data-quality checker tests: every rule must detect its violation."""

from __future__ import annotations

import pytest

from dudb_spark.operators.checks import quality_report


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0, 10),
            (2, None, 5.0, 10),      # null name
            (2, "c", 5.0, 10),       # duplicate id
            (3, "d", 99.0, 10),      # out-of-bounds v
            (4, "e", 5.0, 77),       # orphan ref
        ],
        ["id", "name", "v", "ref"],
    )


@pytest.fixture()
def parents(spark):
    return spark.createDataFrame([(10,), (11,)], ["pid"])


def test_quality_report_flags_violations(spark, dirty, parents):
    rows = {
        r["check"]: (r["metric"], r["passed"])
        for r in quality_report(
            dirty,
            completeness={"name": 1.0},
            unique=[["id"]],
            bounds={"v": (0.0, 10.0)},
            fk=[("ref", parents, "pid")],
            min_rows=3,
        ).collect()
    }
    assert rows["min_rows"] == (5.0, True)
    assert rows["completeness:name"] == (0.8, False)
    assert rows["uniqueness:id"] == (0.8, False)
    assert rows["bounds:v"] == (0.8, False)
    assert rows["fk:ref"] == (1.0, False)


def test_quality_report_clean_table_passes(spark, parents):
    clean = spark.createDataFrame(
        [(1, "a", 5.0, 10), (2, "b", 6.0, 11)], ["id", "name", "v", "ref"]
    )
    rows = quality_report(
        clean,
        completeness={"name": 1.0},
        unique=[["id"]],
        bounds={"v": (0.0, 10.0)},
        fk=[("ref", parents, "pid")],
        min_rows=2,
    ).collect()
    assert all(r["passed"] for r in rows)
    assert len(rows) == 5


def test_quality_report_partial_thresholds(spark, dirty):
    # a 0.8 completeness requirement tolerates the one null
    rows = {
        r["check"]: r["passed"]
        for r in quality_report(
            dirty, completeness={"name": 0.8}
        ).collect()
    }
    assert rows["completeness:name"]


def test_quality_report_null_fk_values_ignored(spark, parents):
    df = spark.createDataFrame(
        [(1, None), (2, 10)], ["id", "ref"]
    )
    rows = {
        r["check"]: r["passed"]
        for r in quality_report(df, fk=[("ref", parents, "pid")]).collect()
    }
    assert rows["fk:ref"]  # the null ref is not an orphan


def test_profile_table_metrics(spark):
    from dudb_spark.operators.checks import profile_table

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "a", 30.5), (4, None, 20.5)],
        ["id", "tag", "score"],
    )
    rows = {
        (r["column"], r["metric"]): r["value"]
        for r in profile_table(df, top_k=2).collect()
    }
    assert rows[("id", "count")] == "4"
    assert rows[("id", "nulls")] == "0"
    assert rows[("tag", "nulls")] == "1"
    assert rows[("tag", "distinct")] == "2"  # nulls not a distinct value
    assert rows[("tag", "min")] == "a" and rows[("tag", "max")] == "b"
    assert rows[("score", "mean")] == "20.333333"  # fixed-point string
    assert rows[("tag", "top_1:a")] == "2"
    assert rows[("tag", "top_2:b")] == "1"
    # null never appears as a top value
    assert not any(m.startswith("top_") and ":None" in m
                   for (_, m) in rows if _ == "tag")


def test_profile_table_top_ties_break_by_value(spark):
    from dudb_spark.operators.checks import profile_table

    df = spark.createDataFrame([("z",), ("y",), ("z",), ("y",)], ["v"])
    rows = {
        r["metric"]: r["value"]
        for r in profile_table(df, top_k=2).collect()
        if r["metric"].startswith("top_")
    }
    assert rows == {"top_1:y": "2", "top_2:z": "2"}


def test_profile_table_auto_tiers_distinct_counts(spark):
    """Above approx_threshold rows the profile swaps every exact
    COUNT(DISTINCT) for approx_count_distinct: the rows×columns Expand
    pass disappears from the plan (the 100 TB hazard), values stay
    plausible; at/below the threshold (and with threshold=None) the
    counts are exact."""
    from dudb_spark.operators.checks import profile_table

    df = spark.createDataFrame(
        [(i % 7, f"s{i % 13}") for i in range(100)], ["a", "b"]
    )
    exact = profile_table(df)  # 100 rows <= default threshold
    got = {(r["column"], r["metric"]): r["value"] for r in exact.collect()}
    assert got[("a", "distinct")] == "7"
    assert got[("b", "distinct")] == "13"
    plan = exact._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_count_distinct" not in plan

    approx = profile_table(df, approx_threshold=0)
    plan = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_count_distinct" in plan  # HLL++, no Expand anywhere
    got = {(r["column"], r["metric"]): int(r["value"])
           for r in approx.collect() if r["metric"] == "distinct"}
    # HLL++ at default rsd is exact-ish at this cardinality
    assert abs(got[("a", "distinct")] - 7) <= 1
    assert abs(got[("b", "distinct")] - 13) <= 1
    # None forces exact regardless of size (no pre-count job)
    got = {(r["column"], r["metric"]): r["value"]
           for r in profile_table(df, approx_threshold=None).collect()}
    assert got[("a", "distinct")] == "7"


def test_tier_estimate_prefers_plan_rowcount(spark):
    """A plan that carries a rowCount statistic (Range does, even
    without CBO) tiers on the exact number — no count job, no
    size-derived guesswork."""
    from dudb_spark.operators.checks import _tier_row_estimate

    est, is_exact = _tier_row_estimate(spark.range(12345))
    assert (est, is_exact) == (12345, True)


def test_tier_estimate_size_path_biases_safe(spark):
    """Size-derived estimates come from COMPRESSED bytes and can be low
    by orders of magnitude, so the exact multi-COUNT(DISTINCT) Expand
    tier is only chosen when the estimate clears the threshold by 10x;
    anything nearer tiers approx (the bounded plan) — the 100 TB/OOM
    hazard stays closed even when the heuristic under-estimates."""
    from dudb_spark.operators.checks import _tier_row_estimate, profile_table

    # a Filter drops the rowCount statistic -> the size heuristic path
    df = (
        spark.range(200)
        .selectExpr("cast(id % 7 as int) AS a")
        .where("a >= 0")
    )
    est, is_exact = _tier_row_estimate(df)
    assert not is_exact and est > 0

    def plan(threshold):
        p = profile_table(df, columns=["a"], approx_threshold=threshold)
        return p._jdf.queryExecution().optimizedPlan().toString()

    # within 10x of the threshold: approx despite est <= threshold
    assert "approx_count_distinct" in plan(est * 5)
    # comfortably above: exact
    assert "approx_count_distinct" not in plan(est * 20)


def test_robust_outliers_goldens(spark):
    """Hand-computed median/MAD: values {1..9, 100} per one group ->
    med 5.5, deviations {4.5,3.5,...,0.5,94.5} -> MAD 2.5; only 100
    breaks |x-5.5| > 3*2.5.  A constant group has MAD 0 and any
    deviation flags; NULLs drop."""
    from dudb_spark.operators.checks import robust_outliers

    rows = [("a", float(i)) for i in range(1, 10)] + [("a", 100.0)]
    rows += [("b", 7.0)] * 5 + [("b", 8.0)]      # MAD 0, one deviant
    rows += [("c", None)] + [("c", 1.0), ("c", 2.0)]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r["g"]: r for r in robust_outliers(
        df, ["g"], "value", k=3.0).collect()}
    a = got["a"]
    assert (a["n_rows"], a["med"], a["mad"], a["n_outliers"]) == (
        10, 5.5, 2.5, 1)
    assert a["outlier_ppm"] == 100_000
    b = got["b"]
    assert (b["med"], b["mad"], b["n_outliers"]) == (7.0, 0.0, 1)
    c = got["c"]
    assert (c["n_rows"], c["med"]) == (2, 1.5)


def test_fd_violations_goldens(spark):
    """a=1 carries {x,y} -> violation (2 distinct over 3 rows); a=2 is
    clean; a=3 carries {x, NULL} -> NOT a violation (COUNT DISTINCT
    ignores NULLs, documented)."""
    from dudb_spark.operators.checks import fd_violations

    rows = [(1, "x"), (1, "y"), (1, "x"), (2, "x"),
            (3, "x"), (3, None)]
    df = spark.createDataFrame(rows, "a long, b string")
    got = {r["a"]: (r["n_rows"], r["n_rhs"])
           for r in fd_violations(df, ["a"], "b").collect()}
    assert got == {1: (3, 2)}
