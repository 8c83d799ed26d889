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
