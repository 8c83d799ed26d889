"""Report sinks (S11–S14) + operational queries (errors/logs, id→name)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from dudb_spark.model import FsTables
from dudb_spark.operators.ops import list_errors, list_logs, parse_time_range, with_names
from dudb_spark.operators.stats import StatsOptions, compute_stats
from dudb_spark.reports import (
    locate_reports,
    write_reports,
)


@pytest.fixture(scope="module")
def stats_result(spark, fs_dir):
    t = FsTables(spark, fs_dir)
    return compute_stats(t.prefixes, t.entries, StatsOptions())


def test_write_reports_layout(spark, fs_dir, stats_result, tmp_path):
    t = FsTables(spark, fs_dir)
    root = str(tmp_path / "reports")
    when = datetime(2025, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
    out = write_reports(
        stats_result, root, display_n=5, when=when, users=t.users, groups=t.groups
    )
    assert os.path.basename(out) == "2025-06-01-120000"
    # S11 TSV: header + tab separated
    tsv_files = [
        f for f in os.listdir(f"{out}/tsv") if f.endswith(".csv")
    ]
    content = open(f"{out}/tsv/{tsv_files[0]}").read()
    assert "\t" in content and "prefix" in content.splitlines()[0]
    # S12 JSON-lines
    json_files = [f for f in os.listdir(f"{out}/json") if f.endswith(".json")]
    assert json_files
    # S13 markdown with named users (alice from the fixture dim)
    md = open(f"{out}/markdown/report.md").read()
    assert "## Totals" in md and "alice" in md
    # S14 latest pointer + locate
    assert open(f"{root}/latest").read() == "2025-06-01-120000"
    loc = locate_reports(root, 2)
    assert loc[0]["report"] == "2025-06-01-120000"


def test_locate_orders_desc(tmp_path, spark, fs_dir, stats_result):
    t = FsTables(spark, fs_dir)
    root = str(tmp_path / "reports2")
    for d in (1, 2):
        write_reports(
            stats_result,
            root,
            display_n=2,
            when=datetime(2025, 6, d, tzinfo=timezone.utc),
        )
    loc = locate_reports(root, 5)
    assert [x["report"] for x in loc] == ["2025-06-02-000000", "2025-06-01-000000"]


def test_list_errors(spark, fs_dir):
    t = FsTables(spark, fs_dir)
    res = list_errors(t.errors, root="/tree/d0-0").collect()
    assert all(r["path"].startswith("/tree/d0-0") for r in res)
    assert len(res) > 0
    # time-bounded: all fixture errors are at BASE_TIME+1d
    none = list_errors(t.errors, from_t="2030-01-01").collect()
    assert none == []


def test_parse_time_range():
    now = datetime(2025, 1, 10, tzinfo=timezone.utc)
    start, stop = parse_time_range(since="24h", now=now)
    assert start == datetime(2025, 1, 9, tzinfo=timezone.utc) and stop is None
    start, stop = parse_time_range(from_t="2025-01-01", to_t="2025-01-05")
    assert (start.day, stop.day) == (1, 5)
    with pytest.raises(ValueError):
        parse_time_range(since="24h", from_t="2025-01-01")
    with pytest.raises(ValueError):
        parse_time_range(since="24x")


def test_list_logs(spark):
    from dudb_spark.model import SCAN_LOGS_SCHEMA

    rows = [
        {
            "start": datetime(2025, 1, d, tzinfo=timezone.utc),
            "stop": datetime(2025, 1, d, 1, tzinfo=timezone.utc),
            "summary": None,
        }
        for d in (1, 2, 3)
    ]
    logs = spark.createDataFrame(rows, SCAN_LOGS_SCHEMA)
    got = [r["start"].day for r in list_logs(logs).collect()]
    assert got == [3, 2, 1]
    last = list_logs(logs, newest_only=True).collect()
    assert len(last) == 1 and last[0]["start"].day == 3
    ranged = list_logs(logs, from_t="2025-01-02", to_t="2025-01-03").collect()
    assert [r["start"].day for r in ranged] == [2]


def test_with_names(spark, fs_dir, stats_result):
    t = FsTables(spark, fs_dir)
    named = with_names(stats_result.by_id("user"), users=t.users, dim="user")
    names = {r["id"]: r["name"] for r in named.collect()}
    assert names[100] == "alice" and names[101] == "bob"
    # fallback to numeric string when no dim provided
    bare = with_names(stats_result.by_id("user"), dim="user")
    assert {r["name"] for r in bare.collect()} == {"100", "101"}
