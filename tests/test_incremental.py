"""Incremental stats maintenance == full refold, including the hardlink
closure cases where an UNTOUCHED directory's counters change because a
touched directory stole or released an inode group's canonical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.operators.incremental import incremental_stats
from dudb_spark.operators.stats import StatsOptions, compute_stats

P_COLS = "path string, parent string, size long, blocks long, mode long, " \
    "mtime timestamp, uid long, gid long, device long, inode long"
E_COLS = "parent string, name string, path string, is_dir boolean, " \
    "size long, blocks long, mode long, uid long, gid long, " \
    "device long, inode long"


def _pfx(spark, rows):
    return spark.createDataFrame(
        [(p, p.rsplit("/", 1)[0] or "/", sz, sz // 512, 0o755, None,
          100, 10, 1, ino) for p, sz, ino in rows],
        P_COLS,
    )


def _ent(spark, rows):
    return spark.createDataFrame(
        [(p.rsplit("/", 1)[0], p.rsplit("/", 1)[1], p, d, sz, sz // 512,
          0o644, 100, 10, 1, ino) for p, d, sz, ino in rows],
        E_COLS,
    )


def _summaries(res):
    key = lambda df, k: {  # noqa: E731
        tuple(r[c] for c in k): tuple(r[c] for c in df.columns if c not in k)
        for r in df.collect()
    }
    return (
        key(res.per_prefix, ["prefix"]),
        key(res.per_user, ["prefix", "id"]),
        key(res.per_group, ["prefix", "id"]),
    )


def test_canonical_moves_into_untouched_dir(spark):
    """Deleting /t/a releases inode 100's canonical to untouched /t/b."""
    prev_p = _pfx(spark, [("/t", 10, 1), ("/t/a", 20, 2), ("/t/b", 30, 3)])
    prev_e = _ent(spark, [
        ("/t/a", True, 20, 2), ("/t/b", True, 30, 3),
        ("/t/a/f1", False, 7, 100),   # canonical of inode 100
        ("/t/b/f2", False, 7, 100),   # currently a hardlink dup
        ("/t/b/f3", False, 5, 200),
    ])
    new_p = prev_p.where(F.col("path") != "/t/a")
    new_e = prev_e.where(~F.col("path").startswith("/t/a"))
    touched = spark.createDataFrame([("/t",), ("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    # the untouched dir now owns the file: both entries real, 0 hardlinks
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/b"]
    assert row["files"] == 2 and row["hardlinks"] == 0


def test_canonical_stolen_from_untouched_dir(spark):
    """Adding /t/a/f0 (lex-first link of inode 100) demotes untouched
    /t/b's file to a hardlink dup."""
    prev_p = _pfx(spark, [("/t", 10, 1), ("/t/a", 20, 2), ("/t/b", 30, 3)])
    prev_e = _ent(spark, [
        ("/t/a", True, 20, 2), ("/t/b", True, 30, 3),
        ("/t/b/f2", False, 7, 100),
    ])
    add = _ent(spark, [("/t/a/f0", False, 7, 100)])
    new_p = prev_p
    new_e = prev_e.unionByName(add)
    touched = spark.createDataFrame([("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/b"]
    assert row["hardlinks"] == 1


def test_merge_fixture_equivalence(spark):
    """End-to-end over the staged merge fixture (hardlinks included)."""
    import __spark_entry__ as em
    from dudb_spark.operators.ingest import merge_scan

    prev_p, prev_e, staged_p, staged_e = em._merge_fixture(spark)
    prev = compute_stats(prev_p, prev_e, StatsOptions())
    merge = merge_scan(prev_p, prev_e, staged_p, staged_e, root="/tree")
    inc = incremental_stats(
        prev, prev_p, prev_e, merge.prefixes, merge.entries, merge.touched
    )
    full = compute_stats(merge.prefixes, merge.entries, StatsOptions())
    assert _summaries(inc) == _summaries(full)
