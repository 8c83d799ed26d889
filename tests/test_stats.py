"""Golden tests for ``stats compute`` against the Python re-statement of the
reference fold (mirrors the reference's golden strategy, stats/totals_test.go:
30–236 and report_stats_test.go:181–402)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.functions.calculators import block, identity, sum_size_blocks
from dudb_spark.model import FsTables
from dudb_spark.operators.stats import StatsOptions, compute_stats
from tests.oracle_fold import COUNTERS, oracle_stats

CALCS = {
    "identity": identity,
    "block4096": block(4096),
    "sum_size_blocks": sum_size_blocks,
}

EXPRS = [
    "",
    "user=100",
    "user=101",
    "(user=100 || user=101) && (group=2 || group=3)",
    "name=not-there",
    "type=f",
    "re=d0-0",
    "dir-larger=3",
]


def _collect_per_prefix(res):
    return {
        r["prefix"]: {c: r[c] for c in COUNTERS} for r in res.per_prefix.collect()
    }


def _collect_per_id(df):
    return {
        (r["prefix"], r["id"]): {c: r[c] for c in COUNTERS} for r in df.collect()
    }


def _nonzero(d):
    return {k: v for k, v in d.items() if any(v.values())}


@pytest.mark.parametrize("expr", EXPRS)
def test_totals_match_reference_fold(spark, fs_dir, tree, expr):
    t = FsTables(spark, fs_dir)
    res = compute_stats(t.prefixes, t.entries, StatsOptions(expr=expr))
    got = _collect_per_prefix(res)
    want, want_u, want_g = oracle_stats(tree, expr=expr)
    assert _nonzero(got) == _nonzero(want)
    assert _nonzero(_collect_per_id(res.per_user)) == _nonzero(want_u)
    assert _nonzero(_collect_per_id(res.per_group)) == _nonzero(want_g)


@pytest.mark.parametrize("calc", ["block4096", "sum_size_blocks"])
def test_calculators(spark, fs_dir, tree, calc):
    t = FsTables(spark, fs_dir)
    res = compute_stats(
        t.prefixes, t.entries, StatsOptions(calculator=CALCS[calc])
    )
    want, _, _ = oracle_stats(tree, calc=calc)
    assert _nonzero(_collect_per_prefix(res)) == _nonzero(want)


def test_subtree_restriction(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    res = compute_stats(t.prefixes, t.entries, StatsOptions(root="/tree/d0-0"))
    want, _, _ = oracle_stats(tree, root="/tree/d0-0")
    got = _collect_per_prefix(res)
    assert _nonzero(got) == _nonzero(want)
    assert all(p.startswith("/tree/d0-0") for p in got)


def test_hardlinks_disabled(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    res = compute_stats(
        t.prefixes, t.entries, StatsOptions(count_hardlinks_as_files=True)
    )
    want, _, _ = oracle_stats(tree, dedup=False)
    got = _collect_per_prefix(res)
    assert _nonzero(got) == _nonzero(want)
    assert sum(v["hardlinks"] + v["hardlink_dirs"] for v in got.values()) == 0


def test_hardlink_counters_present(spark, fs_dir, tree):
    """The default fixture has one 3-file link set (/tree/f0-2, d0-0/f1-2,
    d0-1/f1-2) and one 2-dir link set (d0-0, d0-1).  d0-1 is the duplicate
    dir, so its record early-returns (totals.go:157–160) and its entries are
    never scanned: only d0-0/f1-2 is counted as a hardlink dup."""
    t = FsTables(spark, fs_dir)
    res = compute_stats(t.prefixes, t.entries, StatsOptions())
    tot = res.totals().collect()[0]
    assert tot["hardlinks"] == 1
    assert tot["hardlink_dirs"] == 1


def test_per_id_sums_to_global(spark, fs_dir):
    """Reference invariant (totals_test.go:162–236): per-id totals sum to the
    global totals — modulo dup-dir rows, which carry no id attribution."""
    t = FsTables(spark, fs_dir)
    res = compute_stats(t.prefixes, t.entries, StatsOptions())
    tot = res.totals().collect()[0]
    by_user = res.by_id("user").agg(
        *[F.sum(c).alias(c) for c in COUNTERS if c != "hardlink_dirs"]
    ).collect()[0]
    n_dup_dirs = tot["hardlink_dirs"]
    assert by_user["bytes"] == tot["bytes"]
    assert by_user["files"] == tot["files"]
    assert by_user["prefixes"] == tot["prefixes"] - n_dup_dirs
    assert by_user["hardlinks"] == tot["hardlinks"]


def test_topn(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    res = compute_stats(t.prefixes, t.entries, StatsOptions())
    want, want_u, _ = oracle_stats(tree)

    top = res.top_prefixes("bytes", 3).collect()
    expect = sorted(want.items(), key=lambda kv: (-kv[1]["bytes"], kv[0]))[:3]
    assert [(r["prefix"], r["bytes"]) for r in top] == [
        (p, v["bytes"]) for p, v in expect
    ]

    # per-id top prefixes: rank within each uid
    per_id = res.per_id_top_prefixes("bytes", 2, "user").collect()
    for row in per_id:
        assert row["rank"] <= 2

    merged = res.merged_top(3)
    assert merged.count() >= 3


def test_find_matches_oracle(spark, fs_dir, tree):
    from dudb_spark.operators.find import find
    from tests.oracle_fold import eval_expr
    from dudb_spark.functions.boolexpr import parse

    t = FsTables(spark, fs_dir)
    expr = "user=100 && re=f"
    got = [
        (r["path"], r["is_prefix"])
        for r in find(t.prefixes, t.entries, root="/tree", expr=expr).collect()
    ]
    node = parse(expr)
    want = sorted(
        [(r["path"], True) for r in tree.prefix_rows if eval_expr(node, r, True)]
        + [
            (r["path"], False)
            for r in tree.entry_rows
            if not r["is_dir"] and eval_expr(node, r, False)
        ]
    )
    assert got == want
