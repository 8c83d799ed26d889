"""Tests for PageRank, vocabulary coverage, and decayed activity."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from dudb_spark.operators.retention import decayed_activity
from dudb_spark.pipeline.graph import pagerank
from dudb_spark.pipeline.text import vocab_oov


def _py_pagerank(pairs, iters, d=0.85):
    """Reference power iteration over the undirected pair list."""
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    n = len(edges)
    r = {v: 1.0 / n for v in edges}
    for _ in range(iters):
        nxt = {v: (1 - d) / n for v in edges}
        for src, dsts in edges.items():
            share = d * r[src] / len(dsts)
            for v in dsts:
                nxt[v] += share
        r = nxt
    return r


def test_pagerank_matches_reference(spark):
    # star (1 hub, 3 leaves) + separate edge
    pairs = [(1, 2), (1, 3), (1, 4), (5, 6)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["score"] for r in pagerank(df, iters=5).collect()}
    want = _py_pagerank(pairs, 5)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    # the hub dominates its leaves; the isolated pair splits evenly
    assert got[1] > got[2] == pytest.approx(got[3], abs=1e-12)
    assert got[5] == pytest.approx(got[6], abs=1e-12)


def test_pagerank_mass_conserved(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = [r["score"] for r in pagerank(df, iters=4).collect()]
    # undirected graph has no dangling mass: scores sum to 1
    assert sum(got) == pytest.approx(1.0, abs=1e-9)


def test_vocab_oov_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b", "en"),
            (2, "a b c", "en"),
            (3, "c d d", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    # counts: a=4 b=2 c=2 d=2 -> top-2 = {a, b} (tie c/b broken by term)
    got = {
        r["lang"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_oov(df, top_v=2).collect()
    }
    assert got["en"] == (7, 1, pytest.approx(1 / 7, abs=1e-6))
    assert got["de"] == (3, 3, 1.0)


def test_decayed_activity_golden(spark):
    t0 = dt.datetime(2025, 1, 2, 0, 0, 0)
    rows = [
        (1, t0),                                  # at t_ref: weight 1
        (1, t0 - dt.timedelta(days=1)),           # e^-1
        (2, t0 - dt.timedelta(days=2)),           # e^-2
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        r["user_id"]: (r["n_events"], r["decayed_score"])
        for r in decayed_activity(df, tau_seconds=86400.0).collect()
    }
    assert got[1][0] == 2
    assert got[1][1] == pytest.approx(round(1 + math.exp(-1), 6), abs=1e-6)
    assert got[2][1] == pytest.approx(round(math.exp(-2), 6), abs=1e-6)


def test_triangle_counts_goldens(spark):
    """K4 (every corner in 3 triangles, coefficient 1), a path (none),
    and a star+closure (one triangle at all three corners); reversed /
    duplicate edges collapse."""
    from dudb_spark.pipeline.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r["id"]: (r["degree"], r["n_tri"], r["clustering"])
           for r in triangle_counts(
               spark.createDataFrame(k4, ["src", "dst"])).collect()}
    assert got == {i: (3, 3, 1.0) for i in range(4)}

    path = [(0, 1), (1, 2), (2, 3)]
    got = {r["id"]: r["n_tri"] for r in triangle_counts(
        spark.createDataFrame(path, ["src", "dst"])).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}

    # hub 0 with leaves 1..5, plus closure 1-2; noisy input: reversed
    # duplicates and a self-loop must not change anything
    star = [(0, i) for i in range(1, 6)] + [(1, 2), (2, 1), (3, 3), (0, 1)]
    res = {r["id"]: (r["degree"], r["n_tri"], r["clustering"])
           for r in triangle_counts(
               spark.createDataFrame(star, ["src", "dst"])).collect()}
    assert res[0] == (5, 1, 0.1)
    assert res[1] == (2, 1, 1.0) and res[2] == (2, 1, 1.0)
    assert res[4] == (1, 0, 0.0)
