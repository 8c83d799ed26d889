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


def test_label_propagation_two_cliques(spark):
    """Two K4 cliques joined by one bridge edge: 4 synchronous rounds
    collapse each clique to its smallest id; sizes carried per node.
    Noisy input (reversed dups, self-loop, NULL endpoint) is ignored."""
    from dudb_spark.pipeline.graph import label_propagation

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = c1 + c2 + [(3, 10), (10, 3), (5, 5), (None, 7)]
    got = {r["id"]: (r["community"], r["community_size"])
           for r in label_propagation(
               spark.createDataFrame(edges, "src int, dst int"),
               rounds=4).collect()}
    assert {i: got[i][0] for i in range(4)} == {i: 0 for i in range(4)}
    assert {i: got[i][0] for i in range(10, 14)} == {
        i: 10 for i in range(10, 14)}
    assert got[0][1] == 4 and got[10][1] == 4
    assert 7 not in got  # NULL-edge endpoint contributes no node


def test_label_propagation_tie_breaks_smallest(spark):
    """A node with two equally frequent neighbor labels adopts the
    smaller one (deterministic argmax via min(struct(-c, label)))."""
    from dudb_spark.pipeline.graph import label_propagation

    # 2 is equally attached to {0,1} and {5,6}; after round 1 every
    # neighbor keeps a distinct label so 2 takes the smallest = 0.
    edges = [(0, 2), (1, 2), (5, 2), (6, 2)]
    got = {r["id"]: r["community"] for r in label_propagation(
        spark.createDataFrame(edges, ["src", "dst"]), rounds=1).collect()}
    assert got[2] == 0


def test_k_core_goldens(spark):
    """K5 plus a pendant path: at k=4 only the clique survives with
    in-core degree 4; at k=2 a triangle survives but pendant chains
    peel off over rounds; noisy edges collapse first."""
    from dudb_spark.pipeline.graph import k_core

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges = k5 + [(4, 7), (7, 8), (8, 9), (7, 4), (9, 9)]
    got = {r["id"]: r["core_degree"] for r in k_core(
        spark.createDataFrame(edges, ["src", "dst"]), k=4,
        rounds=4).collect()}
    assert got == {i: 4 for i in range(5)}

    tri = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    got = {r["id"]: r["core_degree"] for r in k_core(
        spark.createDataFrame(tri, ["src", "dst"]), k=2,
        rounds=4).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_k_core_empty_when_overpruned(spark):
    from dudb_spark.pipeline.graph import k_core

    path = [(0, 1), (1, 2)]
    assert k_core(spark.createDataFrame(path, ["src", "dst"]), k=2,
                  rounds=3).count() == 0


def test_modularity_golden(spark):
    """Two K4 cliques + one bridge, perfect partition: m = 13,
    L_c = 6 each, d_c = 13 each, so each community contributes
    (4*13*6 - 169)/(4*169) = 143/676 and Q = 0.423... — matches the
    hand computation; merging everything into ONE community gives
    Q = 0 (L = m, d = 2m)."""
    from dudb_spark.pipeline.graph import modularity

    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], ["src", "dst"])
    assign = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(i, 1) for i in range(10, 14)],
        ["id", "community"],
    )
    rows = {r["community"]: r for r in modularity(edges, assign).collect()}
    for c in (0, 1):
        assert rows[c]["n_nodes"] == 4
        assert rows[c]["intra_edges"] == 6
        assert rows[c]["degree_sum"] == 13
        assert rows[c]["q_contrib"] == pytest.approx(143 / 676, abs=1e-9)

    one = spark.createDataFrame(
        [(i, 7) for i in list(range(4)) + list(range(10, 14))],
        ["id", "community"],
    )
    tot = modularity(edges, one).collect()
    assert len(tot) == 1 and tot[0]["q_contrib"] == pytest.approx(0.0)


def test_modularity_unassigned_nodes_and_empty_intra(spark):
    """Nodes absent from the assignment contribute no community row
    (their edges still count in m); a community with zero intra
    edges gets intra_edges = 0, negative contribution."""
    from dudb_spark.pipeline.graph import modularity

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], ["src", "dst"])
    assign = spark.createDataFrame(
        [(0, 5), (2, 5)], ["id", "community"])  # 0-2 not an edge
    rows = modularity(edges, assign).collect()
    assert len(rows) == 1
    r = rows[0]
    # m=3, L=0, d = deg(0)+deg(2) = 1+2 = 3 -> (0 - 9)/36 = -0.25
    assert (r["n_nodes"], r["intra_edges"], r["degree_sum"]) == (2, 0, 3)
    assert r["q_contrib"] == pytest.approx(-0.25)


def test_assortativity_goldens(spark):
    """A star is perfectly disassortative (r = -1); K4 is degree-
    regular (denominator 0 -> NULL); a path of 4 gives the
    hand-computed r = -0.5."""
    from dudb_spark.pipeline.graph import assortativity

    star = [(0, i) for i in range(1, 5)]
    r = assortativity(spark.createDataFrame(star, ["src", "dst"])).collect()[0]
    assert r["n_edges"] == 4 and r["assortativity"] == pytest.approx(-1.0)

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = assortativity(spark.createDataFrame(k4, ["src", "dst"])).collect()[0]
    assert r["n_edges"] == 6 and r["assortativity"] is None

    path = [(0, 1), (1, 2), (2, 3)]
    r = assortativity(spark.createDataFrame(path, ["src", "dst"])).collect()[0]
    # degrees 1,2,2,1; over stubs: sx = Σdeg² = 10, sxx = Σdeg³ = 18,
    # sxy = 16 -> (6·16 - 100)/(6·18 - 100) = -4/8 = -0.5
    assert (r["sum_deg"], r["sum_deg_sq"], r["sum_deg_prod"]) == (10, 18, 16)
    assert r["assortativity"] == pytest.approx(-0.5)


def test_personalized_pagerank_confines_mass(spark):
    """Two disconnected triangles, seed in one: the unseeded
    component scores exactly 0 (no teleport ever reaches it), the
    seeded component's mass sums to 1, the seed outranks its
    symmetric peers — and the uniform path is untouched (mass 1)."""
    from dudb_spark.pipeline.graph import pagerank

    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(tri, ["id_a", "id_b"])
    got = {r["id"]: r["score"] for r in pagerank(
        df, iters=5, seeds=[0]).collect()}
    assert got[10] == got[11] == got[12] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[0] > got[1] == got[2] > 0

    uni = {r["id"]: r["score"] for r in pagerank(df, iters=5).collect()}
    assert sum(uni.values()) == pytest.approx(1.0, abs=1e-9)
    assert uni[0] == pytest.approx(uni[10])
