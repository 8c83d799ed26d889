"""Connected components: fuzz vs a union-find oracle; cap behavior."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dudb_spark.pipeline.cluster import connected_components, duplicate_clusters


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node in component
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_union_find(spark, raw):
    edges = [(a, b) for a, b in raw if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.node: r.component
        for r in connected_components(df, max_iter=40).collect()
    }
    assert got == _uf_components(edges)


def test_cc_path_graph_converges(spark):
    """A 12-node path needs ~diameter rounds; everything collapses to 0."""
    edges = [(i, i + 1) for i in range(11)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, max_iter=20).collect()
    assert {r.component for r in rows} == {0}
    assert len(rows) == 12


def test_cc_leaves_session_conf_untouched(spark):
    """Round shuffles are sized with explicit repartition, never by
    mutating spark.sql.shuffle.partitions (which would resize unrelated
    concurrent queries' shuffles on a shared cluster)."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = [(i, i + 1) for i in range(20)] + [(100, 101)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df, max_iter=30).collect()
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert {r.component for r in rows} == {0, 100}


def test_pinned_frame_memoizes(spark):
    """pinned_frame builds once per (session, key) and hands back the
    materialized frame afterwards — the reuse point that keeps a dedup
    decision job from re-running the candidate pipeline."""
    from dudb_spark.pipeline.dedup import pinned_frame

    calls = []

    def build():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "n")

    a = pinned_frame(spark, ("test", "k1"), build)
    b = pinned_frame(spark, ("test", "k1"), build)
    c = pinned_frame(spark, ("test", "k2"), build)
    assert len(calls) == 2  # k1 built once, k2 separately
    assert a is b and a is not c
    assert a.count() == 5


def test_cached_overlap_pairs_equal_uncached(spark):
    from dudb_spark.pipeline.dedup import (
        cached_fingerprint_overlap_pairs,
        fingerprint_overlap_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through the quiet field toward the river bank every morning"
    )
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " with a small tail change"),
         (4, "an entirely different document about spark shuffles")],
        ["doc_id", "text"],
    )
    want = sorted(
        map(tuple, fingerprint_overlap_pairs(docs, min_shared=2).collect())
    )
    got = sorted(
        map(
            tuple,
            cached_fingerprint_overlap_pairs(
                docs, cache_key=("test-docs",), min_shared=2
            ).collect(),
        )
    )
    assert want and got == want
    # second call returns the identical pinned frame
    again = cached_fingerprint_overlap_pairs(
        docs, cache_key=("test-docs",), min_shared=2
    )
    assert sorted(map(tuple, again.collect())) == want


def test_duplicate_clusters_sizes(spark):
    # two components: {1,2,3} (via transitivity) and {10,11}
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    rows = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in duplicate_clusters(df).collect()
    }
    assert rows == {
        1: (1, 3),
        2: (1, 3),
        3: (1, 3),
        10: (10, 2),
        11: (10, 2),
    }
