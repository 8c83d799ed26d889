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
