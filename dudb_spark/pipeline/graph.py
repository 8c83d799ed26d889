"""Iterative graph analytics over similarity graphs: PageRank with a
fixed iteration count.

Use case: rank documents inside a near-duplicate / citation / overlap
graph (edges from ``dedup.fingerprint_overlap_pairs`` or the MinHash
candidate pairs) so curation can keep the most central copy, or weight
sources by graph authority.  Complements ``cluster.connected_components``
(membership) with a per-node score.

Scale shape: one shuffle per iteration — ``edges ⋈ ranks`` on the source
key then a destination-keyed aggregation — exactly the join-agg loop
Pregel-style systems run; the frame is ``localCheckpoint``-ed per round
so the lazy plan doesn't stack five join trees (same pattern as
``cluster._propagate``).  Edge and rank frames shuffle on the same id
key, so AQE coalesces the exchanges; degrees are computed once.

A FIXED iteration count (default 5) instead of convergence detection
keeps the operator deterministic and oracle-restatable (the SQL twin
unrolls the same five joins); power iteration converges geometrically at
rate ~damping, so 5 rounds already separate hub docs from leaves, and a
production caller can raise ``iters`` without changing the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """PageRank over the UNDIRECTED graph given as a pair list.

    ``pairs`` has one row per undirected edge; both directions are
    materialized internally.  Returns ``(id, score)`` for every node that
    appears in an edge, with uniform initialization 1/N.  Undirected
    graphs have no dangling nodes (every node has out-degree ≥ 1), so no
    dangling-mass redistribution is needed.
    """
    edges = (
        pairs.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .unionByName(
            pairs.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("id")).distinct()
    n = nodes.groupBy().agg(F.count(F.lit(1)).alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("r")
    ).localCheckpoint()

    contrib_src = edges.join(deg, "src")
    for _ in range(iters):
        ranks = (
            contrib_src.join(
                ranks.withColumnRenamed("id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("_in"))
            .crossJoin(F.broadcast(n))
            .select(
                "id",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.col("_in")
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.col("r").alias("score"))


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts + clustering coefficient over an
    undirected graph given as distinct ``src < dst`` pairs — the
    degree-ordered wedge join (Suri & Vassilvitskii, "Counting
    triangles and the curse of the last reducer", WWW 2011).

    Why orientation is the whole 100 TB story: a naive wedge join
    fans out Σ deg(v)² — one celebrity hub generates billions of
    wedges.  Orienting every edge from its (degree, id)-SMALLER
    endpoint to the larger bounds every oriented out-degree at
    O(√m) on ANY graph, so the wedge join's fan-out is O(m^{3/2})
    worst-case and each triangle is generated exactly once (at its
    degree-minimal corner).  Three equi-joins, no windows, no state.

    Every step is integer (degrees, counts); the one division — the
    clustering coefficient 2·tri/(deg·(deg−1)) — is a single IEEE op
    rounded to 6 decimals, so the whole operator replays in SQL.

    Returns ``(id, degree, n_tri, clustering)`` for every node of the
    edge set, n_tri = 0 rows included (a node with no triangles is a
    finding, not an absence).  Self-loops, reversed duplicates, and
    NULL-endpoint rows are dropped by the canonicalization
    (least/greatest skip NULLs, collapsing such a row to a
    self-loop)."""
    s, d = F.col(src_col), F.col(dst_col)
    # canonicalize: self-loops dropped, reversed duplicates collapse
    und = edges.select(
        F.least(s, d).alias("a"), F.greatest(s, d).alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("degree").alias("_dega"))
    db = deg.select(F.col("id").alias("b"), F.col("degree").alias("_degb"))
    ed = und.join(da, "a").join(db, "b")
    a_first = (F.col("_dega") < F.col("_degb")) | (
        (F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("_degb")).otherwise(F.col("_dega"))
        .alias("_degv"),
    )
    # wedges at u: ordered out-neighbor pairs ((deg,id) order), closed
    # by the oriented edge (v, w) — which exists iff {v,w} is an edge,
    # since orientation follows the same total order
    e1 = o.select("u", F.col("v"), F.col("_degv"))
    e2 = o.select(
        F.col("u").alias("u2"), F.col("v").alias("w"),
        F.col("_degv").alias("_degw"),
    )
    wedges = e1.join(e2, F.col("u") == F.col("u2")).where(
        (F.col("_degv") < F.col("_degw"))
        | ((F.col("_degv") == F.col("_degw")) & (F.col("v") < F.col("w")))
    )
    closer = o.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(closer, ["v", "w"]).select("u", "v", "w")
    corners = (
        tris.select(F.col("u").alias("id"))
        .unionByName(tris.select(F.col("v").alias("id")))
        .unionByName(tris.select(F.col("w").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    nt = F.coalesce("n_tri", F.lit(0))
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            (nt * 2).cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        deg.join(corners, "id", "left")
        .select("id", "degree", nt.alias("n_tri"),
                coeff.alias("clustering"))
    )
