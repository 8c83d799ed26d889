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
