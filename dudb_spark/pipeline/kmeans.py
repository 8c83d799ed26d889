"""Multi-iteration Lloyd k-means over embedding columns — corpus topic
clustering for data-mixing / balance decisions.

A training-data pipeline clusters document embeddings to measure topic
balance (is the mixture dominated by one mode?), to stratify sampling,
and to pick per-cluster dedup budgets (SemDeDup prunes within clusters).
``pipeline/ivf.fixed_cells`` ships the ONE-step variant as an ANN coarse
quantizer; this module runs Lloyd to ``iters`` rounds with the same
oracle-reproducible determinism contract, so the full clustering is
value-checkable against any exact engine:

- **seed**: centroids = the ``k`` lowest-id vectors (no RNG);
- **assignment**: cosine argmax rounded to 6 decimals, smaller-cell
  tie-break — a pure scan-side expression over the broadcast centroid
  literals (``ivf._argmax_cell``), no join, no shuffle of vectors;
- **update**: per-cell means via exact DECIMAL(27,18) sums, so the
  resulting doubles are identical under ANY partitioning or engine
  (float addition order stops mattering);
- **empty cells**: a cell that loses all members is dropped and the
  survivors re-indexed in ascending old-cell order each round (the same
  convention as the one-step quantizer's DENSE_RANK oracle twin).

Scale shape (100 TB): each iteration is ONE scan of the (cached) vector
frame + one hash aggregate of k×dim decimal sums — map-side partial
aggregation collapses every partition to ≤k rows before the exchange,
and only k×(dim+1) scalars ever reach the driver per round.  The
centroids ride into the next assignment as expression literals
(broadcast-by-plan), so vectors are never shuffled at all.  Iterations
are driver round-trips by nature (Lloyd is synchronous); ``iters`` stays
small (3–10) because a mixing/balance clustering needs the density
shape, not convergence — pyspark.ml KMeans (``ivf.build_ivf``) remains
the production trainer when determinism vs an SQL oracle is not needed.

The reference engine has no clustering surface (SURVEY.md §2 — this is
an LLM-pipeline extension, same family as pipeline/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dudb_spark.pipeline.ivf import _argmax_cell
from dudb_spark.pipeline.similarity import _as_double, dot


def lloyd_kmeans(
    emb: DataFrame,
    k: int = 10,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Run ``iters`` Lloyd rounds; return ``(assigned, centroids)``.

    ``assigned`` is (id, _v, _nv, cell) — the FINAL assignment against
    the last round's centroids, same shape as ``ivf.fixed_cells`` so
    every downstream consumer (semantic dedup, IVF search, outliers)
    accepts it unchanged.  ``centroids`` is the final list (cell order).
    """
    c = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(k).collect()
    ]
    dim = len(c[0])
    v = _as_double(F.col(vec_col))
    base = emb.select(
        id_col, v.alias("_v"), F.sqrt(dot(v, v)).alias("_nv")
    ).persist()

    mean_cols = [
        F.expr(
            f"CAST(SUM(CAST(_v[{i}] AS DECIMAL(27,18))) AS DOUBLE)"
            f" / COUNT(1) AS m{i}"
        )
        for i in range(dim)
    ]
    for _ in range(iters):
        assigned = base.select(id_col, "_v", _argmax_cell(c).alias("cell"))
        # k rows × (dim+1) scalars — the bounded driver boundary every
        # synchronous Lloyd round pays (same class as the CC convergence
        # check); empty cells drop out and survivors re-index ascending
        means = assigned.groupBy("cell").agg(*mean_cols).collect()
        c = [
            [r[f"m{i}"] for i in range(dim)]
            for r in sorted(means, key=lambda r: r["cell"])
        ]
    final = base.select(id_col, "_v", "_nv", _argmax_cell(c).alias("cell"))
    return final, c


def cluster_balance(
    emb: DataFrame,
    k: int = 10,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str | None = None,
) -> DataFrame:
    """The topic-balance table a mixture planner consumes: one row per
    final cluster with its population and share of the corpus; with
    ``label_col``, also the dominant label and its purity — the quick
    read on whether clusters track the known taxonomy.

    Determinism: population counts are integers; shares are
    round(n/total, 6); the dominant label is the (count, label) max with
    lexicographically-smallest-label tie-break.  All reproducible by an
    exact SQL engine running the same unrolled Lloyd rounds.
    """
    assigned, _ = lloyd_kmeans(emb, k, iters, vec_col, id_col)
    if label_col is not None:
        assigned = assigned.join(
            emb.select(id_col, label_col), id_col
        )
    total = assigned.count()
    per = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    out = per.select(
        "cell",
        "n_vecs",
        F.round(F.col("n_vecs") / F.lit(total), 6).alias("share"),
    )
    if label_col is not None:
        # dominant label: max (n, reversed-label) per cell — ties pick
        # the lexicographically smallest label, matching the oracle's
        # ORDER BY n DESC, label ASC LIMIT 1
        lbl = (
            assigned.groupBy("cell", label_col)
            .agg(F.count(F.lit(1)).alias("_ln"))
            .withColumn(
                "_rk",
                F.row_number().over(
                    Window.partitionBy("cell").orderBy(
                        F.desc("_ln"), F.asc(label_col)
                    )
                ),
            )
            .where(F.col("_rk") == 1)
            .select(
                "cell",
                F.col(label_col).alias("top_label"),
                F.col("_ln").alias("top_label_n"),
            )
        )
        out = out.join(lbl, "cell").select(
            "cell",
            "n_vecs",
            "share",
            "top_label",
            "top_label_n",
            F.round(F.col("top_label_n") / F.col("n_vecs"), 6).alias(
                "purity"
            ),
        )
    return out.orderBy("cell")
