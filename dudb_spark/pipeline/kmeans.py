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
    _return_base: bool = False,
):
    """Run ``iters`` Lloyd rounds; return ``(assigned, centroids)``.

    ``assigned`` is (id, _v, _nv, cell) — the FINAL assignment against
    the last round's centroids, same shape as ``ivf.fixed_cells`` so
    every downstream consumer (semantic dedup, IVF search, outliers)
    accepts it unchanged.  ``centroids`` is the final list (cell order).

    ``_return_base=True`` additionally returns the PERSISTED vector
    frame the assignment reads, so a caller that fully consumes the
    result (cluster_balance) can ``unpersist()`` it instead of leaking
    executor storage; callers keeping ``assigned`` around own the cache.
    """
    raw = [r[vec_col] for r in emb.orderBy(id_col).limit(k).collect()]
    if not raw:
        # fail at the boundary: an empty frame would otherwise surface
        # as an unreadable expression error from the argmax over zero
        # centroids (and NULL shares in cluster_balance)
        raise ValueError(
            "lloyd_kmeans: no seed vectors (empty embeddings frame)"
        )
    dim = len(raw[0]) if raw else 0
    if any(x is None for row in raw for x in row) or any(
        len(r) != dim for r in raw
    ):
        raise ValueError(
            "lloyd_kmeans: seed vectors must be non-null and share one "
            f"dimensionality (dim={dim})"
        )
    c = [[float(x) for x in row] for row in raw]
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
        for r in means:
            for i in range(dim):
                # a NULL mean (ragged/NULL vector element, or a decimal
                # sum overflowing to NULL outside ANSI mode) would turn
                # into CAST('None' AS DOUBLE) -> NULL cosine downstream,
                # silently dropping the centroid from every argmax: fail
                # loudly at the boundary instead
                if r[f"m{i}"] is None:
                    raise ValueError(
                        f"lloyd_kmeans: NULL mean for cell {r['cell']} "
                        f"dim {i} — ragged or NULL vector elements in "
                        f"{vec_col!r}, or decimal-sum overflow"
                    )
        c = [
            [r[f"m{i}"] for i in range(dim)]
            for r in sorted(means, key=lambda r: r["cell"])
        ]
    final = base.select(id_col, "_v", "_nv", _argmax_cell(c).alias("cell"))
    if _return_base:
        return final, c, base
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
    assigned, _, base = lloyd_kmeans(
        emb, k, iters, vec_col, id_col, _return_base=True
    )
    if label_col is not None:
        # dropDuplicates guards a non-unique id_col: a duplicated id
        # would multiply assignment rows through the join, inflating
        # n_vecs/total/purity while the unlabeled path counts each
        # vector once
        assigned = assigned.join(
            emb.select(id_col, label_col).dropDuplicates([id_col]),
            id_col,
        )
    per = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs")
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
        per = per.join(lbl, "cell")
    # the balance table is ≤k rows: materialize it (one job, bounded
    # driver rows), then drop the cached vector frame — without this
    # every call leaked a persisted dataset into executor storage
    # (ADVICE r7).  A localCheckpoint would itself stay registered as a
    # persistent RDD; a rebuilt local frame leaves zero cache behind.
    per_schema, per_rows = per.schema, per.collect()
    base.unpersist()
    total = sum(r["n_vecs"] for r in per_rows)
    if not per_rows or total == 0:
        # fail at the boundary like lloyd_kmeans' seed/mean validations:
        # an empty assignment would otherwise surface as NULL shares
        # downstream instead of naming the actual problem here
        raise ValueError(
            "cluster_balance: no assigned vectors (empty embeddings "
            "frame or no usable centroids)"
        )
    per = emb.sparkSession.createDataFrame(per_rows, per_schema)
    out = per.select(
        "cell",
        "n_vecs",
        F.round(F.col("n_vecs") / F.lit(total), 6).alias("share"),
        *(
            [
                "top_label",
                "top_label_n",
                F.round(
                    F.col("top_label_n") / F.col("n_vecs"), 6
                ).alias("purity"),
            ]
            if label_col is not None
            else []
        ),
    )
    return out.orderBy("cell")
