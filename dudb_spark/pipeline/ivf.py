"""IVF (inverted-file) approximate nearest neighbour search.

The second scale path for similarity search (alongside the SRP-LSH variant
in similarity.py): a KMeans coarse quantizer partitions the corpus into
``n_clusters`` cells; a query scores only the ``n_probe`` nearest cells'
rows instead of the whole corpus — expected scan fraction n_probe/n_clusters.

Scale design: train on a bounded sample (KMeans is iterative — the sample
caps driver/shuffle cost), store the small centroid table driver-side
(n_clusters × dim floats), and persist ``assign``'s output partitioned by
``cell`` so a probe prunes *files*, not just rows.  The per-query cell
selection is driver-side math over the centroid table (tiny); the scan is
an IN-filter the Parquet reader prunes with partition/min-max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.similarity import _as_double, _lit_vec, cosine, dot


class IVFIndex:
    def __init__(self, model, centroids: list[list[float]], vec_col: str, id_col: str):
        self.model = model
        self.centroids = centroids
        self.vec_col = vec_col
        self.id_col = id_col

    def assign(self, df: DataFrame) -> DataFrame:
        """Add the ``cell`` column (nearest centroid id) to a corpus frame."""
        from pyspark.ml.functions import array_to_vector

        feats = df.withColumn(
            "_features", array_to_vector(_as_double(F.col(self.vec_col)))
        )
        return (
            self.model.transform(feats)
            .withColumnRenamed("prediction", "cell")
            .drop("_features")
        )

    def _query_cells(self, query_vec, n_probe: int) -> list[int]:
        import math

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(y * y for y in b))
            return dot / (na * nb) if na and nb else 0.0

        q = [float(x) for x in query_vec]
        scored = sorted(
            ((cos(c, q), i) for i, c in enumerate(self.centroids)), reverse=True
        )
        return [i for _, i in scored[:n_probe]]

    def search(
        self, assigned: DataFrame, query_vec, k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        """Top-k by cosine among the n_probe nearest cells only."""
        cells = self._query_cells(query_vec, n_probe)
        q = _lit_vec(query_vec)
        emb = _as_double(F.col(self.vec_col))
        return (
            assigned.where(F.col("cell").isin(cells))
            .select(
                F.col(self.id_col),
                F.round(cosine(emb, q), 6).alias("cosine"),
            )
            .orderBy(F.desc("cosine"), self.id_col)
            .limit(k)
        )


def fixed_cells(
    emb: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Deterministic, oracle-reproducible coarse quantizer: centroids
    seeded from the first ``n_clusters`` vectors by id, refined by ONE
    Lloyd step whose per-cell means use exact decimal sums (identical
    doubles in any engine/partitioning).  Cell argmax compares cosines
    rounded to 6 decimals with smaller-cell tie-breaks, so an oracle
    engine reproduces every assignment bit-for-bit.  Returns
    ``(assigned, centroids)`` where ``assigned`` carries (id, _v, _nv,
    cell) — the cast vector and its norm materialized once behind the
    persist barrier — and ``centroids`` is the post-Lloyd list (cell
    order).  Shared by the value-checkable IVF search
    (:func:`fixed_ivf_topk`) and semantic dedup
    (similarity.semantic_dedup)."""
    c0 = [
        [float(x) for x in r[vec_col]]
        for r in emb.orderBy(id_col).limit(n_clusters).collect()
    ]
    dim = len(c0[0])
    v = _as_double(F.col(vec_col))
    # materialize the cast vector and its norm ONCE behind a cache barrier:
    # project-collapse would otherwise re-inline the transform lambda into
    # all 16 centroid folds of BOTH assignment passes (measured hazard —
    # see README "Measured Catalyst hazards")
    base = emb.select(
        id_col, v.alias("_v"), F.sqrt(dot(v, v)).alias("_nv")
    ).persist()

    assigned0 = base.select(id_col, "_v", _argmax_cell(c0).alias("cell"))

    # one Lloyd step: exact decimal sums -> identical means everywhere.
    # One aggregate column per dimension (16 cells × dim sums through
    # map-side partial agg) instead of exploding rows × dim.
    mean_cols = [
        F.expr(
            f"CAST(SUM(CAST(_v[{i}] AS DECIMAL(27,18))) AS DOUBLE)"
            f" / COUNT(1) AS m{i}"
        )
        for i in range(dim)
    ]
    means = assigned0.groupBy("cell").agg(*mean_cols).collect()
    c1 = [
        [r[f"m{i}"] for i in range(dim)]
        for r in sorted(means, key=lambda r: r["cell"])
    ]

    # cell ids in the second assignment are INDICES into the (ascending-
    # cell-ordered) c1 list — an oracle derives the same ordering
    assigned1 = base.select(
        id_col, "_v", "_nv", _argmax_cell(c1).alias("cell")
    )
    return assigned1, c1


def _py_norm(c) -> float:
    import math

    # left fold from 0.0, matching `aggregate`'s sequential order, so
    # the Python double equals the engine's norm(lit(c)) bit-for-bit
    acc = 0.0
    for x in c:
        acc = acc + x * x
    return math.sqrt(acc)


def _dbl(x: float) -> str:
    # repr() is the shortest round-tripping decimal; Java's string->
    # double parse is correctly rounded, so the engine sees the same
    # binary64 as Python holds
    return f"CAST('{x!r}' AS DOUBLE)"


def _vec_sql(c) -> str:
    return "array(" + ",".join(_dbl(x) for x in c) + ")"


def _cos6_sql(c, nc: float) -> str:
    # dot(v, c) / (norm(v) * norm(c)) with norm(v) read once from the
    # materialized `_nv` column and norm(c) a Python constant — the
    # identical IEEE expression as cosine(), minus 2/3 of the folds.
    # One SQL string per expression: per-element lit() Columns would
    # cost a py4j round-trip each (16 centroids x dim of them).
    d = (
        f"aggregate(zip_with(_v, {_vec_sql(c)}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return f"round({d} / (_nv * {_dbl(nc)}), 6)"


def _argmax_cell(centroids):
    # array_max over struct(score, -cell): ties pick the smaller cell
    pairs = ", ".join(
        f"struct({_cos6_sql(c, _py_norm(c))} AS s, {-j} AS nj)"
        for j, c in enumerate(centroids)
    )
    return F.expr(f"-array_max(array({pairs})).nj")


def probe_cells(centroids, query_vec, n_probe: int) -> set[int]:
    """The ``n_probe`` cells nearest a query vector — driver-side cosine
    on the tiny centroid list (k × dim floats), 6-decimal rounding with
    smaller-cell tie-break, mirroring the oracle's probe choice.  Shared
    by the raw-vector search (:func:`fixed_ivf_topk`) and the SQ8
    compressed-index search (quantize.ivf_sq8_topk)."""

    def pycos(a, b):
        dot_ = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return round(dot_ / (na * nb), 6)

    qv = [float(x) for x in query_vec]
    ranked = sorted(
        ((pycos(c, qv), -j) for j, c in enumerate(centroids)), reverse=True
    )
    return {-nj for _, nj in ranked[:n_probe]}


def fixed_ivf_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells=None,
    exclude_id: int = 0,
) -> DataFrame:
    """Deterministic, oracle-reproducible IVF search over the
    :func:`fixed_cells` quantizer: select the ``n_probe`` nearest cells
    driver-side (tiny centroid list), score only their rows, rank by
    cosine rounded to 6 decimals with id tie-breaks.  KMeans
    (:func:`build_ivf`) remains the production quantizer — this variant
    exists so the ANN-with-index path can be value-checked end-to-end.
    ``cells`` = a prebuilt ``fixed_cells(emb, ...)`` result, so several
    consumers (search, semantic dedup) share one quantizer pass."""
    assigned1, c1 = cells or fixed_cells(emb, n_clusters, vec_col, id_col)
    qv = [float(x) for x in query_vec]
    probe = probe_cells(c1, qv, n_probe)

    return (
        assigned1.where(
            F.col("cell").isin(sorted(probe)) & (F.col(id_col) != exclude_id)
        )
        .select(id_col, F.expr(_cos6_sql(qv, _py_norm(qv))).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def assign_to_cells(
    emb: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Quantize vectors against FIXED centroids — the IVF *add* path.

    Production vector indexes do not re-cluster per insert: between
    quantizer rebuilds, newly arriving vectors are assigned to the
    existing centroid set and appended to the postings (one scan, no
    shuffle — the argmax is a scan-side expression over the broadcast
    centroid literals).  The result unions directly with a
    :func:`fixed_cells` ``assigned`` frame (same (id, _v, _nv, cell)
    shape), so search and semantic dedup run over base ∪ additions
    unchanged.  Assignment uses the same 6-decimal cosine argmax with
    smaller-cell tie-break, so an oracle engine reproduces it."""
    v = _as_double(F.col(vec_col))
    base = emb.select(
        id_col, v.alias("_v"), F.sqrt(dot(v, v)).alias("_nv")
    )
    return base.select(
        id_col, "_v", "_nv", _argmax_cell(centroids).alias("cell")
    )


def build_ivf(
    df: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    sample_fraction: float = 1.0,
    max_iter: int = 10,
) -> IVFIndex:
    """Train the coarse quantizer.  ``sample_fraction`` bounds training cost
    on large corpora and ``max_iter`` caps Lloyd iterations — a coarse
    quantizer only needs the density shape, not converged centroids (recall
    comes from n_probe, not centroid polish)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = df if sample_fraction >= 1.0 else df.sample(sample_fraction, seed)
    feats = train.withColumn(
        "_features", array_to_vector(_as_double(F.col(vec_col)))
    )
    model = (
        KMeans(k=n_clusters, seed=seed, featuresCol="_features", maxIter=max_iter)
        .fit(feats)
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return IVFIndex(model, centroids, vec_col, id_col)
