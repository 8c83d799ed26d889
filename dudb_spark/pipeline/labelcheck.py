"""kNN label-noise detection over an embedding column.

Public method family: neighborhood-consistency noise filtering — a point
whose k nearest neighbors in embedding space mostly carry a DIFFERENT
label is a mislabel candidate (the classic edited-nearest-neighbor rule,
Wilson 1972, and the kNN component of modern label-noise audits such as
Confident Learning, Northcutt et al. 2021, and deep-kNN filtering,
Bahri et al. 2020).  For a training-data pipeline this is the label
analogue of SemDeDup: a cheap embedding-space pass that surfaces rows
whose *annotation* (not content) looks wrong.

Spark shape / the 100 TB story
------------------------------
- Candidate generation is confined to coarse-quantizer cells (the
  SemDeDup scoping, similarity.semantic_dedup): ONE equi-join shuffle
  keyed by cell, O(Σ|cell|²) cosine evaluations instead of O(N²) —
  production corpora size ``n_clusters`` so cells fit in a task.
- The k-nearest filter is a rank window partitioned by the point id:
  partitions are bounded by the cell population, and the
  ``row_number() <= k`` predicate lets Spark's WindowGroupLimit prune
  each partition to its top-k BEFORE the window shuffle (the q07
  plan contract).
- Votes and agreement counts are two bounded hash aggregates over at
  most k rows per point (map-side combine collapses them
  pre-shuffle).
- Everything is 6-decimal-rounded cosine arithmetic over doubles, so
  the verdict for every point is reproducible in any engine — the
  DuckDB oracle (q144) replays quantizer, neighbor ranking, majority
  vote, and the noise flag end-to-end.

The reference engine has no analogue (filesystem metadata domain);
this extends the LLM-pipeline surface (SURVEY.md §7 step 9) alongside
SemDeDup (q88) and cluster-balance profiling (q134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dudb_spark.pipeline.similarity import dot


def knn_label_noise(
    df: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    cells=None,
) -> DataFrame:
    """One row per input vector:
    (id, label, n_neighbors, n_agree, maj_label, maj_n, noise_candidate).

    ``maj_label`` is the most common label among the point's k nearest
    same-cell neighbors (ties → smaller label); ``noise_candidate`` is
    true when that majority exists and disagrees with the point's own
    label.  Points alone in their cell have zero neighbors, a NULL
    majority, and are never flagged — absence of evidence is not
    noise."""
    from dudb_spark.pipeline.ivf import fixed_cells

    assigned, _ = cells or fixed_cells(df, n_clusters, vec_col, id_col)
    lab = df.select(F.col(id_col), F.col(label_col).alias("label"))

    a = assigned.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("_nv").alias("n_a"),
    )
    b = assigned.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("_nv").alias("n_b"),
    )
    cs = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b", cs.alias("cs"))
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cs"), "id_b")
    knn = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("id_a", "id_b")
    )
    nb = knn.join(
        lab.select(
            F.col(id_col).alias("id_b"), F.col("label").alias("nb_label")
        ),
        "id_b",
    ).join(
        lab.select(
            F.col(id_col).alias("id_a"), F.col("label").alias("own_label")
        ),
        "id_a",
    )
    votes = nb.groupBy("id_a", "nb_label").agg(F.count(F.lit(1)).alias("n"))
    maj = (
        votes.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id_a").orderBy(F.desc("n"), "nb_label")
            ),
        )
        .where(F.col("rk") == 1)
        .select(
            "id_a",
            F.col("nb_label").alias("maj_label"),
            F.col("n").alias("maj_n"),
        )
    )
    agree = nb.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.count(
            F.when(F.col("nb_label") == F.col("own_label"), 1)
        ).alias("n_agree"),
    )
    out = (
        lab.join(maj.withColumnRenamed("id_a", id_col), id_col, "left")
        .join(agree.withColumnRenamed("id_a", id_col), id_col, "left")
        .select(
            id_col,
            "label",
            F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
            F.coalesce("n_agree", F.lit(0)).alias("n_agree"),
            "maj_label",
            "maj_n",
            F.coalesce(
                F.col("maj_label") != F.col("label"), F.lit(False)
            ).alias("noise_candidate"),
        )
    )
    return out
