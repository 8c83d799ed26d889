"""Benchmark decontamination: flag corpus documents sharing word n-grams
with a held-out evaluation set (the PaLM/GPT-3 style 'n-gram overlap'
filter; reference has no counterpart — LLM-pipeline extension).

100 TB design: the eval set is small (benchmark suites are thousands of
documents), so its distinct shingle set is BROADCAST — the corpus side is
a narrow projection (tokenize → shingle → explode) joined map-side with
no corpus shuffle.  The only shuffle is the per-doc re-aggregation of the
matched rows, whose cardinality is bounded by matches (≪ corpus).  The
corpus scan prunes to (id, text) columns only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def _shingled(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, sg) with STAGED projections: tokenize once per row, then
    shingle from the bound token array.  Inlining ``tokens()`` into the
    transform lambda re-evaluates the split per shingle position
    (O(positions·chars) per doc — the repo's documented lambda hazard);
    staging keeps it linear."""
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("tk"))
    sg = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.greatest(F.size("tk") - (n - 1), F.lit(1))
            ),
            lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i, n)),
        )
    )
    return toks.select(id_col, sg.alias("sg"))


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per contaminated corpus doc: how many of its distinct n-gram
    shingles appear anywhere in the eval set.

    Returns (id, n_shingles, n_hit, contamination) for docs with ≥1 hit;
    contamination = n_hit / n_shingles rounded to 6 places.

    ``explode_outer`` + null filter, NOT ``explode``: a plain explode
    triggers InferFiltersFromGenerate, whose ``size(sg) > 0`` predicate
    is alias-substituted through the staged projections and re-inlines
    the whole shingle expression into the scan filter (2× evaluation,
    measured 4× wall-clock at sf0.1).
    """
    eval_shingles = (
        _shingled(eval_set, n, text_col, id_col)
        .select(F.explode_outer("sg").alias("shingle"))
        .where(F.col("shingle").isNotNull())
        .distinct()
    )
    corpus_shingled = (
        _shingled(corpus, n, text_col, id_col)
        .select(
            id_col,
            F.size("sg").alias("n_shingles"),
            F.explode_outer("sg").alias("shingle"),
        )
        .where(F.col("shingle").isNotNull())
    )
    hits = corpus_shingled.join(F.broadcast(eval_shingles), "shingle")
    return (
        hits.groupBy(id_col, "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            F.round(
                F.col("n_hit") / F.col("n_shingles").cast("double"), 6
            ).alias("contamination"),
        )
    )


def source_overlap_matrix(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Cross-source n-gram leakage matrix: for every pair of subcorpora,
    how many DISTINCT ``n``-gram types occur in both, plus the Jaccard of
    their gram-type sets — the dataset-curation view of where benchmark
    or duplicate text is bleeding between sources.

    Scale shape: grams hash to int64 inside the transform (narrow rows),
    reduce to the DISTINCT (group, gram) set first — bounded by gram
    VOCABULARY per source, not corpus size — then a self-equi-join on the
    gram hash; pair counts aggregate map-side.  Per-source totals come
    back as a broadcast join for the Jaccard denominator."""
    from dudb_spark.pipeline.spans import gram_occurrences

    occ = gram_occurrences(df, n, id_col, text_col)
    g = (
        occ.join(
            df.select(F.col(id_col).alias("doc_id"), group_col), "doc_id"
        )
        .select(group_col, "gh")
        .distinct()
    )
    totals = g.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = g.alias("a"), g.alias("b")
    ga, gb = f"a.{group_col}", f"b.{group_col}"
    shared = (
        a.join(
            b,
            (F.col("a.gh") == F.col("b.gh"))
            & (F.col(ga) < F.col(gb)),
        )
        .groupBy(
            F.col(ga).alias("source_a"), F.col(gb).alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ta = totals.select(
        F.col(group_col).alias("source_a"), F.col("n_grams").alias("n_a")
    )
    tb = totals.select(
        F.col(group_col).alias("source_b"), F.col("n_grams").alias("n_b")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_grams")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_grams")),
                6,
            ).alias("jaccard"),
        )
    )
