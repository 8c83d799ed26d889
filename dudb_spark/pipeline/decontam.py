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

from .dedup import shingles


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
    """
    eval_shingles = (
        eval_set.select(
            F.explode(shingles(F.col(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corpus_shingled = corpus.select(
        F.col(id_col),
        shingles(F.col(text_col), n).alias("sg"),
    ).select(
        id_col,
        F.size("sg").alias("n_shingles"),
        F.explode("sg").alias("shingle"),
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
