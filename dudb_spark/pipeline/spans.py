"""Exact n-gram span deduplication — "substring dedup" for training
corpora (Lee et al. 2021, *Deduplicating Training Data Makes Language
Models Better*), in the n-gram approximation production pipelines use
(suffix automata don't distribute; fixed-width gram matching does).

Semantics: every length-``n`` token window is a *gram occurrence*
``(doc_id, pos)``.  Within a gram's occurrence list, the lexicographically
first ``(doc_id, pos)`` is canonical; every later occurrence is a
duplicate, and the ``n`` token positions it covers are removed from its
document.  Remaining tokens are re-joined in order, so the output is the
corpus with every repeated n-token span kept exactly once (at its first
corpus position).

Scale shape (the reason this is written the way it is):

- Gram keys shuffle as ``xxhash64`` int64s, not strings: the exploded
  frame is ``(doc_id, pos, int64)`` — 24 bytes/row instead of carrying
  ~n·avg_token bytes of text through the exchange.  A 64-bit collision
  merges two unrelated grams (P ≈ G²/2⁶⁵); at trillion-gram scale swap in
  a 128-bit hash or a Bloom-filter pre-pass, same plan shape.
- Hashing happens INSIDE the per-row ``transform`` lambda, before the
  explode, so the wide gram text never materializes as rows.
- First-occurrence detection is a window partitioned BY GRAM — thousands
  of tiny partitions, never a global order.  Only rows with ``rn > 1``
  survive the window, so the covered-position explode is bounded by the
  duplicate volume, not the corpus.
- Token removal is an anti-join on ``(doc_id, pos)`` — co-partitioned
  with the final per-doc regroup.

Reference parity: the reference engine has no text operators (it is a
filesystem-metadata engine); this extends the pipeline surface of
SURVEY.md §7 step 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dudb_spark.pipeline.text import tokens


def gram_occurrences(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(doc_id, p, gh)`` — one row per n-gram occurrence, gram hashed
    to int64 before the explode so only narrow rows shuffle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("arr"),
    )
    return (
        toks.where(F.size("arr") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("arr") - n),
                    lambda p: F.struct(
                        p.alias("p"),
                        F.xxhash64(
                            F.concat_ws(
                                " ", F.slice("arr", p + 1, n)
                            )
                        ).alias("gh"),
                    ),
                )
            ).alias("g"),
        )
        .select("doc_id", "g.p", "g.gh")
    )


def _rebuild_without(toks: DataFrame, covered: DataFrame) -> DataFrame:
    """Drop ``covered`` (doc_id, pos) token positions and re-join the
    survivors in order: ``(doc_id, n_tokens, n_removed, dedup_text)``.
    ``toks`` is ``(doc_id, arr, L)``."""
    pos_tok = toks.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok")
    )
    kept = pos_tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("dedup_text"),
    )
    return (
        toks.select("doc_id", "L")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("L").alias("n_tokens"),
            (F.col("L") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


def _toks(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    # null text folds to the empty document (size(NULL) would be -1)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("arr"),
    ).withColumn("L", F.size("arr"))


def span_dedup(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus with every repeated ``n``-token span removed except its
    first corpus occurrence (ordered by ``(doc_id, pos)``).

    Returns one row per input document:
    ``(doc_id, n_tokens, n_removed, dedup_text)``.  A document whose
    every position is covered by duplicate spans comes back with
    ``dedup_text = ''`` — the caller decides whether to drop it.
    """
    toks = _toks(docs, id_col, text_col)
    occ = gram_occurrences(docs, n, id_col, text_col)
    w = Window.partitionBy("gh").orderBy("doc_id", "p")
    dups = (
        occ.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select("doc_id", "p")
    )
    covered = dups.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("pos"),
    ).distinct()
    return _rebuild_without(toks, covered)


def excise_spans(
    docs: DataFrame,
    reference: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str = "doc_id",
    ref_text_col: str = "text",
) -> DataFrame:
    """Decontamination by EXCISION: remove every ``n``-token span of
    ``docs`` that also occurs anywhere in ``reference`` (an eval/bench
    set), and rebuild the documents from the surviving tokens — the
    span-level cousin of ``decontam.ngram_contamination``, which only
    FLAGS overlapping documents.  Asymmetric by design: the reference is
    untouched, and within-corpus repetition is NOT removed.

    Scale shape: the reference gram set is ``distinct`` int64 hashes —
    eval sets are tiny next to the corpus, so the semi-join broadcasts;
    everything else reuses the span-dedup plan (hash-inside-transform,
    covered positions bounded by overlap volume, anti-join rebuild).
    """
    ref_grams = gram_occurrences(
        reference, n, ref_id_col, ref_text_col
    ).select("gh").distinct()
    occ = gram_occurrences(docs, n, id_col, text_col)
    hits = occ.join(F.broadcast(ref_grams), "gh", "left_semi")
    covered = hits.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + (n - 1))).alias("pos"),
    ).distinct()
    return _rebuild_without(_toks(docs, id_col, text_col), covered)
