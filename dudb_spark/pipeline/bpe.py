"""BPE merge induction — the tokenizer-TRAINING step of an LLM data
pipeline (Sennrich, Haddow & Birch 2016, *Neural Machine Translation of
Rare Words with Subword Units*): starting from characters, repeatedly
merge the most frequent adjacent symbol pair across the corpus and
record the merge table a tokenizer ships.

Spark shape, sized for 100 TB:

- The corpus collapses to the WEIGHTED VOCABULARY first (distinct word ×
  frequency) — the classic BPE trick: every later round runs over the
  vocabulary table, whose size is bounded by the lexicon, not the corpus.
  That one corpus-wide pass is a plain explode + groupBy with map-side
  partials.
- Each round is: pair explode over the symbol arrays → one grouped
  count → a single driver-side argmax row (one scalar decision per
  round, the same boundary as the connected-components convergence
  check) → a scan-fused fold that applies the merge to every word.
  The vocabulary frame is localCheckpoint'ed per round (Pregel shape,
  like pagerank) so plans stay flat — LAZILY (eager=False), so the
  checkpoint materializes inside the next round's argmax job instead of
  paying a second job per round: one Spark job per merge round total.
- The merge application is a LEFT-TO-RIGHT fold with the "fresh merge
  can't re-match" property falling out of string identity (the merged
  symbol ``a||b`` never equals ``a`` since ``b`` is non-empty).  The
  SAME fold, in the same order, is expressible in DuckDB's
  ``list_reduce`` — so the q124 oracle replays every round exactly,
  merge choices, tie-breaks and all.

Words are normalized to lowercase ``[a-z]+`` tokens (deterministic
char-splitting across engines); the classic end-of-word marker is
omitted (documented divergence — it changes which merges win, not the
mechanics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dudb_spark.pipeline.text import tokens


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_merges(
    df: DataFrame,
    rounds: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """The first ``rounds`` BPE merges over the corpus: one row per round
    ``(merge_round, lhs, rhs, merged, pair_count)``, ordered by round.
    Ties in pair frequency break on (lhs, rhs) ascending."""
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(tokens(F.lower(F.coalesce(F.col(text_col), F.lit("")))))
            .alias("w")
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("sym"),
        "freq",
    ).localCheckpoint(eager=False)

    out = []
    for r in range(rounds):
        pairs = vocab.where(F.size("sym") > 1).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sym) - 1), "
                    "i -> struct(sym[i - 1] AS l, sym[i] AS r))"
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "l", "r")
            .first()
        )
        if best is None:
            break
        a, b = best["l"], best["r"]
        out.append((r, a, b, a + b, int(best["cnt"])))
        la, lb, lab = _sql_str(a), _sql_str(b), _sql_str(a + b)
        vocab = vocab.select(
            F.expr(
                "aggregate(sym, CAST(array() AS array<string>), "
                "(acc, x) -> CASE WHEN size(acc) > 0 "
                f"AND element_at(acc, -1) = {la} AND x = {lb} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array({lab})) "
                "ELSE concat(acc, array(x)) END)"
            ).alias("sym"),
            "freq",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        out,
        "merge_round int, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table (the INFERENCE side
    of :func:`bpe_merges`): per document ``(doc_id, n_words, n_chars,
    n_bpe_tokens, chars_per_token)`` where ``n_bpe_tokens`` is the token
    count after applying every merge, in order, with the same greedy
    left-to-right fold as training.  Documents with no ``[a-z]+`` words
    yield no row.

    Scale shape: the corpus reduces to per-(doc, word) counts in one
    explode + groupBy, the merge folds run over the DISTINCT vocabulary
    only (bounded by the lexicon, not the corpus — all ``len(merges)``
    folds chain into one scan-fused projection), and the word→token-count
    map joins back on the word key; AQE picks broadcast vs shuffle from
    the vocabulary's real size.  No UDFs, no driver-side data."""
    doc_words = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
            ).alias("w"),
        )
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    enc = doc_words.select("w").distinct().select(
        "w",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("sym"),
    )
    for a, b in merges:
        la, lb, lab = _sql_str(a), _sql_str(b), _sql_str(a + b)
        enc = enc.select(
            "w",
            F.expr(
                "aggregate(sym, CAST(array() AS array<string>), "
                "(acc, x) -> CASE WHEN size(acc) > 0 "
                f"AND element_at(acc, -1) = {la} AND x = {lb} "
                f"THEN concat(slice(acc, 1, size(acc) - 1), array({lab})) "
                "ELSE concat(acc, array(x)) END)"
            ).alias("sym"),
        )
    enc = enc.select("w", F.size("sym").alias("n_tok"))
    return (
        doc_words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.length("w")).alias("n_chars"),
            F.sum(F.col("n") * F.col("n_tok")).alias("n_bpe_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_bpe_tokens"), 6
            ),
        )
    )
