"""Text-analysis operators — all native Column expressions (JVM-side,
whole-stage-codegen friendly; no Python in the hot path).

Designed for 100 TB corpora: every function is a narrow projection over the
``documents`` table, no shuffle, no UDF, so it fuses into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-voting heuristic.
# Deliberately small and deterministic — the goal is a cheap distributed
# language-ID signal, not linguistic accuracy.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "les"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    return F.filter(F.split(text, "\\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-flavoured token estimate: word-piece-like splits on
    letter/digit/punct boundaries, ~chars/4 fallback folded in.
    Counts runs of letters, digits, or single punctuation marks."""
    pieces = F.filter(
        F.split(text, r"(?<=[^\p{L}\p{N}])|(?=[^\p{L}\p{N}])"),
        lambda t: (t != "") & (t != " "),
    )
    return F.size(pieces)


def type_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + lexical diversity +
    alpha ratio.  Pure arithmetic — fuses into the scan."""
    t = tokens(text)
    n = F.size(t)
    ttr = F.size(F.array_distinct(t)).cast("double") / n
    alpha = (
        F.length(F.regexp_replace(text, r"[^a-zA-Z]", "")).cast("double")
        / F.greatest(F.length(text), F.lit(1))
    )
    len_band = F.when(n.between(20, 2000), F.lit(1.0)).otherwise(
        F.when(n < 20, n.cast("double") / 20).otherwise(F.lit(0.5))
    )
    return F.round((ttr + alpha + len_band) / 3, 6)


def fingerprint(text: Column) -> Column:
    """Whitespace/case-normalized md5 content fingerprint (used by exact
    dedup and incremental re-crawl change detection)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, "\\s+", " "))))


def stopword_hits(text: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t)))


def language_id(text: Column) -> Column:
    """Stopword-voting language ID: argmax of per-language stopword hit
    counts, 'und' (undetermined) when no stopwords hit.  Ties break by
    language code order for determinism."""
    pairs = [
        F.struct(
            stopword_hits(text, ws).alias("hits"), F.lit(lang).alias("lang")
        )
        for lang, ws in sorted(STOPWORDS.items())
    ]
    best = F.array_max(F.array(*pairs))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def annotate(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis projection over a documents table."""
    text = F.col(text_col)
    return documents.select(
        "*",
        token_count(text).alias("n_tokens"),
        F.round(type_token_ratio(text), 6).alias("ttr"),
        quality_score(text).alias("quality"),
        fingerprint(text).alias("fingerprint"),
        language_id(text).alias("lang_pred"),
    )
