"""Text-analysis operators — all native Column expressions (JVM-side,
whole-stage-codegen friendly; no Python in the hot path).

Designed for 100 TB corpora: every function is a narrow projection over the
``documents`` table, no shuffle, no UDF, so it fuses into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# Winnowing (MOSS-style document fingerprinting; Schleimer, Wilkerson &
# Aiken, SIGMOD'03).  Hash arithmetic is plain modular polynomial math, so
# an oracle engine can reproduce the exact values — unlike xxhash64-based
# sketches.
_WINNOW_BASE = 257
_WINNOW_MOD = (1 << 31) - 1


def _winnow_norm(text: Column) -> Column:
    """Winnowing normalization: lowercase, drop everything but [a-z0-9] —
    whitespace/punctuation-insensitive matching, and every remaining char is
    ASCII so code points agree across engines."""
    return F.regexp_replace(F.lower(text), "[^a-z0-9]", "")


def _char_codes(text: Column) -> Column:
    """Code points of the normalized text as array<long>."""
    return F.transform(
        F.split(_winnow_norm(text), ""), lambda c: F.ascii(c).cast("long")
    )


def _kgram_hashes_from(codes: Column, k: int) -> Column:
    """``h_i = (sum_j codes[i+j] * BASE^(k-1-j)) mod M`` per position.
    ``codes`` MUST be a bound attribute (its own select stage), not an
    inline alias: expressions referenced inside a ``transform`` lambda are
    re-evaluated per element, so an inlined normalization would turn this
    into O(n²) regex work per document (measured: hangs at 500 docs)."""
    powers = [pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)]

    def gram_hash(i: Column) -> Column:
        # max term ≈ 122 * 2^31 ≈ 2.6e11; k terms stay far below 2^63
        acc = F.lit(0).cast("long")
        for j, p in enumerate(powers):
            acc = acc + F.element_at(codes, i + F.lit(j)) * F.lit(p)
        return F.pmod(acc, F.lit(_WINNOW_MOD))

    n = F.size(codes)
    return F.when(n < k, F.array().cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))), gram_hash)
    )


def _winnow_mins_from(hashes: Column, window: int) -> Column:
    """Distinct sliding-window minima of a bound hash-array attribute,
    sorted.  Same attribute rule as :func:`_kgram_hashes_from`."""
    nh = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(nh - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.when(nh <= 0, F.array().cast("array<bigint>")).otherwise(
        F.array_sort(F.array_distinct(mins))
    )


def winnow_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    exploded: bool = False,
) -> DataFrame:
    """Winnowed fingerprints per document: ``(id, fps array<long>)``, or
    one ``(id, fp)`` row per fingerprint with ``exploded=True``.

    Three staged projections (normalize → k-gram hashes → window minima) so
    each intermediate is evaluated once per row; guarantee (the winnowing
    theorem): any shared substring of length ≥ k + window - 1 yields at
    least one shared fingerprint, while only ~2/(window+1) of positions
    are kept.

    The exploded form MUST use ``explode_outer``: a plain ``explode``
    triggers InferFiltersFromGenerate, whose synthesized ``size(fps) > 0``
    predicate is alias-substituted through the staged projections on
    pushdown — re-inlining the whole winnow expression with per-lambda
    re-evaluation (measured: minutes instead of seconds at 500 docs).
    The generator-output null filter below cannot be pushed past the
    Generate, so the staging survives."""
    codes = df.select(
        F.col(id_col).alias("id"), _char_codes(F.col(text_col)).alias("codes")
    )
    hashes = codes.select("id", _kgram_hashes_from(F.col("codes"), k).alias("hs"))
    fps = hashes.select("id", _winnow_mins_from(F.col("hs"), window).alias("fps"))
    if not exploded:
        return fps
    return fps.select("id", F.explode_outer("fps").alias("fp")).where(
        F.col("fp").isNotNull()
    )


def winnow_fingerprints(text: Column, k: int = 5, window: int = 4) -> Column:
    """Single-Column winnowing convenience.  ONLY for short strings/small
    frames: the staged :func:`winnow_df` is the bulk path — this inline
    form re-evaluates the normalization inside the per-position lambdas
    (quadratic per document)."""
    return _winnow_mins_from(_kgram_hashes_from(_char_codes(text), k), window)


def stopword_hits(text: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(F.lower(text)), lambda t: F.array_contains(arr, t)))


# Tiny per-language character-trigram profiles (hand-picked high-frequency
# trigrams incl. word boundaries, '_' = space).  Deliberately small: a cheap
# distributed n-gram signal that — unlike stopword voting — also works on
# text without clean token boundaries.
TRIGRAM_PROFILES = {
    "en": ["the", "he_", "_th", "ing", "and", "_of", "ed_", "is_", "_to", "er_"],
    "de": ["der", "ein", "ich", "sch", "die", "und", "_de", "en_", "cht", "ist"],
    "es": ["_de", "que", "el_", "la_", "os_", "_la", "ión", "ado", "es_", "_es"],
    "fr": ["_de", "le_", "es_", "ent", "_le", "de_", "la_", "et_", "ion", "que"],
}


def _trigram_norm(text: Column) -> Column:
    """Lowercase, whitespace runs → '_', '_'-padded both ends so
    word-boundary trigrams exist."""
    return F.concat(
        F.lit("_"), F.regexp_replace(F.lower(text), "\\s+", "_"), F.lit("_")
    )


def _trigrams_from(s: Column) -> Column:
    """Distinct char trigrams of a BOUND normalized-string attribute (the
    per-position substr runs on the attribute — inlining the normalization
    here would re-run its regex per position)."""
    n = F.length(s)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
            lambda i: s.substr(i, F.lit(3)),
        )
    )


def language_id_ngram_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Char-trigram language ID: score = |trigrams(doc) ∩ profile(lang)|,
    argmax with 'und' when nothing matches and language-code tie-break.
    Works without clean token boundaries (unlike stopword voting).

    Because the profiles are tiny (10 trigrams/language), the
    intersection size equals the count of profile trigrams CONTAINED in
    the normalized text — so the score is |profiles| substring probes
    per row (whole-stage-codegen ``instr``), never a materialized
    per-document trigram array (the array_distinct build measured ~3×
    the probes' cost).  ``_trigrams_from`` remains for callers that need
    the explicit trigram sets."""
    s = df.select(
        F.col(id_col).alias("id"), _trigram_norm(F.col(text_col)).alias("s")
    )

    def hits(profile):
        probes = [
            (F.instr(F.col("s"), t) > 0).cast("int") for t in profile
        ]
        total = probes[0]
        for p in probes[1:]:
            total = total + p
        return total

    pairs = [
        F.struct(hits(profile).alias("hits"), F.lit(lang).alias("lang"))
        for lang, profile in sorted(TRIGRAM_PROFILES.items())
    ]
    best = F.array_max(F.array(*pairs))
    return s.select(
        "id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["hits"].alias("n_hits"),
    )


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


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn's ``idf = ln((1+N)/(1+df)) + 1``).

    Scale shape: explode → ONE shuffle on (doc, term) for term frequency;
    document frequency is a second aggregate of that (already reduced)
    frame; N rides along as a broadcast scalar, never a collected
    driver value.  The per-doc ranking window partitions on the doc id,
    so no global sort.  Stopword-ish terms rank themselves out (their
    idf → 1), which is why no stopword list is needed here.  The tf
    frame is persisted so its two consumers (docfreq, the scoring join)
    share one explode+shuffle — see bm25_top_terms for the measured
    rationale."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df")))
                    + F.lit(1)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-word
    fraction and the fraction of all word bigrams taken by the single
    most frequent bigram (boilerplate / degenerate-repetition detector).

    Scale shape: explode bigrams → ONE (doc, bigram) shuffle → per-doc
    max/sum re-aggregation (second shuffle is on the already-reduced
    frame).  No window, no UDF; both aggregations are partial-combine
    friendly, so the map side collapses repeated bigrams before the
    exchange — degenerate repetitive docs (the very thing this filter
    flags) shrink the MOST map-side.  Per-doc arrays never materialize
    quadratically, unlike the local ``array_max(filter(...))`` shape.
    Tokenization is staged as its own projection (bound attribute) and
    the explode is the explode_outer + null-filter idiom — see
    winnow_df's docstring for both hazards."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tk")
    )
    tk = F.col("tk")
    base = toks.select(
        "doc_id",
        F.size(tk).alias("n_words"),
        F.size(F.array_distinct(tk)).alias("n_distinct"),
        F.explode_outer(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size(tk) - F.lit(1), F.lit(1))
                ),
                lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
            )
        ).alias("bigram"),
    ).where(F.col("bigram").isNotNull())
    per_bigram = base.groupBy("doc_id", "n_words", "n_distinct", "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_bigram.groupBy("doc_id", "n_words", "n_distinct").agg(
        F.round(
            F.lit(1.0) - F.max("n_distinct") / F.max("n_words").cast("double"),
            6,
        ).alias("dup_word_frac"),
        F.round(F.max("cnt") / F.sum("cnt").cast("double"), 6).alias(
            "top_bigram_frac"
        ),
    ).select("doc_id", "n_words", "dup_word_frac", "top_bigram_frac")


def bm25_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 3,
) -> DataFrame:
    """Top-k terms per document by Okapi BM25 (idf·tf saturation with
    document-length normalization) — the ranking-function sibling of
    :func:`tfidf_top_terms`, same one-(doc,term)-shuffle shape.

    avgdl and N ride along as one broadcast scalar row (never collected
    to the driver); doc length comes from the tf frame itself
    (sum(tf) per doc).  The tf frame is persisted: Spark SQL has no
    DAG-level common-subexpression reuse, so its three consumers (dl,
    df, the scoring join) would otherwise each re-explode and re-shuffle
    the raw token stream — measured as 4 Generate nodes in the executed
    plan.  Persisting the REDUCED frame (one row per (doc, term)) is the
    at-scale tradeoff: one materialization read three times beats three
    corpus-wide explode+shuffle passes."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(docfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bm25", F.round(idf * F.col("tf") * F.lit(k1 + 1) / norm, 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("bm25").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "term", "tf", "bm25", "rank")
    )


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 20,
    overlap: int = 5,
) -> DataFrame:
    """Sliding token-window chunking (the RAG/embedding-prep shape): one
    row per (doc, chunk) with ``chunk``-token windows advancing by
    ``chunk − overlap`` tokens.

    Scale shape: staged tokenization (bound attribute) → one posexplode
    Generate per document — a narrow scan-side expansion bounded by
    tokens/(chunk−overlap) rows per doc, no shuffle at all; downstream
    embedding/dedup stages shuffle the already-chunked rows.  The
    explode_outer + null-filter idiom keeps the staging intact."""
    step = chunk - overlap
    if step <= 0:
        raise ValueError("chunk must exceed overlap")
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tk")
    )
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("tk"), F.lit(1)), F.lit(step)
    )
    # tk rides along the Generate (array duplicated per chunk row — a
    # narrow scan-side expansion, cheaper than re-joining on doc_id)
    exploded = toks.select(
        "doc_id",
        "tk",
        F.size("tk").alias("doc_tokens"),
        F.posexplode_outer(starts).alias("chunk_id", "start"),
    ).where(F.col("start").isNotNull())
    piece = F.slice(F.col("tk"), F.col("start"), chunk)
    return exploded.select(
        "doc_id",
        "chunk_id",
        "doc_tokens",
        F.size(piece).alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).where(F.col("n_tokens") > 0)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    empirical unigram model — the shape of a CCNet-style LM quality
    filter with the KenLM swapped for a self-estimated unigram model.

    Two aggregates over one exploded pass: global term counts (the
    "model"), then a term-keyed join back onto the (doc, term, tf)
    frame.  The join is big×medium on the term key and stopwords make it
    skewed — exactly the shape AQE skew-join handles; the model side is
    |vocab| rows, far smaller than the token stream.  Mean log-prob is
    tf-weighted: sum(tf·ln(count/total)) / sum(tf)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    model = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = model.select(F.sum("cnt").alias("total"))
    return (
        tf.join(model, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.log(F.col("cnt") / F.col("total")))
                / F.sum("tf"),
                6,
            ).alias("mean_logprob"),
            F.sum("tf").alias("n_tokens"),
        )
    )


def gopher_flags(text: Column) -> Column:
    """Gopher-style quality-rule struct (Rae et al. 2021, *Scaling
    Language Models: ... Gopher*, Appendix A1.1) — each rule a boolean
    plus the measurements behind it, so a curation job can both filter
    and report per-rule rejection rates.

    Pure Column arithmetic over one tokenization — fuses into the scan,
    no shuffle, no UDF.  Doubles are rounded to 6 dp so an oracle engine
    reproduces them bit-for-bit.  Thresholds follow the paper except
    ``min_words`` (Gopher: 50), lowered to 30 so short-doc corpora keep a
    meaningful pass rate; ``top_unigram_frac`` stands in for the paper's
    duplicate-line rules on corpora without line structure.
    """
    t = tokens(text)
    n = F.size(t)
    mean_len = F.round(
        F.aggregate(
            t, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).cast("double")
        / F.greatest(n, F.lit(1)),
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / F.greatest(n, F.lit(1)),
        6,
    )
    symbolish = F.size(
        F.filter(t, lambda w: w.rlike("^[#…]+$") | w.contains("..."))
    )
    symbol_ratio = F.round(
        symbolish.cast("double") / F.greatest(n, F.lit(1)), 6
    )
    stop_hits = F.size(
        F.filter(t, lambda w: w.isin([*STOPWORDS["en"]]))
    )
    # max unigram multiplicity as the longest run in the SORTED token
    # array — O(L log L) per row instead of the O(|vocab|·L) nested
    # filter-per-distinct-token scan (same value, ~6x fewer lambda evals
    # on typical docs)
    top_unigram = F.aggregate(
        F.array_sort(t),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.round(
        F.coalesce(top_unigram, F.lit(0)).cast("double")
        / F.greatest(n, F.lit(1)),
        6,
    )
    return F.struct(
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        top_frac.alias("top_unigram_frac"),
        n.between(30, 100000).alias("ok_words"),
        mean_len.between(3.0, 10.0).alias("ok_mean_len"),
        (alpha_frac >= 0.8).alias("ok_alpha"),
        (symbol_ratio <= 0.1).alias("ok_symbols"),
        (stop_hits >= 2).alias("ok_stopwords"),
        (top_frac <= 0.2).alias("ok_repetition"),
        (
            n.between(30, 100000)
            & mean_len.between(3.0, 10.0)
            & (alpha_frac >= 0.8)
            & (symbol_ratio <= 0.1)
            & (stop_hits >= 2)
            & (top_frac <= 0.2)
        ).alias("passes"),
    )


def vocab_oov(
    df: DataFrame,
    top_v: int = 1000,
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """Tokenizer-pipeline artifact: induce the global top-``top_v``
    vocabulary by corpus frequency, then measure per-subcorpus coverage —
    ``(group, n_tokens, n_oov, oov_rate)``.

    The vocabulary side is bounded (``top_v`` rows) and broadcast, so
    coverage is a map-side join over the token stream: one term-keyed
    aggregation for counts (skewed — stopwords — but partial aggregation
    absorbs it), one TakeOrdered for the vocab, one broadcast-join pass
    for coverage.  Tie-break on the term string keeps the induced vocab
    deterministic across engines.
    """
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = (
        counts.orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(top_v)
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy(F.col("grp").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_in_vocab").isNull(), 1)).alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6),
        )
    )


def chunk_documents(
    df: DataFrame,
    size: int = 64,
    stride: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping token windows — the context-window chunking
    step of a training/RAG pipeline: each document splits into windows of
    ``size`` tokens starting every ``stride`` tokens (``stride == size``
    gives non-overlapping LM blocks; smaller strides overlap for
    retrieval).  Returns ``(doc_id, win_id, start_tok, n_tokens,
    chunk_text)``; the final window may be short, every token belongs to
    at least one window, and empty documents yield none.

    Scale shape: one scan-fused ``explode(sequence)`` over the token
    array — the output volume is rows × ceil(L/stride), bounded by the
    corpus token count times the overlap factor; no shuffle, no UDF."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_t"),
    ).withColumn("_L", F.size("_t"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_L") - 1, F.lit(0)), F.lit(stride)
    )
    out = (
        toks.where(F.col("_L") > 0)
        .select(
            "doc_id",
            "_t",
            F.posexplode(starts).alias("win_id", "start_tok"),
        )
        .select(
            "doc_id",
            "win_id",
            "start_tok",
            F.slice("_t", F.col("start_tok") + 1, size).alias("_c"),
        )
    )
    return out.select(
        "doc_id",
        "win_id",
        "start_tok",
        F.size("_c").alias("n_tokens"),
        F.array_join("_c", " ").alias("chunk_text"),
    )


def bigram_logprob(
    df: DataFrame,
    train_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-probability under a Laplace-smoothed
    bigram model estimated on a reference slice — the CCNet quality
    filter (Wenzek et al. 2020, *CCNet: Extracting High Quality
    Monolingual Datasets from Web Crawl Data*) with the KenLM swapped
    for a self-estimated first-order Markov model: documents whose word
    sequences look unlike the reference slice score low and can be
    binned head/middle/tail exactly as CCNet does.  q52's unigram filter
    scores vocabulary; this scores WORD ORDER — shuffled or boilerplate
    text keeps its unigram score but collapses here.

    Model: p(w2|w1) = (c12 + 1) / (c1 + V) with c12/c1 counts over the
    ``train_pred`` slice and V the slice's context-vocabulary size —
    add-one smoothing keeps every model quantity an integer, so both
    engines build the identical model and the only floats are the final
    per-bigram ln() terms (rounded to 6 dp at the output, the q52
    discipline).  Unseen contexts fall back to 1/V.

    Scale shape: bigrams pair each token with its successor via
    ``zip_with`` over a shifted slice (NEVER an indexed lambda — see
    dsir.gram_buckets_from on the O(tokens²) inlining hazard), one
    exploded pass shared by model and scoring sides; the model joins
    are term-keyed big×medium with stopword-pair skew — the AQE
    skew-join shape, exactly like q52; V rides as a broadcast scalar.
    Documents with < 2 tokens have no bigrams and drop out (scored
    vacuously; callers that need them keep them with a left join).

    Output: (doc_id, n_bigrams, mean_lp)."""
    t = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        train_pred.alias("_is_train"),
        t.alias("_t"),
    )
    nxt = F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0)))
    pair = F.filter(
        F.zip_with(
            F.col("_t"), nxt,
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )
    pairs = base.select(
        "doc_id", "_is_train", F.explode(pair).alias("bg")
    ).select("doc_id", "_is_train", F.col("bg.w1"), F.col("bg.w2"))
    tf = pairs.groupBy("doc_id", "_is_train", "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    model = (
        tf.where("_is_train")
        .groupBy("w1", "w2")
        .agg(F.sum("tf").alias("c12"))
    )
    ctx = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = ctx.select(F.count(F.lit(1)).alias("v"))
    # an empty reference slice would make V=0 and every score
    # ln(x/0) = +Inf — a silent misconfiguration; refuse loudly
    # (cheap: tf is persisted, the probe folds ≤|vocab| rows)
    if ctx.limit(1).count() == 0:
        raise ValueError(
            "bigram_logprob: train_pred matched no rows with ≥2 "
            "tokens — the reference slice is empty"
        )
    lp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
    )
    return (
        tf.join(model, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum(F.col("tf") * lp) / F.sum("tf"), 6).alias(
                "mean_lp"
            ),
        )
    )


def symbol_entropy(
    sym_rows: DataFrame, id_col: str = "id", sym_col: str = "sym",
    out_col: str = "entropy",
) -> DataFrame:
    """Shannon entropy (nats) of a per-document symbol distribution
    given as ``(id, sym)`` occurrence rows: ``H = Σ (c/n)·ln(n/c)``
    over the distinct symbols.  Each term is quantized to INTEGER
    nano-units before the sum (the drift.py discipline): the division,
    ln, product, and round are single IEEE ops over exact integers —
    identical in any engine — and the int64 sum is order-free, so the
    fold replays bit-for-bit where a float Σ would drift with
    partitioning.  Scale shape: two keyed aggregations, state bounded
    by (docs × alphabet)."""
    cnts = sym_rows.groupBy(id_col, sym_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tot = cnts.groupBy(id_col).agg(F.sum("_c").alias("_n"))
    term = F.round(
        F.lit(1e9)
        * (F.col("_c").cast("double") / F.col("_n").cast("double"))
        * F.log(F.col("_n").cast("double") / F.col("_c").cast("double"))
    ).cast("long")
    return (
        cnts.join(tot, id_col)
        .select(id_col, term.alias("_tn"))
        .groupBy(id_col)
        .agg(F.round(F.sum("_tn") / 1e9, 6).alias(out_col))
    )


def entropy_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character- and token-distribution entropies — the
    repetition/gibberish signal quality pipelines read alongside the
    rule-based filters (q21 Gopher, q157 bigram LM): machine-generated
    repetition crashes char entropy toward 0, while natural prose sits
    near its language's ~3-4 nats; token entropy separates "same words
    over and over" from varied text at equal char statistics.  Empty
    or NULL text scores 0 by convention (kept, not dropped — a doc
    with no signal is a finding).  Returns ``(id_col, n_chars,
    char_entropy, token_entropy)``.

    Unicode boundary (documented, not certified): the char split runs
    on JVM UTF-16 code units while an oracle engine splits UTF-8
    codepoints — identical for BMP text (all fixture languages incl.
    zh), divergent on supplementary-plane chars (emoji), where each
    surrogate half counts as a symbol."""
    chars = df.select(
        id_col,
        F.explode(
            F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
        ).alias("sym"),
    )
    toks = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("sym")
    )
    ch = symbol_entropy(chars, id_col, out_col="char_entropy")
    th = symbol_entropy(toks, id_col, out_col="token_entropy")
    return (
        df.select(id_col,
                  F.coalesce(F.length(text_col), F.lit(0))
                  .alias("n_chars"))
        .join(ch, id_col, "left")
        .join(th, id_col, "left")
        .select(
            id_col, "n_chars",
            F.coalesce("char_entropy", F.lit(0.0)).alias("char_entropy"),
            F.coalesce("token_entropy", F.lit(0.0))
            .alias("token_entropy"),
        )
    )


def blocklist_filter(
    docs: DataFrame,
    terms: list[str],
    max_density: float = 0.1,
    max_hits: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level blocklist filtering — the C4-style "bad words"
    gate (Raffel et al. 2020 drop any page with a blocklist hit;
    Gopher/RefinedWeb soften it to a density threshold, implemented
    here): per document the token count, blocklist hit count,
    hit density and a keep flag (density <= max_density AND, when
    set, hits <= max_hits).

    Scale shape: the term list enters as a CONSTANT-FOLDED literal
    array and matching is a scan-side higher-order filter — zero
    joins, zero shuffles, whole-stage codegen; right for curated
    lists up to a few thousand terms (O(|terms|) per token).  A
    100k-term list should instead explode tokens and broadcast-join
    the term table (the q105 vocab shape) — documented, not needed
    for curation blocklists.  Matching is case-insensitive exact
    token equality; NULL text scores 0 tokens / 0 hits and is KEPT
    (the q173 empty-doc convention).  Density is hits/tokens in
    double, rounded to 9 places in the same operation order as the
    SQL restatement."""
    tok = tokens(F.coalesce(F.col(text_col), F.lit("")))
    lit_terms = F.array(*[F.lit(t.lower()) for t in sorted(set(terms))])
    hits = F.size(
        F.filter(tok, lambda t: F.array_contains(lit_terms, F.lower(t)))
    )
    n = F.size(tok)
    density = F.when(
        n > 0, F.round(hits.cast("double") / n, 9)
    ).otherwise(F.lit(0.0))
    keep = density <= F.lit(max_density)
    if max_hits is not None:
        keep = keep & (hits <= F.lit(max_hits))
    return docs.select(
        id_col,
        n.alias("n_tokens"),
        hits.alias("n_hits"),
        density.alias("hit_density"),
        keep.alias("keep"),
    )
