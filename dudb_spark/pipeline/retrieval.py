"""Distributed BM25 retrieval: score a (small) query set against a
(huge) corpus through an inverted-index equi-join — the batch-retrieval
shape RAG data pipelines run at corpus scale.

Plan shape, sized for 100 TB:

- The corpus side becomes a postings frame ``(term, doc_id, tf, dl)`` —
  one explode + one map-side-combining groupBy, the same shuffle the
  TF-IDF/BM25-terms operators already pay.
- The query side is tokenized and **broadcast**: scoring is
  ``postings ⋈ query_terms`` on the term key with no corpus-side
  re-shuffle; only postings of query terms survive the join, so the
  scored frame is bounded by the posting lists hit, not the corpus.
- Document frequency and corpus constants (N, avgdl) for the idf come
  from the postings frame itself — df over query terms only (semi-join
  first), N/avgdl as a broadcast single-row frame; nothing collects to
  the driver.
- Per-query top-k is a window over round(score, 6) with a doc_id
  tiebreak — scores are rounded BEFORE ranking so rank order is
  reproducible across engines and runs (BM25 sums of logs differ in the
  last ulp between libm implementations).

idf uses the "plus-one" form ``ln(1 + (N - df + 0.5)/(df + 0.5))``
(Lucene's non-negative variant), so a term in >half the corpus can't
contribute a negative score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dudb_spark.pipeline.text import tokens


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(term, doc_id, tf, dl)`` — the inverted index as a frame.

    One corpus TOKENIZE pass: doc length is the per-doc sum of term
    frequencies, folded from the (doc, term) frame by a doc-partitioned
    window over the REDUCED rows — the old second explode+aggregate
    re-tokenized the whole corpus just to count tokens per doc (dl =
    sum(tf) by construction, value-identical).  Exchange accounting:
    the window adds one REDUCED-frame exchange+sort on doc_id on top of
    the (doc_id, term) groupBy shuffle — same reduced-frame exchange
    count as the old join form, minus the corpus re-read."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
    )


def bm25_scored(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The pre-ranking scored frame ``(query_id, doc_id, score)`` —
    every corpus document whose posting lists a query term touches,
    scored.  Factored out of :func:`bm25_retrieve` so ranking variants
    (top-k, exclusion-aware negative mining) share one plan.

    The postings frame is pinned (``localCheckpoint``): its THREE
    consumers below (corpus constants, per-term df, the scoring join)
    are separate plan branches, and Spark has no DAG-level common-
    subexpression reuse — unpinned, each branch re-ran the corpus
    tokenize+explode+aggregate (measured: q103's plan embedded the
    postings fold 6×, 42 Exchanges; the q74/bm25_top_terms persist
    discipline applied here).  One materialization of the REDUCED
    (doc, term) frame, read three times, beats three corpus passes at
    any scale.

    The checkpoint is LAZY (``eager=False``): the materialization runs
    inside the first action over the returned frame — the query itself
    pays it, not DataFrame construction — so plan-only callers (explain,
    composition) stay free and the r11-observed extra synchronous
    barrier job ahead of the scoring query is gone; later branches of
    the same action and later actions read the materialized partitions.
    Size note (spill-aware pin policy): one row per DISTINCT (doc, term)
    pair — the inverted index itself, which any BM25 engine must hold;
    at cluster scale swap for a spill-capable persist (or a reliable
    checkpoint) if the index outgrows executor storage."""
    post = postings(docs, id_col, text_col).localCheckpoint(eager=False)

    qterms = queries.select(
        "query_id", F.explode(tokens(F.col("qtext"))).alias("term")
    ).groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("qtf"))

    consts = post.groupBy().agg(
        F.countDistinct("doc_id").alias("n_docs"),
        (F.sum("tf") / F.countDistinct("doc_id")).alias("avgdl"),
    )
    # df only for terms some query mentions — the rest of the index is
    # never aggregated
    dfreq = (
        post.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    scored = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("qtf")
            * F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
    )
    return scored


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` corpus documents per query, BM25-scored.

    ``queries`` is a small frame ``(query_id, qtext)``.  Returns
    ``(query_id, rank, doc_id, score)``; a query term's multiplicity in
    the query weights its contribution (standard bag-of-words query).
    """
    return _rank_topk(bm25_scored(docs, queries, k1, b, id_col, text_col), k)


def hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    exclude: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hard-negative mining for retrieval training: per query, the
    top-``k`` highest-BM25 corpus documents AFTER removing ``exclude``
    — the positives and anything that would make a false negative
    (near-duplicates of the positives, same-cluster documents).

    ``exclude`` is a ``(query_id, doc_id)`` pair frame.  The exclusion
    is applied to the full scored frame BEFORE ranking (a top-k-then-
    filter would under-fill), as a broadcast anti-join: the exclusion
    set is positives-per-query-sized, never corpus-sized, so the scored
    frame is filtered map-side with no extra shuffle."""
    scored = bm25_scored(docs, queries, k1, b, id_col, text_col)
    kept = scored.join(
        F.broadcast(exclude.select("query_id", "doc_id").distinct()),
        ["query_id", "doc_id"],
        "left_anti",
    )
    return _rank_topk(kept, k)


def rrf_fuse(
    ranked: dict[str, DataFrame],
    k_const: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke, SIGIR 2009) of N
    ranked retrieval lists — the standard hybrid-search combiner for
    sparse (BM25) + dense (embedding) candidate pools in RAG data
    pipelines.

    Each frame in ``ranked`` is ``(query_id, id_col, rank)`` (rank
    1-based within query).  Fused score for a doc is
    ``sum over lists of 1/(k_const + rank)`` — docs missing from a
    list simply contribute nothing (the standard union-of-pools form).

    Determinism discipline: each reciprocal term is quantized to
    integer NANO-units (``round(1e9/(k+rank))``) before the sum, so
    the fold is order- and engine-independent for any number of lists
    (the q145/q173 nano-int pattern) — float addition order can never
    flip a tie.  Final ties break on ascending id.

    Scale shape: one union of top-k-bounded pools (each ≤ queries ×
    topk rows — tiny relative to the corpus regardless of corpus
    size), one groupBy on (query_id, id), one per-query window over a
    pool-bounded partition.  Nothing here ever touches the corpus
    again; the expensive work stays in the upstream rankers.

    Returns ``(query_id, rank, <id_col>, rrf_nano, <name>_rank ...)``
    with NULL list-ranks where a doc was absent from that list.
    """
    names = list(ranked)
    parts = [
        df.select(
            "query_id",
            F.col(id_col).alias("_id"),
            F.lit(name).alias("_list"),
            F.col("rank").alias("_rank"),
        )
        for name, df in ranked.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    terms = u.withColumn(
        "_nano",
        F.round(F.lit(1e9) / (F.lit(float(k_const)) + F.col("_rank")))
        .cast("long"),
    )
    fused = terms.groupBy("query_id", "_id").agg(
        F.sum("_nano").alias("rrf_nano"),
        *[
            F.max(
                F.when(F.col("_list") == name, F.col("_rank"))
            ).alias(f"{name}_rank")
            for name in names
        ],
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_nano"), F.asc("_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select(
            "query_id",
            "rank",
            F.col("_id").alias(id_col),
            "rrf_nano",
            *[f"{n}_rank" for n in names],
        )
    )
