"""Scalar quantization (SQ8) for embedding columns: 4× memory reduction
for ANN state with bounded cosine error — the int8 code path every
at-scale vector index (FAISS SQ8, Milvus, Lucene scalar quantizer) uses
before IVF/HNSW.

Spark shape: the per-dimension [min, max] bounds are ONE aggregate pass
(2·d agg expressions, partial-combine map-side — no explode, no shuffle
of vector rows) broadcast back as a single row; encode/decode are then
narrow per-row array expressions that fuse into the scan.  Nothing in
the hot path leaves the JVM, and the codes column is array<int> with
values 0..255, dictionary-friendly on Parquet.

Determinism: codes are round(half-up) of an affine map of float32-exact
inputs — an external engine restates the arithmetic bit-for-bit
(q79's DuckDB oracle replays encode → decode → cosine end-to-end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import cosine


def sq8_bounds(df: DataFrame, vec_col: str = "embedding", dim: int = 64):
    """Single-row frame with per-dimension lo/hi arrays (one agg pass)."""
    v = F.col(vec_col)
    aggs = [
        F.min(v[i].cast("double")).alias(f"_lo{i}") for i in range(dim)
    ] + [F.max(v[i].cast("double")).alias(f"_hi{i}") for i in range(dim)]
    return df.agg(*aggs).select(
        F.array(*[F.col(f"_lo{i}") for i in range(dim)]).alias("lo"),
        F.array(*[F.col(f"_hi{i}") for i in range(dim)]).alias("hi"),
    )


def _code(v: Column, lo: Column, hi: Column) -> Column:
    """255·(x−lo)/(hi−lo), rounded half-up; constant dims code to 0."""
    scaled = F.coalesce(
        (v - lo) / F.nullif(hi - lo, F.lit(0.0)), F.lit(0.0)
    )
    return F.round(scaled * 255.0, 0).cast("int")


def sq8_encode(
    df: DataFrame,
    bounds: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Add a ``codes`` array<int> column (bounds broadcast, scan-fused)."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    codes = F.transform(
        idx,
        lambda i: _code(
            F.col(vec_col)[i].cast("double"), F.col("lo")[i], F.col("hi")[i]
        ),
    )
    return df.crossJoin(F.broadcast(bounds)).withColumn("codes", codes)


def sq8_decode(codes: Column, lo: Column, hi: Column, dim: int) -> Column:
    """Reconstructed vector: lo + code/255·(hi−lo)."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return F.transform(
        idx,
        lambda i: lo[i]
        + codes[i].cast("double") / 255.0 * (hi[i] - lo[i]),
    )


def sq8_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Top-k neighbours of ``query_id`` by cosine over RECONSTRUCTED
    vectors — certifies the quantized distance path end-to-end.  The
    query vector goes through the same encode/decode as the corpus (as a
    stored index would)."""
    bounds = sq8_bounds(df, vec_col, dim)
    enc = sq8_encode(df, bounds, vec_col, dim).withColumn(
        "dv", sq8_decode(F.col("codes"), F.col("lo"), F.col("hi"), dim)
    )
    qv = enc.where(F.col(id_col) == query_id).select(
        F.col("dv").alias("qv")
    )
    return (
        enc.where(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(qv))
        .select(
            id_col,
            F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("qcosine"),
        )
        .orderBy(F.desc("qcosine"), id_col)
        .limit(k)
    )
