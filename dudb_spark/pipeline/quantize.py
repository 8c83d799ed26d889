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
    """Single-row frame with per-dimension lo/hi arrays.

    posexplode → groupBy(pos) rather than 2·d per-column agg expressions:
    the wide-agg form exceeds ``spark.sql.codegen.maxFields`` (100) at
    d=64, dropping the whole stage to interpreted eval and paying seconds
    of codegen churn per query.  The explode shuffles only d rows per
    partition after map-side partial min/max — negligible at any scale —
    and the final collect_list is over exactly d rows."""
    dims = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("_lo"),
            F.max(F.col("x").cast("double")).alias("_hi"),
        )
    )
    by_pos = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("_lo"), F.col("_hi")))
    )
    return dims.agg(by_pos.alias("_b")).select(
        F.transform(F.col("_b"), lambda s: s["_lo"]).alias("lo"),
        F.transform(F.col("_b"), lambda s: s["_hi"]).alias("hi"),
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
    """Reconstructed vector: lo + code/255·(hi−lo).

    zip_with, NOT an index-walking transform: a single-referenced
    ``codes`` alias gets CollapseProject-inlined into the lambda, and an
    index lambda then rebuilds the whole codes array per element —
    O(d²) per row (measured 6× wall-clock at d=64).  zip_with evaluates
    its array arguments once per row no matter what inlining did."""
    pairs = F.zip_with(
        lo, hi, lambda l, h: F.struct(l.alias("l"), h.alias("h"))
    )
    return F.zip_with(
        codes,
        pairs,
        lambda c, p: p["l"] + c.cast("double") / 255.0 * (p["h"] - p["l"]),
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


def ivf_sq8_topk(
    df: DataFrame,
    cells,
    query_id: int,
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Compressed-index ANN — the FAISS ``IVF,SQ8`` composition: IVF
    cells prune the candidate set, SQ8 codes are what the index stores,
    and ranking runs on RECONSTRUCTED vectors.  At scale this is the
    memory story of a 100 TB vector corpus: postings hold int8 codes
    (4x smaller), raw vectors never load at query time.

    ``cells`` is a ``(assigned, centroids)`` pair from ``ivf.fixed_cells``
    (or base ∪ ``ivf.assign_to_cells`` additions).  Cell probing uses the
    RAW query vector against the centroid list (driver-side, k x dim);
    ranking uses the decoded query, exactly as a stored index would.
    """
    from dudb_spark.pipeline.ivf import probe_cells

    assigned, centroids = cells
    bounds = sq8_bounds(df, vec_col, dim)
    enc = sq8_encode(df, bounds, vec_col, dim).withColumn(
        "dv", sq8_decode(F.col("codes"), F.col("lo"), F.col("hi"), dim)
    )
    qv_raw = df.where(F.col(id_col) == query_id).first()[vec_col]
    probe = probe_cells(centroids, qv_raw, n_probe)
    qv = enc.where(F.col(id_col) == query_id).select(F.col("dv").alias("qv"))
    cand_ids = assigned.where(
        F.col("cell").isin(sorted(probe)) & (F.col(id_col) != query_id)
    ).select(id_col)
    return (
        enc.join(cand_ids, id_col, "left_semi")
        .crossJoin(F.broadcast(qv))
        .select(
            id_col,
            F.round(cosine(F.col("dv"), F.col("qv")), 6).alias("qcosine"),
        )
        .orderBy(F.desc("qcosine"), id_col)
        .limit(k)
    )
