"""DSIR-style importance resampling — data selection toward a target domain.

Public method (Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): score every raw document by how
much more likely its hashed n-gram bag is under the TARGET domain's
bucket distribution than under the RAW corpus's own, then resample
toward the target with Gumbel-top-k (top-k over ``log w + Gumbel(u)``
is exactly sampling-without-replacement proportional to ``w``).

Spark shape / the 100 TB story
------------------------------
- **Features** are hashed unigram+bigram buckets built from the same
  oracle-reproducible Horner token hashes MinHash uses
  (pipeline/dedup.poly_token_hash_array): scan-side higher-order
  functions, no UDF, no explode until the distribution pass.
- **Pass 1 (distributions)**: explode the bucket arrays and run ONE
  ``groupBy(bucket)`` whose key space is capped at ``n_buckets`` —
  map-side partial aggregation collapses every partition to ≤B rows
  before the shuffle, so the exchange moves O(B · partitions) rows no
  matter how large the corpus is.  The two count vectors come back to
  the driver bounded at B entries.
- **Pass 2 (score + select)**: the per-bucket log-ratio vector rides
  into the plan as a constant-folded array LITERAL (the PQ-codebook
  pattern, pipeline/pq.py) — no join, no shuffle; the per-document
  weight is a left-fold over the gram array fused into the scan.
  Selection is ``orderBy(desc(score)).limit(k)`` =
  TakeOrderedAndProject: bounded per-partition heaps + driver merge,
  never a global sort.
- **Determinism**: the Gumbel uniform comes from the engine's MINSTD
  row hash (pipeline/sampling.sample_hash), so the selected set is
  reproducible bit-for-bit in any engine that can fold the same grams —
  the DuckDB oracle (q143) replays feature hashing, smoothing,
  log-ratios, and the Gumbel keys end-to-end in SQL.

The log-ratios are quantized to 6 decimals before entering the plan so
that cross-engine ``ln`` (libm vs JVM) last-ulp differences cannot leak
into the fold; both engines then sum the identical doubles in the
identical gram order.

The reference engine has no analogue (its domain is filesystem
metadata); this is part of the LLM-pipeline surface (SURVEY.md §7
step 9), alongside quality gates and mixture/stratified sampling.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.dedup import _POLY_B, _POLY_M, poly_token_hash_array
from dudb_spark.pipeline.sampling import _DENOM, sample_hash


def gram_buckets_from(th: Column, n_buckets: int, bigrams: bool = True) -> Column:
    """Hashed-gram feature buckets (array<long>, values in [0, n_buckets))
    from a BOUND token-hash array attribute.  ``th`` must be its own
    projection (see poly_shingle_hashes_from on why inlining it would
    re-evaluate the tokenization per reference).  Bag semantics: no
    array_distinct — counts are the feature.

    Bigrams pair each hash with its successor via ``zip_with`` over a
    shifted slice — NEVER ``element_at(th, i)`` inside an index lambda:
    when an optimizer rule substitutes the projection (measured:
    InferFiltersFromGenerate pushes a ``size(grams) > 0`` filter below
    the projection that defines ``th``), an indexed lambda re-evaluates
    the whole inlined token-hash array PER POSITION — O(tokens²) per
    document (measured 30× on the sf0.1 corpus).  zip_with binds the
    paired ELEMENTS as lambda variables, so the array expression is
    evaluated once per row no matter what gets inlined."""
    grams = th
    if bigrams:
        nxt = F.slice(th, 2, F.greatest(F.size(th) - 1, F.lit(0)))
        bi = F.filter(
            F.zip_with(
                th,
                nxt,
                lambda x, y: F.when(
                    y.isNotNull(), F.pmod(x * _POLY_B + y, F.lit(_POLY_M))
                ),
            ),
            lambda g: g.isNotNull(),
        )
        grams = F.concat(th, bi)
    return F.transform(grams, lambda g: F.pmod(g, F.lit(n_buckets)))


def bucket_log_ratios(
    df: DataFrame,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 256,
    smoothing: float = 1.0,
    bigrams: bool = True,
) -> list[float]:
    """Per-bucket ``round(log p_target(b) - log p_raw(b), 6)`` with
    add-lambda smoothing.  RAW is every row of ``df``; TARGET is the
    rows matching ``target_pred`` (target ⊆ raw, as in the paper's
    within-corpus selection setup).  One bounded-key aggregation job;
    the result is a B-entry Python list destined for the plan literal."""
    gb = (
        df.select(
            target_pred.alias("_t"),
            poly_token_hash_array(F.col(text_col)).alias("_th"),
        )
        .select("_t", gram_buckets_from(F.col("_th"), n_buckets, bigrams).alias("_gb"))
        .select("_t", F.explode("_gb").alias("bucket"))
    )
    counts = (
        gb.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.count(F.when(F.col("_t"), 1)).alias("t_cnt"),
        )
        .collect()
    )
    r = [0] * n_buckets
    t = [0] * n_buckets
    for row in counts:
        r[row["bucket"]] = row["r_cnt"]
        t[row["bucket"]] = row["t_cnt"]
    tot_r, tot_t = sum(r), sum(t)
    s = smoothing
    return [
        round(
            math.log((t[b] + s) / (tot_t + s * n_buckets))
            - math.log((r[b] + s) / (tot_r + s * n_buckets)),
            6,
        )
        for b in range(n_buckets)
    ]


def dsir_log_weight_from(th: Column, log_ratios: list[float], bigrams: bool = True) -> Column:
    """Per-document importance log-weight: left-fold over the gram
    buckets adding each bucket's log-ratio.  ``log_ratios`` enters as a
    constant-folded array literal, so the whole expression fuses into
    the scan — zero shuffle, zero join."""
    lr = F.array(*[F.lit(float(x)) for x in log_ratios])
    return F.aggregate(
        gram_buckets_from(th, len(log_ratios), bigrams),
        F.lit(0.0),
        lambda acc, g: acc + F.element_at(lr, g.cast("int") + 1),
    )


def gumbel_key(id_col: Column, salt: int = 0) -> Column:
    """Deterministic standard-Gumbel draw per row: ``-ln(-ln(u))`` with
    ``u`` from the engine's MINSTD row hash mapped into (0, 1) — never
    exactly 0 or 1, so both logs are finite."""
    u = (sample_hash(id_col, salt) + F.lit(1.0)) / F.lit(float(_DENOM + 1))
    return -F.log(-F.log(u))


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    k: int,
    n_buckets: int = 256,
    smoothing: float = 1.0,
    salt: int = 0,
    gumbel: bool = True,
    bigrams: bool = True,
) -> DataFrame:
    """Select ``k`` documents from ``df`` by DSIR importance resampling:
    estimate target/raw hashed-gram distributions, weight every row by
    the log-likelihood ratio of its gram bag, and take the Gumbel-top-k
    (``gumbel=False`` degrades to deterministic top-k by weight — the
    paper's "top-k heuristic" baseline).  Returns
    (id, log_weight, score) rounded to 6 decimals, ordered by score."""
    lr = bucket_log_ratios(df, text_col, target_pred, n_buckets, smoothing, bigrams)
    th_df = df.select(
        F.col(id_col), poly_token_hash_array(F.col(text_col)).alias("_th")
    )
    logw = dsir_log_weight_from(F.col("_th"), lr, bigrams)
    score = logw + gumbel_key(F.col(id_col), salt) if gumbel else logw
    return (
        th_df.select(
            F.col(id_col),
            F.round(logw, 6).alias("log_weight"),
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )
