"""Corpus drift monitoring: per-group divergence of hashed-gram
distributions from a reference.

A production training-data pipeline watches WHAT is flowing, not just
how much: a crawl source whose vocabulary distribution drifts (spam
bursts, language flips, template floods) should surface before it
lands in a mixture.  This operator computes, per group (source, day,
shard...), the KL divergence and total-variation distance between the
group's hashed unigram+bigram bucket distribution and the whole
corpus's — the same feature space DSIR selects with (pipeline/dsir.py),
so a drifted source is literally "a source DSIR would re-weight".

Spark shape / the 100 TB story
------------------------------
- ONE corpus-sized pass: explode gram buckets, ``groupBy(group,
  bucket)`` — the key space is |groups| × n_buckets, so map-side
  partial aggregation collapses every partition before the shuffle.
  Everything downstream operates on that bounded frame (≤ G·B rows):
  the reference distribution (B rows) and group totals (G rows) come
  back as broadcast joins, and the smoothing grid is a tiny
  groups×buckets cross of two bounded frames.
- A second column-pruned pass counts rows per group (the gram pass
  can't see documents whose text yields zero grams).
- **Order-free float determinism**: each KL/TV term is quantized to
  integer NANO-units before the final sum (the q90 micro-unit
  pattern) — summing longs is exact and commutative, so the result is
  identical under any partitioning and any engine; cross-engine libm
  ``ln`` last-ulp differences are absorbed by the nano rounding.

The reference engine has no analogue; this extends the LLM-pipeline
monitoring surface (SURVEY.md §7 step 9) next to the dataset card
(q90) and the table profiler (q132).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.dedup import poly_token_hash_array
from dudb_spark.pipeline.dsir import gram_buckets_from

_NANO = 1_000_000_000


def _nano(x: Column) -> Column:
    return F.round(x * _NANO, 0).cast("long")


def corpus_drift(
    df: DataFrame,
    text_col: str,
    group_col: str,
    n_buckets: int = 256,
    smoothing: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """Per-group drift vs the whole-corpus reference distribution:
    (group, n_docs, n_grams, kl, tvd), KL in nats, both rounded to 6
    decimals.  Smoothed with add-λ on BOTH sides over the full bucket
    grid, so zero-count buckets contribute their exact smoothed term
    and KL is always finite."""
    s = float(smoothing)
    sb = s * n_buckets

    gb = (
        df.select(
            F.col(group_col).alias("grp"),
            poly_token_hash_array(F.col(text_col)).alias("_th"),
        )
        .select(
            "grp", gram_buckets_from(F.col("_th"), n_buckets, bigrams).alias("_gb")
        )
        .select("grp", F.explode("_gb").alias("bucket"))
    )
    counts = gb.groupBy("grp", "bucket").agg(F.count(F.lit(1)).alias("c"))

    g_tot = counts.groupBy("grp").agg(F.sum("c").alias("gt"))
    ref = counts.groupBy("bucket").agg(F.sum("c").alias("rc"))
    tot = ref.agg(F.sum("rc").alias("rt"))

    buckets = (
        df.sparkSession.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    )
    grid = g_tot.crossJoin(F.broadcast(buckets))
    full = (
        grid.join(counts, ["grp", "bucket"], "left")
        .join(F.broadcast(ref), "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "gt",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(s))
                / (F.col("gt") + F.lit(sb))
            ).alias("pg"),
            (
                (F.coalesce(F.col("rc"), F.lit(0)) + F.lit(s))
                / (F.col("rt") + F.lit(sb))
            ).alias("pr"),
        )
    )
    terms = full.select(
        "grp",
        "gt",
        _nano(F.col("pg") * F.log(F.col("pg") / F.col("pr"))).alias("kl_n"),
        _nano(F.abs(F.col("pg") - F.col("pr"))).alias("tv_n"),
    )
    drift = terms.groupBy("grp", "gt").agg(
        F.round(F.sum("kl_n") / F.lit(float(_NANO)), 6).alias("kl"),
        F.round(F.sum("tv_n") / F.lit(2.0 * _NANO), 6).alias("tvd"),
    )
    n_docs = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        n_docs.join(drift, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            F.coalesce("gt", F.lit(0)).alias("n_grams"),
            F.coalesce("kl", F.lit(0.0)).alias("kl"),
            F.coalesce("tvd", F.lit(0.0)).alias("tvd"),
        )
    )
