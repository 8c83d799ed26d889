"""Streaming deduplication: emit each key once, with watermark-bounded
state.

Batch dedup (`SELECT DISTINCT` / exact_duplicates) answers "which keys
exist"; the streaming form answers it **continuously** while keeping
per-key state finite: a watermark on event time lets Spark evict state
for keys whose whole arrival window has passed, so an unbounded stream
doesn't accumulate unbounded dedup state.  This is the streaming analog
of the ingest pipeline's change detection — e.g. "first sighting of each
(user, event_type, day)" for incremental corpus accounting.

Semantics notes (why the operator projects the key columns only):
- ``dropDuplicates`` keeps the FIRST-arriving row per key, and arrival
  order is not deterministic under distribution — but the key set itself
  is.  Emitting only key columns makes streaming output equal batch
  ``SELECT DISTINCT`` row-for-row, which is what the oracle checks.
- callers needing non-key payload should aggregate it downstream
  (`groupBy(keys).agg(...)`) where semantics are order-free.

At 100 TB/day the state store is the bottleneck: the watermark horizon
bounds it to (keys arriving per horizon) entries, and dedup state is
hash-partitioned by key across executors like any keyed state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Distinct key tuples from a stream, first sighting per key per
    watermark horizon.

    ``dropDuplicatesWithinWatermark``, NOT ``dropDuplicates``: plain
    dropDuplicates only evicts state when the event-time column is part
    of the key subset — with pure logical keys its state grows without
    bound on a real stream, watermark or no watermark.  The WithinWatermark
    variant expires each key's state ``watermark`` past its first
    sighting's event time, so state is bounded by keys-per-horizon at the
    cost of re-emitting a key that reappears after the horizon.  Callers
    wanting exactly-once-per-key-ever must put a time bucket in the key
    (as first_sightings does with ``day``) and size the watermark to cover
    the bucket."""
    return (
        stream.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )


def first_sightings(
    stream: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """First (user_id, event_type, day) sightings over an events stream —
    the streaming incremental-accounting query q50 runs."""
    with_day = stream.withColumn("day", F.to_date("ts"))
    return dedup_stream(
        with_day, ["user_id", "event_type", "day"], watermark=watermark
    )


def dedup_against_corpus(
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Online ingest dedup: tag each arriving document against a STATIC
    corpus fingerprint index — ``is_new`` plus the canonical id it
    duplicates (null when genuinely new).

    This is the stream–static join form of exact dedup: the corpus side
    is a batch frame reduced to one row per content fingerprint
    (min-id canonical, same rule as pipeline/dedup.exact_duplicates);
    the stream side computes its fingerprint scan-side and LEFT OUTER
    joins it (stream-static left-anti is not a supported join type —
    the null-probe filter expresses it).  No watermark is required:
    stream–static enrichment joins are stateless, each micro-batch
    probes the index and emits immediately.

    Scale: Spark re-plans the static side per micro-batch, so the index
    may broadcast (small corpus) or shuffle-hash per batch (big corpus);
    for a 100 TB corpus pre-bucket the index table by ``fp`` so the
    per-batch probe co-locates instead of reshuffling the stream.  New
    fingerprints accepted by this filter should be folded into the index
    table between batches (foreachBatch append) — within a batch,
    same-fingerprint arrivals all pass, exactly like the batch dedup's
    per-snapshot semantics.
    """
    from dudb_spark.pipeline.text import fingerprint

    index = (
        corpus.select(
            fingerprint(F.col(text_col)).alias("fp"),
            F.col(id_col).cast("long").alias("canonical_id"),
        )
        .groupBy("fp")
        .agg(F.min("canonical_id").alias("canonical_id"))
    )
    return (
        stream.withColumn("fp", fingerprint(F.col(text_col)))
        .join(index, "fp", "left_outer")
        .select(
            F.col(id_col),
            F.col("canonical_id"),
            F.col("canonical_id").isNull().alias("is_new"),
        )
    )


def online_dedup(
    stream: DataFrame,
    corpus: DataFrame,
    index_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Online dedup with a GROWING index: each micro-batch is tagged
    against corpus fingerprints ∪ every fingerprint accepted in EARLIER
    batches, and the batch's newly-accepted fingerprints are folded into
    the index before the next batch — so a duplicate arriving later in
    the same stream IS caught (the gap :func:`dedup_against_corpus`'s
    static index leaves open).

    Mechanics: ``foreachBatch`` seeds ``index_dir`` with the corpus
    min-id fingerprint table, then per batch (1) re-reads the index —
    the read must be inside the batch function so appended files are
    visible, (2) left-joins the batch, appending the tagged rows to
    ``out_dir``, (3) appends the batch's unseen fingerprints (min id per
    fp within the batch) to ``index_dir``.  Duplicates WITHIN one batch
    all pass — same semantics as a snapshot-grained batch dedup; the
    canonical recorded for later batches is the min id of the first
    batch that carried the fingerprint.

    Scale: the index is an append-only parquet table keyed by fp —
    at 100 TB swap the per-batch full re-read for a Delta/Iceberg MERGE
    or a bucketed table so the probe co-locates; the foreachBatch seam
    is exactly where that engine plugs in.  Delivery: ``foreachBatch``
    with plain parquet appends is at-least-once — a batch retried after
    a partial write can duplicate output rows (never lose them); the
    production swap above (MERGE keyed by doc id / fp) makes both
    writes idempotent.  Returns the started StreamingQuery (caller
    awaits termination and reads ``out_dir``).
    """
    from dudb_spark.pipeline.text import fingerprint

    spark = corpus.sparkSession
    (
        corpus.select(
            fingerprint(F.col(text_col)).alias("fp"),
            F.col(id_col).cast("long").alias("canonical_id"),
        )
        .groupBy("fp")
        .agg(F.min("canonical_id").alias("canonical_id"))
        .write.mode("overwrite")
        .parquet(index_dir)
    )

    def _batch(bdf: DataFrame, epoch_id: int) -> None:
        idx = spark.read.parquet(index_dir)
        tagged = (
            bdf.withColumn("fp", fingerprint(F.col(text_col)))
            .join(idx, "fp", "left_outer")
            .select(
                F.col(id_col).cast("long").alias(id_col),
                "fp",
                "canonical_id",
                F.col("canonical_id").isNull().alias("is_new"),
            )
            .localCheckpoint()
        )
        tagged.select(id_col, "canonical_id", "is_new").write.mode(
            "append"
        ).parquet(out_dir)
        (
            tagged.where(F.col("is_new"))
            .groupBy("fp")
            .agg(F.min(id_col).alias("canonical_id"))
            .write.mode("append")
            .parquet(index_dir)
        )

    return (
        stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", out_dir + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )


def neardup_against_index(
    stream_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
    min_est: float = 0.5,
) -> DataFrame:
    """NEAR-dup flagging of a document stream against the persisted
    MinHash band index of an already-ingested corpus
    (pipeline/dedup.minhash_band_index) — the streaming form of
    incremental_verified_pairs' candidate stage, and the near-dup
    sibling of :func:`dedup_against_corpus` (which only catches exact
    fingerprints).  The continuous-crawl front door: every arriving
    doc is checked against history's index the moment it lands.

    Entirely STATELESS: the signature is the per-row HOF form
    (pipeline/dedup.minhash_signature — the batch aggregate form needs
    a groupBy a stream cannot run without state; same coefficients,
    same modulus, value-identical sigs), banding is a scan-side
    explode, and the index lookup is a stream–static equi-join on
    (band, bucket).  Emits one row per COLLIDING BAND —
    ``(new_id, old_id, band, est_jaccard)`` with est ≥ min_est — a
    streaming dropDuplicates over pairs would hold unbounded state, so
    pair-level dedup belongs at the sink (est is identical across a
    pair's bands, so the dedup is trivial).  The boilerplate-bucket
    cap applies to the HISTORY side, exactly as the batch operator."""
    from dudb_spark.pipeline.dedup import (
        _POLY_B,
        _POLY_M,
        minhash_signature,
        poly_shingle_hashes_from,
        poly_token_hash_array,
    )

    assert num_perm % bands == 0
    r = num_perm // bands

    def band_bucket(b):
        return F.aggregate(
            F.slice(F.col("sig"), b * r + 1, r),
            F.lit(0).cast("long"),
            lambda acc, v: F.pmod(acc * _POLY_B + v, F.lit(_POLY_M)),
        )

    # STAGED projections, one per hop — each alias is multiply
    # referenced downstream, which is exactly what keeps
    # CollapseProject from inlining it (shingle_hashes' documented
    # boundary rule): flattening these into one expression re-evaluates
    # tokenization inside every permutation lambda — measured 39 s →
    # 13 s on the q171 gate staging
    banded = (
        stream_docs.select(
            F.col(id_col).alias("new_id"),
            poly_token_hash_array(F.col(text_col)).alias("_th"),
        )
        .select(
            "new_id",
            poly_shingle_hashes_from(F.col("_th"), shingle_k)
            .alias("_base"),
        )
        .select(
            "new_id",
            minhash_signature(F.col("_base"), num_perm, seed,
                              mod=_POLY_M).alias("sig"),
        )
        .select(
            "new_id", "sig",
            F.explode(
                F.array(*[
                    F.struct(F.lit(b).alias("band"),
                             band_bucket(b).alias("bucket"))
                    for b in range(bands)
                ])
            ).alias("bb"),
        )
        .select("new_id", "sig",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"))
    )
    sizes = index.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    idx = index.join(
        sizes.where(F.col("_n") <= max_bucket), ["band", "bucket"]
    ).select(
        "band", "bucket",
        F.col("id").alias("old_id"), F.col("sig").alias("sig_b"),
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig"), F.col("sig_b"),
                           lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(num_perm))
    )
    return (
        banded.join(idx, ["band", "bucket"])
        .where(F.col("new_id") != F.col("old_id"))
        .select(
            "new_id", "old_id", "band",
            F.round(est, 6).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= min_est)
    )
