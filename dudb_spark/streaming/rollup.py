"""Streaming event rollups: the Structured-Streaming form of the engine's
windowed aggregations.

The reference has no streaming operators (SURVEY.md §2.9); its closest
analogues are the progress-rate tracker (progress.go:235–316) and the
incremental re-run.  This module is the idiomatic-Spark extension: the same
tumbling-window aggregation the batch path runs (``q15_events_hourly``)
expressed over ``readStream``, with a watermark bounding state for late
data.  The aggregation plan is identical batch vs stream — Catalyst reuses
the partial/final hash-aggregate physical strategy with streaming state
backing — so correctness can be asserted by equality with the batch result
(see tests/test_streaming.py).

At scale: the watermark bounds state store size (one entry per open window ×
event_type), and ``availableNow`` triggers give batch-sized reprocessing
with streaming semantics (the modern replacement for incremental re-runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark, source_dir: str) -> DataFrame:
    """File-source stream over a directory of event parquet/json drops —
    the pattern for continuously-landing event data."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour window × event_type counts and sums.  Works on both
    batch and streaming frames; on a stream the watermark lets Spark expire
    window state once event time passes window_end + watermark."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_hll_registers(
    events: DataFrame,
    hash_expr,
    p: int = 8,
    hash_bits: int = 31,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-hour HyperLogLog register stream: ``(win, reg, rho)`` with
    rho the max rank seen — distinct counting with BOUNDED streaming
    state (≤ 2**p rows per open window, vs one state row per distinct
    value for a streamed COUNT DISTINCT, which Spark refuses on streams
    precisely because that state is unbounded).

    ``max(rho)`` is associative and monotone, so micro-batches merge
    registers exactly like shard unions do in batch
    (pipeline/sketch.hll_registers); apply pipeline/sketch.hll_estimate
    to the sink whenever an estimate is needed.  Works on batch frames
    too (same code path, no watermark)."""
    from dudb_spark.pipeline.sketch import hll_register, hll_rho

    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.select(F.col("ts"), hash_expr.alias("_h"))
        .groupBy(
            F.window("ts", "1 hour").alias("win"),
            hll_register(F.col("_h"), p).alias("reg"),
        )
        .agg(F.max(hll_rho(F.col("_h"), p, hash_bits)).alias("rho"))
    )


def hourly_cms_cells(
    events: DataFrame,
    hash_expr,
    d: int = 4,
    w: int = 64,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-hour count-min cell stream: ``(win, j, bucket, cnt)`` —
    frequency sketching with BOUNDED streaming state (≤ d×w rows per
    open window, vs one state row per distinct key for an exact
    streamed per-key count).  ``sum`` is associative, so micro-batches
    merge cells exactly like batch shard unions
    (pipeline/sketch.cms_cells); estimate with the min-over-rows (or
    mean-min) lookup whenever needed.  Works on batch frames too."""
    from dudb_spark.pipeline.sketch import cms_bucket

    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.select(F.col("ts"), hash_expr.alias("_h"))
        .select(
            "ts",
            F.posexplode(
                F.array(*[cms_bucket(F.col("_h"), j, w) for j in range(d)])
            ).alias("j", "bucket"),
        )
        .groupBy(F.window("ts", "1 hour").alias("win"), "j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hourly_hist_cells(
    events: DataFrame,
    value_expr,
    lo: int,
    hi: int,
    n_bins: int = 64,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-hour histogram cell stream: ``(win, bin, cnt)`` — quantile
    sketching with BOUNDED streaming state (≤ n_bins rows per open
    window, vs the per-value state an exact streamed quantile would
    need — which is why Spark offers no streamed percentile at all).
    The binning is the identical int64 arithmetic as the batch fold
    (pipeline/sketch.hist_cells: ``(v − lo)·n_bins div (hi − lo)``,
    clamped into the edge bins); ``count`` is associative, so
    micro-batches merge cells exactly like batch shard unions — apply
    pipeline/sketch.hist_quantiles to the sink for p50/p95/p99
    whenever needed.  Works on batch frames too."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    # NULL values drop up front — the batch fold's contract
    # (pipeline/sketch.hist_cells: a NULL bin's window ordering
    # diverges across engines)
    proj = events.where(value_expr.isNotNull()).select(
        F.col("ts"),
        ((value_expr.cast("long") - F.lit(lo)) * F.lit(n_bins))
        .alias("_num"),
    )
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.expr(f"_num DIV {hi - lo}").cast("int")),
    )
    return (
        proj.groupBy(F.window("ts", "1 hour").alias("win"),
                     b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def run_rollup_to_memory(
    spark, source_dir: str, query_name: str = "rollup", watermark: str = "2 hours"
):
    """Drive the streaming rollup over all currently-available files
    (availableNow) into an in-memory sink; returns the StreamingQuery."""
    stream = stream_events(spark, source_dir)
    agg = hourly_rollup(stream, watermark)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def sliding_rollup(
    events: DataFrame,
    length: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window rollup (length/slide overlapping windows): each
    event contributes to length/slide windows, so streaming state holds
    that many open windows per (window, type) — still bounded by the
    watermark.  Batch/stream plans stay identical, like hourly_rollup."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            F.window("ts", length, slide).alias("win"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("w_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Built-in JVM-side sessionization (``F.session_window``), the
    codegen-friendly alternative to the custom applyInPandasWithState
    sessionizer (sessions.py): per user, events merge while the gap to
    the previous event is ≤ ``gap`` (boundary-inclusive), and the
    emitted window ends at ``last_event + gap`` — Spark's [start, end)
    session-window contract, restatable as gaps-and-islands SQL.

    Batch and streaming share this one plan; streaming gets the
    watermark (session state is dropped once the watermark passes a
    session's end).  Values aggregate as exact integer cents so the sum
    is partial-aggregation-order-independent."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_cents",
        )
    )
