"""Stream-stream joins: watermarked event-to-event attribution.

The reference has no streaming operators (SURVEY.md §2.9); this is the
idiomatic-Spark extension completing the streaming surface (rollup,
sessionization, dedup, and now joins): attribute each right-side event
(e.g. purchase) to the left-side events (e.g. clicks) of the same user
within an attribution horizon.

Scale/state design: a stream-stream inner join keeps both sides' rows in
the state store until the watermark proves no future match can arrive.
The join condition bounds right_ts to [left_ts, left_ts + horizon], so
with watermarks on BOTH sides Spark derives the eviction horizon for each
side (left rows expire ``horizon`` past the right watermark; right rows
expire at the left watermark) — state is bounded by events-per-horizon,
not by the stream length.  The same plan runs batch when given batch
frames, which is how the oracle restates it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user, left event) ⋈ (user, right event) pairs with
    ``right_ts ∈ [left_ts, left_ts + horizon]``.

    ``left``/``right`` are event frames (streaming or batch) with the
    events schema; each is filtered to one event_type.  Streaming frames
    get watermarks on both sides (required for state eviction on a
    stream-stream inner join).
    """
    l = left.where(F.col("event_type") == left_type).select(
        F.col("user_id"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("left_ts"),
    )
    r = right.where(F.col("event_type") == right_type).select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("right_ts"),
        F.col("value").alias("right_value"),
    )
    if l.isStreaming:
        l = l.withWatermark("left_ts", watermark)
    if r.isStreaming:
        r = r.withWatermark("right_ts", watermark)
    cond = F.expr(
        "user_id = r_user AND right_ts >= left_ts "
        f"AND right_ts <= left_ts + INTERVAL {horizon}"
    )
    return l.join(r, cond, "inner").select(
        "user_id",
        "left_id",
        "right_id",
        "left_ts",
        "right_ts",
        "right_value",
    )
