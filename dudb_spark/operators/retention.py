"""Cohort retention analysis over an event stream (LLM/product-analytics
extension; no reference counterpart — the standard warehouse cohort query
re-expressed Spark-first).

Scale shape: ONE shuffle keyed on the user id computes each user's cohort
(min event week) as a window-free aggregate, the events re-join that
per-user frame on the same key (co-partitioned by AQE; at warehouse scale
both sides would be bucketed on user_id so the join is shuffle-free), and
the final (cohort, offset) aggregate is a countDistinct over the already
user-keyed frame.  No window functions, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week; for
    each (cohort_week, week_offset) the distinct active users and the
    retention rate vs the cohort's size at offset 0.

    Weeks are epoch-aligned 7-day buckets (floor(epoch_days/7)), not ISO
    weeks, so the bucketing is a pure integer expression on both engines.
    """
    week = (F.datediff(F.col(ts_col).cast("date"), F.lit("1970-01-01")) / 7
            ).cast("long")
    ev = events.select(F.col(user_col).alias("user_id"), week.alias("week"))
    first_seen = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = (
        ev.join(first_seen, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week"))
                 .alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    cohort_size = (
        first_seen.groupBy("cohort_week")
        .agg(F.countDistinct("user_id").alias("n_cohort"))
    )
    return (
        active.join(cohort_size, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            F.round(F.col("n_active") / F.col("n_cohort").cast("double"), 6)
            .alias("retention"),
        )
    )


def decayed_activity(
    events: DataFrame,
    tau_seconds: float = 86400.0,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Exponentially time-decayed activity score per id:
    ``score = sum(exp(-(t_ref - t_i) / tau))`` with ``t_ref`` the global
    max event time — the standard recency-weighted engagement feature
    (a training-data curation signal for freshness-weighted sampling).

    One scan + one grouped aggregation; the reference time is a
    broadcast scalar, not a driver round-trip.  Deltas are computed in
    integer microseconds before the division so engines agree on the
    exponent exactly.
    """
    tref = events.groupBy().agg(F.max(ts_col).alias("_tmax"))
    return (
        events.crossJoin(F.broadcast(tref))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(
                    F.exp(
                        -(
                            (
                                F.unix_micros(
                                    F.col("_tmax").cast("timestamp")
                                )
                                - F.unix_micros(
                                    F.col(ts_col).cast("timestamp")
                                )
                            ).cast("double")
                            / F.lit(tau_seconds * 1_000_000.0)
                        )
                    )
                ),
                6,
            ).alias("decayed_score"),
        )
    )


def rolling_active_users(
    df: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU / trailing-WAU / stickiness per day — the product-health
    metric family: for every day WITH activity, the distinct keys
    that day (dau), the distinct keys over the trailing
    ``window_days`` (wau), and dau/wau (stickiness).

    Scale shape: NO range join and NO per-day rescan — each distinct
    (day, key) pair explodes to the ≤``window_days`` future days it
    contributes to (a bounded constant fan-out, the sliding-window
    idiom q121's chunker uses), then ONE distinct + ONE count
    aggregation keyed by day.  Days without their own activity are
    not reported (dau = 0 rows carry no product signal; documented).
    Counts are exact integers; stickiness is formed in double in the
    same op order both engines and rounded to 9."""
    # the raw-column null filter is PUSHABLE (the inferred
    # isnotnull(cast(ts as date)) join-key constraint is not)
    du = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.to_date(ts_col).alias("_d"), F.col(key_col).alias("_k"))
        .distinct()
    )
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("_d"),
                F.date_add(F.col("_d"), window_days - 1),
            )
        ).alias("day"),
        "_k",
    ).distinct()
    wau = contrib.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    dau = du.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).alias("dau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau"), 9
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def activation_latency(
    df: DataFrame,
    from_label: str,
    to_label: str,
    key_col: str = "user_id",
    label_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Activation latency: per key, the seconds from its FIRST
    ``from_label`` event to its first ``to_label`` event AT OR AFTER
    it — "signup → first purchase", the funnel metric q42 counts but
    doesn't time.  Keys that never convert are kept with NULL
    latency (the denominator matters: dropping them silently inflates
    conversion speed).

    Exactness: timestamps reduce to integer epoch MICROSECONDS
    (``unix_micros`` — whole-second reductions silently floor
    sub-second ordering), mins are selections, the delta an integer
    subtraction and the seconds column an integer floor-division —
    nothing floating anywhere.  Scale shape: two label-filtered
    min-aggregations keyed by user + the conditional second pass for
    "first B at/after A" — a min over a filtered integer column, one
    more keyed agg on the same shuffle key; no windows, no as-of
    join needed for the first-touch case.

    Returns (key, t_from_us, t_to_us, latency_s) — epoch micros,
    NULLs where the key never converted."""
    # NTZ-safe: the parquet gate delivers TIMESTAMP_NTZ, which
    # unix_micros refuses (decayed_activity's same cast)
    ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lbl = F.col(label_col)
    base = df.select(
        F.col(key_col).alias("key"),
        lbl.alias("_l"),
        ep.alias("_t"),
    )
    first_a = base.where(F.col("_l") == from_label).groupBy("key").agg(
        F.min("_t").alias("t_from_us")
    )
    bs = base.where(F.col("_l") == to_label).select(
        "key", F.col("_t").alias("_tb")
    )
    first_b_after = (
        bs.join(first_a, "key")
        .where(F.col("_tb") >= F.col("t_from_us"))
        .groupBy("key")
        .agg(F.min("_tb").alias("t_to_us"))
    )
    return (
        first_a.join(first_b_after, "key", "left")
        .select(
            "key",
            "t_from_us",
            "t_to_us",
            F.expr("(t_to_us - t_from_us) div 1000000").alias(
                "latency_s"
            ),
        )
        .orderBy("key")
    )
