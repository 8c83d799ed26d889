"""Bucketized interval join: points × intervals without a nested loop.

``point.ts BETWEEN interval.lo AND interval.hi`` has no equi key, so
Spark's only native plans are BroadcastNestedLoopJoin (fine only when
one side is tiny) or a cartesian product (never fine).  The scalable
rewrite is **bucketing** (the same trick behind interval trees and
Spark's own range-join hints elsewhere):

1. pick a bucket width ``w`` (≈ typical interval length);
2. each point maps to ONE bucket: ``floor(ts / w)``;
3. each interval explodes to the buckets it covers —
   ``sequence(floor(lo/w), floor(hi/w))`` — a scan-side generate whose
   fan-out is interval_len/w (≈ a few rows);
4. equi-join on the bucket id, then re-check the exact predicate as a
   residual filter.

The join is now a plain shuffled hash join keyed by bucket; cost scales
with genuine overlap density, not |points| × |intervals|.  Skewed
buckets (rush hour) are ordinary join skew — AQE's skew-join splitting
applies.  Each (point, interval) pair meets in exactly one bucket (the
point's), so no post-join dedup is needed.

Picking ``w``: too small explodes long intervals into many bucket rows;
too large piles unrelated points into each bucket and shifts work to
the residual filter.  ``w ≈ median interval length`` keeps the fan-out
O(1) per interval while keeping buckets selective — compute it from a
sample/agg upstream if unknown.

The reference's only range predicate is the key-prefix scan bound
(badgerdb.go:307–317) and the log time-range scan (badgerdb.go:274–305)
— both single-table filters; a two-table range JOIN is a scale
extension (SURVEY.md §2.4 notes the reference has no general joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    lo: str = "lo",
    hi: str = "hi",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner join of each point to every interval containing it
    (``lo <= ts <= hi``).  Returns points columns + intervals columns.
    ``bucket_s`` is the bucketing granularity in seconds."""
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        # duplicate output names make every downstream reference ambiguous
        raise ValueError(
            f"interval_join: column names {sorted(shared)} exist on both "
            "sides; rename one side before joining"
        )
    wsec = F.lit(int(bucket_s)).cast("long")
    # floor-divide epoch seconds; unix_timestamp is negative pre-1970 and
    # integer division truncates toward zero, so use floor() explicitly
    p = points.withColumn(
        "_bucket",
        F.floor(F.unix_timestamp(F.col(ts)) / wsec).cast("long"),
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / wsec).cast("long"),
                F.floor(F.unix_timestamp(F.col(hi)) / wsec).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "_bucket")
        .where((F.col(ts) >= F.col(lo)) & (F.col(ts) <= F.col(hi)))
        .drop("_bucket")
    )
