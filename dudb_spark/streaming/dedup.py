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
