"""Structured Streaming extensions (beyond reference parity — the reference
is batch-with-incremental-reruns, SURVEY.md §2.9)."""

from dudb_spark.streaming.rollup import hourly_rollup, stream_events  # noqa: F401
