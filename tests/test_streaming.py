"""Streaming rollup = batch rollup equality, driven end-to-end through a
file-source stream with availableNow trigger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.streaming.rollup import hourly_rollup, run_rollup_to_memory


@pytest.fixture()
def events_dir(spark, tmp_path):
    """Re-encode sf0.001 events (nanos → micros) into a stream source dir,
    split into several files to exercise multi-trigger ingestion."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = str(tmp_path / "events_stream")
    ev.repartition(8).write.parquet(out)
    return out


def test_stream_rollup_equals_batch(spark, events_dir):
    batch = hourly_rollup(spark.read.parquet(events_dir))
    want = sorted(
        (r["hour_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    )

    q = run_rollup_to_memory(spark, events_dir, query_name="t_rollup")
    q.awaitTermination(120)
    got = sorted(
        (r["hour_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_rollup").collect()
    )
    assert got == want
    assert len(got) > 100


def test_watermark_present_in_plan(spark, events_dir):
    from dudb_spark.streaming.rollup import stream_events

    stream = stream_events(spark, events_dir)
    agg = hourly_rollup(stream, watermark="3 hours")
    assert agg.isStreaming
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()
