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


def test_stream_dedup_equals_batch_distinct(spark, tmp_path):
    import pyspark.sql.functions as F

    from dudb_spark.streaming.dedup import first_sightings
    from dudb_spark.streaming.rollup import EVENTS_STREAM_SCHEMA

    rows = [
        (i, f"2024-01-0{1 + i % 3} 0{i % 6}:00:00", i % 4,
         ["click", "view"][i % 2], float(i), "{}")
        for i in range(60)
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "dedup_src")
    batch.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(src)
    q = (
        first_sightings(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.user_id, r.event_type, str(r.day))
        for r in spark.table("t_dedup").collect()
    )
    want = sorted(
        (r.user_id, r.event_type, str(r.day))
        for r in batch.select(
            "user_id", "event_type", F.to_date("ts").alias("day")
        ).distinct().collect()
    )
    assert got == want


def test_stream_attribution_equals_batch_join(spark, events_dir):
    from dudb_spark.streaming.joins import attribution_join
    from dudb_spark.streaming.rollup import EVENTS_STREAM_SCHEMA

    batch = spark.read.parquet(events_dir)
    want = sorted(
        (r["user_id"], r["left_id"], r["right_id"])
        for r in attribution_join(batch, batch).collect()
    )
    assert want, "fixture produced no attributable pairs"

    left = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(events_dir)
    right = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(events_dir)
    joined = attribution_join(left, right)
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString().lower()
    assert "watermark" in plan
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_attr")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], r["left_id"], r["right_id"])
        for r in spark.sql("SELECT * FROM t_attr").collect()
    )
    assert got == want
