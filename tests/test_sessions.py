"""Stateful session-window operator vs the batch lag/cumsum oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.streaming.sessions import sessionize, sessionize_batch_oracle


@pytest.fixture()
def events_src(spark, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    out = str(tmp_path / "ev")
    # single file → one micro-batch, so per-user arrival is complete and
    # sessionization emissions are deterministic (see sessions.py docstring)
    ev.coalesce(1).write.parquet(out)
    return out


def test_stateful_sessions_match_batch_oracle(spark, events_src):
    from dudb_spark.streaming.rollup import EVENTS_STREAM_SCHEMA

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(events_src)
    q = (
        sessionize(stream, gap="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]):
            round(r["sum_value"], 6)
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }

    batch = spark.read.parquet(events_src)
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]):
            round(r["sum_value"], 6)
        for r in sessionize_batch_oracle(batch, gap="30 minutes").collect()
    }
    assert len(want) > 50  # the fixture has plenty of closed sessions
    assert got == want
