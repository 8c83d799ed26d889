"""Stateful session-window operator vs the batch lag/cumsum oracle.

The emit rule is watermark-exact (sessions.py): a session is emitted iff
``session_end + gap < final watermark``, closed either by a successor
event or by event-time timeout.  Equality with the batch restatement must
therefore hold under BOTH single-batch and per-file micro-batch arrival —
the round-2 verdict's robustness hole was that emissions depended on all
of a user's events landing in one batch.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from dudb_spark.streaming.sessions import sessionize, sessionize_batch_oracle


@pytest.fixture()
def events_df(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return ev


def _collect_sessions(spark, src, name, max_files=None, gap="30 minutes"):
    from dudb_spark.streaming.rollup import EVENTS_STREAM_SCHEMA

    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    q = (
        sessionize(reader.parquet(src), gap=gap)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]):
            round(r["sum_value"], 6)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def _oracle(events):
    return {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]):
            round(r["sum_value"], 6)
        for r in sessionize_batch_oracle(events, gap="30 minutes").collect()
    }


def test_stateful_sessions_match_batch_oracle(spark, events_df, tmp_path):
    src = str(tmp_path / "ev")
    events_df.coalesce(1).write.parquet(src)
    got = _collect_sessions(spark, src, "t_sessions_1b")
    want = _oracle(spark.read.parquet(src))
    assert len(want) > 50  # the fixture has plenty of closed sessions
    assert got == want


def test_stateful_sessions_multibatch(spark, events_df, tmp_path):
    """Per-file micro-batches (maxFilesPerTrigger=1): files are written
    range-partitioned by ts and stamped with increasing mtimes so the
    file source replays them in event-time order — the same shape as a
    live ingest.  Emissions must still equal the batch restatement,
    including sessions closed purely by event-time timeout."""
    src = str(tmp_path / "ev")
    events_df.repartitionByRange(8, "ts").write.parquet(src)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    assert len(parts) == 8
    for k, p in enumerate(parts):
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))

    got = _collect_sessions(spark, src, "t_sessions_mb", max_files=1)
    want = _oracle(spark.read.parquet(src))
    assert len(want) > 50
    assert got == want


def test_timeout_closes_idle_user(spark, tmp_path):
    """A user with no successor event still gets their session emitted
    once the watermark (driven by OTHER keys' events) passes end + gap."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: two events, then silence forever
        (1, base, 10.0), (1, base + 5 * m, 5.0),
        # user 2: keeps the stream alive far past user 1's close point
        (2, base, 1.0), (2, base + 120 * m, 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    src = str(tmp_path / "idle")
    # two time-ordered files so the watermark advances between batches
    df.where(F.col("ts") <= base + 10 * m).coalesce(1).write.parquet(src)
    late = df.where(F.col("ts") > base + 10 * m).coalesce(1)
    late.write.mode("append").parquet(src)
    parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    for k, p in enumerate(parts):
        os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))

    got = _collect_sessions(spark, src, "t_sessions_idle", max_files=1)
    # user 1's session (closed by timeout, not by an event) is emitted
    assert (1, base, base + 5 * m, 2) in got
    assert got[(1, base, base + 5 * m, 2)] == 15.0
    # user 2's first session emits too; the trailing one stays open
    assert (2, base, base, 1) in got
    assert (2, base + 120 * m, base + 120 * m, 1) not in got


def test_sessions_fuzz_random_streams(spark, tmp_path):
    """Randomized event streams through per-file micro-batches: the
    vectorized kernel's prefix-merge / lone-prefix / compaction branches
    all fire across random gap patterns, and every seed must equal the
    batch restatement exactly."""
    import datetime as dt
    import random

    from dudb_spark.streaming.sessions import sessionize_batch_oracle

    for seed in (3, 17, 88):
        rng = random.Random(seed)
        base = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(8):
            t = base + dt.timedelta(minutes=rng.randint(0, 60))
            for _ in range(rng.randint(5, 40)):
                # steps straddle the 5-minute gap so sessions split and
                # span micro-batch boundaries
                t += dt.timedelta(
                    seconds=rng.choice([10, 60, 200, 301, 400, 900])
                )
                rows.append((u, t, float(rng.randint(1, 100))))
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        src = str(tmp_path / f"fz{seed}")
        df.repartitionByRange(3, "ts").write.parquet(src)
        parts = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
        for k, p in enumerate(parts):
            os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))

        got = _collect_sessions(
            spark, src, f"t_fz{seed}", max_files=1, gap="5 minutes"
        )
        want = {
            (r["user_id"], r["session_start"], r["session_end"],
             r["n_events"]): round(r["sum_value"], 6)
            for r in sessionize_batch_oracle(
                spark.read.parquet(src), gap="5 minutes"
            ).collect()
        }
        assert got == want, f"seed {seed}"
        assert len(want) > 10, f"seed {seed} produced a trivial stream"


def test_builtin_session_window_agrees_with_custom(spark, events_df):
    """F.session_window sessionization must produce the SAME session
    boundaries as the lag/cumsum restatement (and hence the custom
    stateful sessionizer): identical (user, start, n_events); the only
    contract difference is end = last_event + gap."""
    from pyspark.sql import functions as F

    from dudb_spark.streaming.rollup import session_window_rollup
    from dudb_spark.streaming.sessions import sessionize_batch_oracle

    built = {
        (r["user_id"], r["session_start"], r["n_events"]): r["session_end"]
        for r in session_window_rollup(events_df, "30 minutes").collect()
    }
    custom = {
        (r["user_id"], r["session_start"], r["n_events"]): r["session_end"]
        for r in sessionize_batch_oracle(
            events_df, "30 minutes", delay="-100 years"
        ).collect()
    }
    assert set(built) == set(custom)
    for key, end in built.items():
        assert end == custom[key] + __import__("datetime").timedelta(
            minutes=30
        )
