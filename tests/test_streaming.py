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


def test_stream_static_dedup_matches_batch(spark, tmp_path):
    from pyspark.sql import types as T

    from dudb_spark.streaming.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(1, "hello world"), (2, "other text"), (3, "Hello   WORLD ")],
        ["doc_id", "text"],
    )
    incoming_rows = [
        (10, "hello world"),        # dup of canonical 1
        (11, "brand new content"),  # new
        (12, "other text"),         # dup of 2
        (13, "BRAND new content"),  # same fp as 11, but 11 is not in the
                                    # CORPUS index -> still tagged new
    ]
    incoming = spark.createDataFrame(incoming_rows, ["doc_id", "text"])
    src = str(tmp_path / "inc")
    incoming.repartition(2).write.parquet(src)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(src)
    out = dedup_against_corpus(stream, corpus)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_ssdedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_new"])
        for r in spark.sql("SELECT * FROM t_ssdedup").collect()
    }
    # index is checked against the CORPUS only; within-batch dups all pass
    assert got == {
        10: (1, False),
        11: (None, True),
        12: (2, False),
        13: (None, True),
    }
    # batch restatement equality (the oracle's shape)
    batch = {
        r["doc_id"]: (r["canonical_id"], r["is_new"])
        for r in dedup_against_corpus(incoming, corpus).collect()
    }
    assert batch == got


def test_online_dedup_grows_index_across_batches(spark, tmp_path):
    import os

    from pyspark.sql import types as T

    from dudb_spark.streaming.dedup import online_dedup

    corpus = spark.createDataFrame(
        [(1, "corpus text one"), (2, "corpus text two")], ["doc_id", "text"]
    )
    # batch 0: one new doc + a corpus dup; batch 1: a dup OF BATCH 0's doc
    b0 = spark.createDataFrame(
        [(10, "fresh content"), (11, "corpus text one")], ["doc_id", "text"]
    )
    b1 = spark.createDataFrame(
        [(20, "fresh content"), (21, "another new one")], ["doc_id", "text"]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for k, bdf in enumerate([b0, b1]):
        tmp = str(tmp_path / f"w{k}")
        bdf.coalesce(1).write.parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dst = os.path.join(src, f"b{k}.parquet")
        os.rename(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = online_dedup(
        stream, corpus, str(tmp_path / "idx"), str(tmp_path / "out")
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_new"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert got == {
        10: (None, True),   # new in batch 0
        11: (1, False),     # corpus dup
        20: (10, False),    # caught by the GROWN index (batch 0's doc 10)
        21: (None, True),   # new in batch 1
    }


def test_fswatch_change_stream(spark, tmp_path):
    """fswatch (sources/fsds.FsWatchReader): batch 0 resyncs the whole
    tree as 'added'; live mutations surface as added/changed/deleted
    rows in later batches with the last-known stat on deletions."""
    import os
    import time

    from dudb_spark.sources.fsds import register_watch

    root = str(tmp_path / "tree")
    os.makedirs(f"{root}/a")
    with open(f"{root}/a/x.txt", "w") as f:
        f.write("hello")
    with open(f"{root}/y.log", "w") as f:
        f.write("123")

    register_watch(spark)
    q = (
        spark.readStream.format("fswatch").load(root)
        .writeStream.format("memory").queryName("fswatch_t")
        .trigger(processingTime="1 second").start()
    )
    try:
        def wait_rows(pred, timeout=60):
            t0 = time.time()
            rows = []
            while time.time() - t0 < timeout:
                rows = spark.sql(
                    "SELECT op, path, size, gen FROM fswatch_t"
                ).collect()
                if pred(rows):
                    return rows
                time.sleep(0.5)
            raise TimeoutError(rows)

        rows = wait_rows(lambda r: len(r) >= 3)
        resync = {(r.op, r.path.replace(root, "")) for r in rows}
        assert resync == {
            ("added", "/a"), ("added", "/a/x.txt"), ("added", "/y.log")
        }
        assert all(r.gen == 0 for r in rows)

        time.sleep(1.1)  # mtime granularity
        with open(f"{root}/a/x.txt", "w") as f:
            f.write("hello world!")          # changed (size+mtime)
        with open(f"{root}/new.bin", "w") as f:
            f.write("zz")                     # added
        os.unlink(f"{root}/y.log")            # deleted

        rows = wait_rows(lambda r: len(r) >= 6)
        diff = {
            (r.op, r.path.replace(root, ""), r.size)
            for r in rows if r.gen > 0
        }
        assert diff == {
            ("changed", "/a/x.txt", 12),
            ("added", "/new.bin", 2),
            ("deleted", "/y.log", 3),  # last-known stat rides the delete
        }
        # no-change walks hold the offset instead of emitting empty
        # batches, so the diff generations stay dense from 1 (a walk
        # interleaving the three mutations may legitimately split them
        # over two consecutive batches)
        gens = sorted({r.gen for r in rows if r.gen > 0})
        assert gens and gens == list(range(1, len(gens) + 1))
    finally:
        q.stop()
