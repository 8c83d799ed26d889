"""Distributed prefix sum: equality with the single-task window, packing
semantics, and the no-global-window plan contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dudb_spark.operators.prefix import distributed_cumsum, pack_sequences


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=60, unique=True),
    st.integers(2, 7),
)
def test_cumsum_matches_global_window(spark, ids, nparts):
    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in ids], ["doc_id", "tokens"]
    )
    got = {
        r.doc_id: r.cum
        for r in distributed_cumsum(
            df, "doc_id", "tokens", num_partitions=nparts
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("tokens").over(w)).collect()
    }
    assert got == want


def test_pack_respects_budget_semantics(spark):
    # 10 docs x 40 tokens, budget 100: shards of floor-exclusive semantics
    df = spark.createDataFrame(
        [(i, 40) for i in range(10)], ["doc_id", "tokens"]
    )
    rows = {
        r.doc_id: r.shard
        for r in pack_sequences(df, "doc_id", "tokens", budget=100).collect()
    }
    # cum exclusive: 0,40,80,120,... -> shards 0,0,0,1,1,2,2,2,3,3
    assert rows == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_no_single_task_global_window(spark):
    """The whole point: no empty-partitionBy window over the full data.
    Every window in the plan must be keyed (the offsets window runs over
    #partitions rows, not data rows, and AQE handles it)."""
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("tokens")
    )
    out = distributed_cumsum(df, "doc_id", "tokens", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-sized window is partitioned by _pid; the only unkeyed
    # window is over the 8-row offsets frame, which shows up as a
    # SinglePartition exchange of an aggregated (tiny) input
    assert "Window [sum(tokens" in plan or "_local" in plan
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "pid" not in ln
    ]
    # offsets window only — it must consume the groupBy output, never the raw table
    assert all("_psum" in ln or "Window" not in ln for ln in data_windows), plan


def test_select_to_budget_greedy_prefix(spark):
    """Keeps exactly the best-score-first prefix of whole documents whose
    running total fits the budget; ties broken by ascending id."""
    rows = [
        # (doc_id, score, tokens)
        (1, 9, 40), (2, 9, 30), (3, 7, 50), (4, 7, 10), (5, 3, 5),
        (6, 11, 20), (7, 7, 25),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "score", "tokens"])
    from dudb_spark.operators.prefix import select_to_budget

    got = {
        r.doc_id: r.cum_tokens
        for r in select_to_budget(
            df, "score", "doc_id", "tokens", budget=145
        ).collect()
    }
    # order: 6(20) 1(60) 2(90) 3(140) 4(150 straddles->dropped) 7 5
    assert got == {6: 20, 1: 60, 2: 90, 3: 140}
    # budget exactly at a document boundary keeps it
    got2 = sorted(
        r.doc_id
        for r in select_to_budget(
            df, "score", "doc_id", "tokens", budget=150
        ).collect()
    )
    assert got2 == [1, 2, 3, 4, 6]
    # negative scores sort below all non-negative ones
    df2 = spark.createDataFrame(
        [(1, -5, 10), (2, 0, 10)], ["doc_id", "score", "tokens"]
    )
    only = select_to_budget(df2, "score", "doc_id", "tokens", 10).collect()
    assert [r.doc_id for r in only] == [2]


def test_select_to_budget_no_global_window(spark):
    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 23).alias("score"),
        (F.col("id") % 97 + 1).alias("tokens"),
    )
    from dudb_spark.operators.prefix import select_to_budget

    out = select_to_budget(df, "score", "doc_id", "tokens", 10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    data_windows = [
        ln for ln in plan.splitlines() if "Window" in ln and "pid" not in ln
    ]
    assert all("_psum" in ln or "Window" not in ln for ln in data_windows), plan
