"""Corpus drift (pipeline/drift.py): direction of the signal,
zero-drift identity, empty-group convention, and order-free
determinism of the nano-quantized sums."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline.drift import corpus_drift


@pytest.fixture(scope="module")
def corpus(spark):
    """Three sources: two share a vocabulary, the third is disjoint —
    the drifted one."""
    rows = []
    for i in range(30):
        rows.append((i, "alpha beta gamma delta alpha beta", "steady_a"))
    for i in range(30, 60):
        rows.append((i, "beta gamma alpha delta beta gamma", "steady_b"))
    for i in range(60, 90):
        rows.append((i, "zeta eta theta iota zeta eta", "drifted"))
    rows.append((90, "", "empty_src"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_drifted_source_has_highest_divergence(spark, corpus):
    out = {r["source"]: r for r in corpus_drift(corpus, "text", "source").collect()}
    assert set(out) == {"steady_a", "steady_b", "drifted", "empty_src"}
    assert out["drifted"]["kl"] > out["steady_a"]["kl"]
    assert out["drifted"]["kl"] > out["steady_b"]["kl"]
    assert out["drifted"]["tvd"] > out["steady_a"]["tvd"]
    # divergences are non-negative (KL up to nano-quantization jitter)
    assert all(r["tvd"] >= 0 for r in out.values())
    assert all(r["kl"] >= -1e-6 for r in out.values())


def test_single_source_is_zero_drift(spark):
    """One group == the reference: pg == pr exactly, KL = TVD = 0."""
    df = spark.createDataFrame(
        [(i, "alpha beta gamma", "only") for i in range(10)],
        "doc_id long, text string, source string",
    )
    r = corpus_drift(df, "text", "source").first()
    assert r["kl"] == 0.0 and r["tvd"] == 0.0
    assert r["n_docs"] == 10 and r["n_grams"] == 10 * 5  # 3 uni + 2 bi


def test_empty_group_convention(spark, corpus):
    """A group whose docs yield zero grams reports n_grams=0 and zero
    divergence — no evidence is not drift."""
    out = {r["source"]: r for r in corpus_drift(corpus, "text", "source").collect()}
    e = out["empty_src"]
    assert e["n_docs"] == 1 and e["n_grams"] == 0
    assert e["kl"] == 0.0 and e["tvd"] == 0.0


def test_deterministic_under_repartition(spark, corpus):
    a = sorted(
        corpus_drift(corpus, "text", "source").collect(),
        key=lambda r: r["source"],
    )
    b = sorted(
        corpus_drift(corpus.repartition(7), "text", "source").collect(),
        key=lambda r: r["source"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_drift_plan_contract(spark, corpus):
    """The corpus-sized aggregation partial-aggregates map-side
    (bounded groups×buckets keys) and the bounded frames ride
    broadcasts — nothing cartesian over data-sized inputs."""
    plan = (
        corpus_drift(corpus, "text", "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
