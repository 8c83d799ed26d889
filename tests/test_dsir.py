"""DSIR importance resampling (pipeline/dsir.py): weight semantics,
determinism under repartitioning, degenerate inputs, and the
no-shuffle/TakeOrdered plan contract for the scoring pass."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline.dedup import poly_token_hash_array
from dudb_spark.pipeline.dsir import (
    bucket_log_ratios,
    dsir_log_weight_from,
    dsir_select,
    gram_buckets_from,
    gumbel_key,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Two 'domains' with disjoint-ish vocabulary: target docs repeat
    'alpha beta', background docs repeat 'gamma delta'."""
    rows = []
    for i in range(40):
        rows.append((i, "alpha beta alpha beta gamma", "tgt"))
    for i in range(40, 120):
        rows.append((i, "gamma delta epsilon gamma delta", "bg"))
    rows.append((120, "", "bg"))  # empty text: zero grams, weight 0
    return spark.createDataFrame(rows, "doc_id long, text string, dom string")


def test_target_domain_scores_higher(spark, corpus):
    lr = bucket_log_ratios(corpus, "text", F.col("dom") == "tgt", n_buckets=64)
    assert len(lr) == 64 and all(isinstance(x, float) for x in lr)
    th = corpus.select(
        "doc_id", "dom", poly_token_hash_array(F.col("text")).alias("_th")
    )
    w = (
        th.select("dom", dsir_log_weight_from(F.col("_th"), lr).alias("w"))
        .groupBy("dom")
        .agg(F.avg("w").alias("avg_w"))
        .collect()
    )
    by_dom = {r["dom"]: r["avg_w"] for r in w}
    assert by_dom["tgt"] > by_dom["bg"]  # target-like docs upweighted


def test_empty_text_weight_zero(spark, corpus):
    lr = bucket_log_ratios(corpus, "text", F.col("dom") == "tgt", n_buckets=64)
    th = corpus.where("doc_id = 120").select(
        "doc_id", poly_token_hash_array(F.col("text")).alias("_th")
    )
    row = th.select(dsir_log_weight_from(F.col("_th"), lr).alias("w")).first()
    assert row["w"] == 0.0


def test_single_token_doc_has_no_bigrams(spark):
    df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    th = df.select(poly_token_hash_array(F.col("text")).alias("_th"))
    n = th.select(
        F.size(gram_buckets_from(F.col("_th"), 64)).alias("n")
    ).first()["n"]
    assert n == 1  # one unigram, no bigram, and no descending-sequence trap


def test_selection_deterministic_under_repartition(spark, corpus):
    a = dsir_select(
        corpus, "doc_id", "text", F.col("dom") == "tgt", k=20, n_buckets=64
    ).collect()
    b = dsir_select(
        corpus.repartition(7),
        "doc_id",
        "text",
        F.col("dom") == "tgt",
        k=20,
        n_buckets=64,
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert [r["score"] for r in a] == [r["score"] for r in b]


def test_topk_without_gumbel_is_pure_argmax(spark, corpus):
    out = dsir_select(
        corpus,
        "doc_id",
        "text",
        F.col("dom") == "tgt",
        k=40,
        n_buckets=64,
        gumbel=False,
    ).collect()
    # without noise, the 40 target docs (highest weight) are exactly the
    # selection, and score == log_weight
    assert {r["doc_id"] for r in out} == set(range(40))
    assert all(r["score"] == r["log_weight"] for r in out)


def test_gumbel_selection_is_biased_toward_target(spark, corpus):
    out = dsir_select(
        corpus, "doc_id", "text", F.col("dom") == "tgt", k=40, n_buckets=64
    ).collect()
    n_tgt = sum(1 for r in out if r["doc_id"] < 40)
    # 40 of 121 docs are target (33%); importance weighting must pull the
    # selected share well above the base rate
    assert n_tgt > 20


def test_gumbel_keys_finite(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    stats = df.select(gumbel_key(F.col("doc_id")).alias("g")).agg(
        F.count(F.when(F.isnan("g") | F.col("g").isNull(), 1)).alias("bad"),
        F.min("g").alias("lo"),
        F.max("g").alias("hi"),
    ).first()
    assert stats["bad"] == 0
    assert math.isfinite(stats["lo"]) and math.isfinite(stats["hi"])


def test_log_ratios_smoothing_floor(spark, corpus):
    """Buckets no gram ever hits get the pure-smoothing ratio
    log((0+1)/(T+B)) - log((0+1)/(R+B)) = log((R+B)/(T+B)) — finite."""
    lr = bucket_log_ratios(corpus, "text", F.col("dom") == "tgt", n_buckets=1024)
    assert all(math.isfinite(x) for x in lr)


def test_scoring_pass_plan_contract(spark, corpus):
    """The scoring+selection pass is scan-side: no Exchange other than
    the TakeOrdered machinery — assert no shuffle node in the plan
    below TakeOrderedAndProject."""
    lr = bucket_log_ratios(corpus, "text", F.col("dom") == "tgt", n_buckets=64)
    th_df = corpus.select(
        F.col("doc_id"), poly_token_hash_array(F.col("text")).alias("_th")
    )
    logw = dsir_log_weight_from(F.col("_th"), lr)
    plan = (
        th_df.select("doc_id", F.round(logw, 6).alias("log_weight"))
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
