"""Feature-hashing embeddings: exactness against a pure-Python model,
plan shape, and end-to-end top-k."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dudb_spark.pipeline.embed import embed_documents, embedded_topk
from dudb_spark.plans import plan_of

_B, _M = 257, (1 << 31) - 1


def _py_token_hash(tok: str) -> int:
    h = 0
    for ch in tok:
        h = (h * _B + ord(ch)) % _M
    return h


def _py_embed(text: str, dim: int) -> list[int]:
    vec = [0] * dim
    for tok in text.split():
        h = _py_token_hash(tok)
        vec[h % dim] += 1 if (h // dim) % 2 == 0 else -1
    return vec


def test_embedding_matches_python_model(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the the the repeated token mass"),
        (4, ""),
        (5, "unicode tökens résumé naïve"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["doc_id"]: (list(r["embedding"]), r["norm_sq"])
        for r in embed_documents(df, dim=16).collect()
    }
    for doc_id, text in docs:
        expect = _py_embed(text, 16)
        got, n2 = out[doc_id]
        assert got == expect, f"doc {doc_id}"
        assert n2 == sum(v * v for v in expect)


def test_embedding_plan_shape(spark):
    from dudb_spark.plans.inspect import n_exchanges

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    emb = embed_documents(df, dim=8)
    p = plan_of(emb)
    # two-phase pivot: (doc,idx) partial agg + per-doc pivot — exactly the
    # two shuffles, all JVM-side
    assert n_exchanges(emb) == 2
    assert "HashAggregate" in p
    # no Python UDF boundary (the createDataFrame scan itself mentions
    # "PythonRDD" — that's the fixture, not the operator)
    assert "PythonUDF" not in p and "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p


def test_embedded_topk_finds_near_duplicate(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base),
        (2, base + " extra"),
        (3, "totally different words about filesystems and parquet"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (5, "yet another unrelated string entirely unlike the rest"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = embedded_topk(df, query_ids=[1], k=2, dim=32).collect()
    assert [r["rank"] for r in rows] == [1, 2]
    # the two near-copies of doc 1 beat the unrelated docs
    assert {r["doc_id"] for r in rows} == {2, 4}
    assert rows[0]["cosine"] > 0.8
    # cosine is the exact integer-dot computation
    e = {r["doc_id"]: (list(r["embedding"]), r["norm_sq"])
         for r in embed_documents(df, dim=32).collect()}
    dot = sum(a * b for a, b in zip(e[1][0], e[rows[0]["doc_id"]][0]))
    expect = round(dot / math.sqrt(e[1][1] * e[rows[0]["doc_id"]][1]), 6)
    assert rows[0]["cosine"] == expect


def test_zero_norm_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, "a c")], ["doc_id", "text"]
    )
    rows = embedded_topk(df, query_ids=[1], k=5, dim=8).collect()
    assert all(r["doc_id"] != 2 for r in rows)
