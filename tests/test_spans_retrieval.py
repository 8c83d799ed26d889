"""Tests for the round-4 pipeline additions: exact n-gram span dedup,
Gopher quality rules, and batch BM25 retrieval."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline.retrieval import bm25_retrieve
from dudb_spark.pipeline.spans import span_dedup
from dudb_spark.pipeline.text import gopher_flags


def _py_span_dedup(docs: list[tuple[int, str]], n: int):
    """Brute-force reference: first corpus occurrence (by doc, pos) of
    each n-gram survives; every later occurrence's positions drop."""
    toks = {d: t.split() for d, t in docs}
    first: dict[tuple, tuple] = {}
    covered: dict[int, set] = {d: set() for d, _ in docs}
    for d in sorted(toks):
        arr = toks[d]
        for p in range(len(arr) - n + 1):
            g = tuple(arr[p : p + n])
            if g in first:
                covered[d].update(range(p, p + n))
            else:
                first[g] = (d, p)
    out = {}
    for d in sorted(toks):
        arr = toks[d]
        kept = [t for i, t in enumerate(arr) if i not in covered[d]]
        out[d] = (len(arr), len(arr) - len(kept), " ".join(kept))
    return out


def test_span_dedup_golden(spark):
    docs = [
        (1, "a b c d e a b c d e x"),  # within-doc repeat of a 5-gram
        (2, "a b c d e f g h"),        # cross-doc repeat of doc 1's prefix
        (3, "q r s"),                  # shorter than n -> untouched
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
        for r in span_dedup(df, 5).collect()
    }
    assert got == _py_span_dedup(docs, 5)
    # the within-doc repeat removed the second "a b c d e"
    assert got[1] == (11, 5, "a b c d e x")
    # doc 2 lost its first 5 tokens to doc 1's earlier occurrence
    assert got[2][1] == 5
    assert got[3] == (3, 0, "q r s")


def test_span_dedup_fully_covered_doc(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in span_dedup(df, 3).collect()}
    assert got[1]["dedup_text"] == "a b c"
    assert got[2]["n_removed"] == 3
    assert got[2]["dedup_text"] == ""


def test_span_dedup_fuzz_vs_bruteforce(spark):
    rng = random.Random(7)
    vocab = list("abcdefgh")
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
        for r in span_dedup(df, 4).collect()
    }
    assert got == _py_span_dedup(docs, 4)


def test_gopher_flags_golden(spark):
    stops = ["the", "and", "of", "to", "in"]
    long_ok = " ".join(f"word{i} {stops[i % 5]}" for i in range(20))  # 40 words
    df = spark.createDataFrame(
        [
            (1, long_ok),
            (2, "too short for the rules"),                # n_words < 30
            (3, " ".join(["the"] * 40)),                   # repetition fail
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", gopher_flags(F.col("text")).alias("g")
        ).select("doc_id", "g.*").collect()
    }
    assert got[1]["passes"]
    assert got[1]["n_words"] == 40
    assert got[1]["stop_hits"] == 20  # every second token is a stopword
    assert not got[2]["ok_words"] and not got[2]["passes"]
    assert got[3]["top_unigram_frac"] == 1.0
    assert not got[3]["ok_repetition"] and not got[3]["passes"]


def test_bm25_retrieve_golden(spark):
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y z"), (3, "z z z")], ["doc_id", "text"]
    )
    qs = spark.createDataFrame([(1, "x"), (2, "z z")], ["query_id", "qtext"])
    rows = bm25_retrieve(docs, qs, k=2).collect()
    byq = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    # query 1: only doc 1 contains x
    assert [r["doc_id"] for r in byq[1]] == [1]
    # query 2: doc 3 (tf=3, dl=3) outranks doc 2 (tf=1, dl=2)
    assert [r["doc_id"] for r in byq[2]] == [3, 2]
    # hand-check doc 2's score for query 'z z': N=3, df_z=2, avgdl=8/3,
    # qtf=2
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    norm = 1 + 1.2 * (0.25 + 0.75 * 2 / (8 / 3))
    want = round(2 * idf * 1 * 2.2 / norm, 6)
    got = [r["score"] for r in byq[2] if r["doc_id"] == 2][0]
    assert got == pytest.approx(want, abs=1e-6)


def test_bm25_retrieve_rank_is_dense_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], ["doc_id", "text"]
    )
    qs = spark.createDataFrame([(1, "a")], ["query_id", "qtext"])
    rows = bm25_retrieve(docs, qs, k=4).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    # identical scores -> doc_id tiebreak
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3]


def test_excise_spans_golden(spark):
    from dudb_spark.pipeline.spans import excise_spans

    ref = spark.createDataFrame([(100, "p q r s t")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [
            (1, "a b p q r s t c"),   # contains the ref 5-gram -> excised
            (2, "p q r x s t"),       # no full 5-gram overlap -> untouched
            (3, "p q r s t"),         # exactly the ref doc -> emptied
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
        for r in excise_spans(docs, ref, 5).collect()
    }
    assert got[1] == (8, 5, "a b c")
    assert got[2] == (6, 0, "p q r x s t")
    assert got[3] == (5, 5, "")


def test_excise_spans_reference_repetition_not_removed(spark):
    """Within-corpus repeats survive: excision is asymmetric."""
    from dudb_spark.pipeline.spans import excise_spans

    ref = spark.createDataFrame([(100, "z z z")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c a b c")], ["doc_id", "text"]
    )
    got = excise_spans(docs, ref, 3).collect()
    assert all(r["n_removed"] == 0 for r in got)


def test_span_dedup_null_and_empty_text(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c a b c")], schema
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["dedup_text"])
        for r in span_dedup(df, 3).collect()
    }
    assert got[1] == (0, 0, "")
    assert got[2] == (0, 0, "")
    assert got[3] == (6, 3, "a b c")


def test_edit_verify_drops_reordered_near_jaccard_pair(spark):
    """Two docs with identical shingle BAGS but reordered content pass
    the Jaccard screen yet fail the edit-distance cap — the refinement
    the last dedup stage exists for."""
    from dudb_spark.pipeline.dedup import edit_verified_pairs, minhash_verified_pairs

    a = "alpha beta gamma delta epsilon zeta eta theta " * 3
    b = a  # exact copy -> distance 0
    # same words, rotated far: shingles mostly shared, text widely moved
    words = a.split()
    c = " ".join(words[12:] + words[:12])
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"]
    )
    jac = {
        (r["id_a"], r["id_b"])
        for r in minhash_verified_pairs(
            df, num_perm=32, bands=8, min_est=0.5, min_jaccard=0.3
        ).collect()
    }
    assert (1, 2) in jac and (1, 3) in jac  # both survive Jaccard
    edit = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in edit_verified_pairs(df, max_rel_dist=0.1).collect()
    }
    assert edit[(1, 2)] == 0
    assert (1, 3) not in edit  # rotation costs more than 10% edits


def test_rrf_fuse_math_and_union_of_pools(spark):
    """Fused score = sum of nano-quantized 1/(k+rank) terms; docs in
    only one list still surface with a NULL rank for the other."""
    from dudb_spark.pipeline.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], ["query_id", "doc_id", "rank"]
    )
    out = rrf_fuse({"a": a, "b": b}, k_const=60, topk=10)
    rows = {r["doc_id"]: r for r in out.collect()}

    def nano(rank):
        return round(1e9 / (60 + rank))

    # doc 11 in both lists: terms add
    assert rows[11]["rrf_nano"] == nano(2) + nano(1)
    assert rows[11]["a_rank"] == 2 and rows[11]["b_rank"] == 1
    # doc 13 only in b: single term, a_rank NULL
    assert rows[13]["rrf_nano"] == nano(2)
    assert rows[13]["a_rank"] is None
    # fused order: 11 (two terms) first, then rank-1-single docs
    ordered = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert ordered[0] == 11 and set(ordered) == {10, 11, 12, 13}


def test_rrf_fuse_tie_breaks_on_id_and_topk_bounds(spark):
    from dudb_spark.pipeline.retrieval import rrf_fuse

    # two docs with identical (single-list, same-rank) scores across
    # different lists -> tie broken by ascending doc id
    a = spark.createDataFrame([(7, 5, 1)], ["query_id", "doc_id", "rank"])
    b = spark.createDataFrame([(7, 3, 1)], ["query_id", "doc_id", "rank"])
    out = rrf_fuse({"a": a, "b": b}, k_const=60, topk=1).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 3
