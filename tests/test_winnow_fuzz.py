"""Seeded fuzz: random documents (mixed alphabets, whitespace runs,
punctuation, short/degenerate strings) winnowed in ONE Spark job and
compared against the pure-Python restatement of the algorithm.  Catches
normalization, boundary (len < k, len < window) and staging divergence
beyond the hand-picked docs in test_pipeline."""

from __future__ import annotations

import random

from dudb_spark.pipeline.text import winnow_df
from tests.test_pipeline import _py_winnow

ALPHABETS = [
    "abcdefghijklmnopqrstuvwxyz",
    "abc",  # high repetition → many duplicate k-grams
    "ab01",  # digits
    "aA.,!?",  # case + punctuation (normalized away)
    "a \t\n",  # whitespace runs
]


def gen_doc(rnd: random.Random) -> str:
    alpha = rnd.choice(ALPHABETS)
    n = rnd.choice([0, 1, 3, 4, 5, 8, 9, 20, 80, 300])
    return "".join(rnd.choice(alpha) for _ in range(n))


def test_winnow_fuzz_vs_python_oracle(spark):
    rnd = random.Random(20260813)
    docs = [(i, gen_doc(rnd)) for i in range(300)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["id"]: list(r["fps"]) for r in winnow_df(df).collect()}
    assert len(got) == 300
    for i, text in docs:
        assert got[i] == _py_winnow(text), f"doc {i}: {text!r}"
