"""Tests for the round-2 pipeline additions: decontamination, repetition
signals, PII scan, BM25, cohort retention."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dudb_spark.operators.retention import cohort_retention
from dudb_spark.pipeline.decontam import ngram_contamination
from dudb_spark.pipeline.pii import pii_scan
from dudb_spark.pipeline.text import bm25_top_terms, repetition_signals


def test_repetition_signals_golden(spark):
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 4
    # 2 distinct of 4 words -> half the words are repeats
    assert r1["dup_word_frac"] == pytest.approx(0.5)
    # bigrams: "a a", "a a", "a b" -> top share 2/3
    assert r1["top_bigram_frac"] == pytest.approx(0.666667)
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0
    # all three bigrams distinct -> 1/3
    assert r2["top_bigram_frac"] == pytest.approx(0.333333)


def test_bm25_golden(spark):
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], ["doc_id", "text"]
    )
    out = {
        (r["doc_id"], r["term"]): r["bm25"]
        for r in bm25_top_terms(df, top_k=3).collect()
    }
    # hand-computed: N=2, avgdl=2.5; doc1 dl=3, term x: tf=2, df=1
    idf_x = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5))
    norm = 2 + 1.2 * (0.25 + 0.75 * 3 / 2.5)
    assert out[(1, "x")] == pytest.approx(
        round(idf_x * 2 * 2.2 / norm, 6), abs=1e-6
    )
    # 'y' appears in both docs -> df=2 -> idf ln(1 + 0.5/2.5)
    idf_y = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    norm_y2 = 1 + 1.2 * (0.25 + 0.75 * 2 / 2.5)
    assert out[(2, "y")] == pytest.approx(
        round(idf_y * 1 * 2.2 / norm_y2, 6), abs=1e-6
    )


def test_bm25_rank_contract(spark):
    df = spark.createDataFrame(
        [(i, f"t{i} t{i} common filler{i % 3}") for i in range(6)],
        ["doc_id", "text"],
    )
    out = bm25_top_terms(df, top_k=2)
    per_doc = (
        out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r["n"] <= 2 for r in per_doc)
    # rank 1 must be the doc's own rare term, not the shared one
    top1 = {r["doc_id"]: r["term"] for r in out.where("rank = 1").collect()}
    for d, term in top1.items():
        assert term == f"t{d}"


def test_pii_scan_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@corp.example.org now"),
            (2, "call 555-123-4567 or visit 10.1.2.3 twice 10.1.2.4"),
            (3, "clean text with no identifiers"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in pii_scan(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_pii"] == 1
    assert rows[1]["redacted"] == "mail [EMAIL] now"
    assert rows[2]["n_phone"] == 1 and rows[2]["n_ipv4"] == 2
    assert rows[2]["redacted"] == "call [PHONE] or visit [IPV4] twice [IPV4]"
    assert rows[3]["n_pii"] == 0 and rows[3]["redacted"] == rows[3]["redacted"]


def test_ngram_contamination(spark):
    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            # shares the 5-gram "the quick brown fox jumps" (and more)
            (1, "prefix the quick brown fox jumps away"),
            (2, "completely unrelated words only here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            ngram_contamination(corpus, eval_set, n=5).collect()}
    assert 1 in rows and 2 not in rows
    assert rows[1]["n_hit"] == 1
    assert rows[1]["n_shingles"] == 3  # 7 tokens -> 3 distinct 5-grams
    assert rows[1]["contamination"] == pytest.approx(round(1 / 3, 6))


def test_cohort_retention_golden(spark):
    day = 86400
    rows = [
        # user 10: first week 0, returns week 1; user 20: week 0 only;
        # user 30: first seen week 1
        (10, 1 * day), (10, 8 * day), (20, 2 * day), (30, 9 * day),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "epoch"]).select(
        "user_id", F.timestamp_seconds("epoch").alias("ts")
    )
    out = {
        (r["cohort_week"], r["week_offset"]): r
        for r in cohort_retention(ev).collect()
    }
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1
    assert out[(0, 1)]["retention"] == pytest.approx(0.5)
    assert out[(1, 0)]["n_active"] == 1 and out[(1, 0)]["n_cohort"] == 1


def test_sq8_quantization_quality(spark):
    """SQ8 reconstruction keeps cosine ranking useful: recall@10 vs exact
    ≥ 0.8 and max |cosine error| over the top lists < 0.02 on real
    fixture embeddings."""
    from dudb_spark.pipeline.quantize import sq8_topk
    from dudb_spark.pipeline.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id = 0").collect()[0]["embedding"]
    exact = {
        r["vec_id"]: r["cosine"]
        for r in brute_force_topk(emb.where("vec_id != 0"), q, k=10).collect()
    }
    quant = {
        r["vec_id"]: r["qcosine"] for r in sq8_topk(emb, 0, k=10).collect()
    }
    recall = len(exact.keys() & quant.keys()) / 10
    assert recall >= 0.8, (recall, exact, quant)
    for vid in exact.keys() & quant.keys():
        assert abs(exact[vid] - quant[vid]) < 0.02


def test_sq8_codes_in_range(spark):
    from dudb_spark.pipeline.quantize import sq8_bounds, sq8_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    enc = sq8_encode(emb, sq8_bounds(emb))
    bad = enc.selectExpr(
        "exists(codes, c -> c < 0 OR c > 255) AS bad"
    ).where("bad").count()
    assert bad == 0


def test_chunk_tokens_golden(spark):
    from dudb_spark.pipeline.text import chunk_tokens

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(23)))], ["doc_id", "text"]
    )
    rows = sorted(
        (r["chunk_id"], r["n_tokens"], r["chunk_text"].split()[0])
        for r in chunk_tokens(df, chunk=10, overlap=3).collect()
    )
    # 23 tokens, stride 7: starts 1, 8, 15, 22
    assert rows == [
        (0, 10, "w0"), (1, 10, "w7"), (2, 9, "w14"), (3, 2, "w21")
    ]
    # overlap contract: consecutive chunks share `overlap` tokens
    texts = {r["chunk_id"]: r["chunk_text"].split()
             for r in chunk_tokens(df, chunk=10, overlap=3).collect()}
    assert texts[0][-3:] == texts[1][:3]


def test_chunk_documents_golden(spark):
    from dudb_spark.pipeline.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5"), (2, "only two"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    rows = chunk_documents(df, size=3, stride=2).orderBy(
        "doc_id", "win_id"
    ).collect()
    got = [(r["doc_id"], r["win_id"], r["start_tok"], r["n_tokens"],
            r["chunk_text"]) for r in rows]
    assert got == [
        (1, 0, 0, 3, "t1 t2 t3"),
        (1, 1, 2, 3, "t3 t4 t5"),
        (1, 2, 4, 1, "t5"),          # short tail window
        (2, 0, 0, 2, "only two"),    # doc shorter than one window
    ]  # empty/null docs yield no windows
    # every token is covered by at least one window
    covered = set()
    for _, _, s, n, _ in got[:3]:
        covered |= set(range(s, s + n))
    assert covered == set(range(5))


def test_source_overlap_matrix_golden(spark):
    from dudb_spark.pipeline.decontam import source_overlap_matrix

    df = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "c d e f", "s2"),      # shares bigram "c d" with s1
            (3, "x y", "s3"),          # no overlap with anyone
            (4, "a b c z", "s2"),      # shares "a b" and "b c" with s1
        ],
        ["doc_id", "text", "source"],
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(df, n=2).collect()
    }
    # s1 grams: {a b, b c, c d}; s2 grams: {c d, d e, e f, a b, b c, c z}
    r = rows[("s1", "s2")]
    assert r["shared_grams"] == 3 and r["n_a"] == 3 and r["n_b"] == 6
    assert r["jaccard"] == round(3 / (3 + 6 - 3), 6)
    # disjoint pairs produce no row (inner join on shared grams)
    assert ("s1", "s3") not in rows and ("s2", "s3") not in rows


def test_label_outliers_golden(spark):
    from dudb_spark.pipeline.similarity import label_outliers

    rows = []
    # label 0: tight cluster near (1, 0) + one opposite-direction outlier
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i], 0))
    rows.append((6, [-1.0, 0.2], 0))
    # label 1: cluster near (0, 1) + one orthogonal-ish outlier
    for i in range(7, 12):
        rows.append((i, [0.01 * i, 1.0], 1))
    rows.append((12, [1.0, -0.9], 1))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        (r["label"], r["rank"]): r["vec_id"]
        for r in label_outliers(df, k=2, n_buckets=4).collect()
    }
    assert got[(0, 1)] == 6   # the planted outliers rank first
    assert got[(1, 1)] == 12
    assert len(got) == 4
    # two-phase bucketed bottom-k == direct bottom-k (exactness of the
    # bucket pruning), for several bucket widths
    direct = {
        (r["label"], r["rank"]): r["vec_id"]
        for r in label_outliers(df, k=2, n_buckets=1).collect()
    }
    assert got == direct


def test_label_outliers_string_labels_and_empty(spark):
    """String labels ride as escaped SQL literals (including quotes), and
    an empty input yields an empty frame instead of a TypeError."""
    from dudb_spark.pipeline.similarity import label_outliers

    rows = [(i, [1.0, 0.01 * i], "cat's") for i in range(4)]
    rows.append((4, [-1.0, 0.2], "cat's"))
    rows += [(i, [0.0, 1.0], "dog") for i in range(5, 8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    got = {
        (r["label"], r["rank"]): r["vec_id"]
        for r in label_outliers(df, k=1, n_buckets=2).collect()
    }
    assert got[("cat's", 1)] == 4
    assert ("dog", 1) in got and len(got) == 2

    empty = label_outliers(df.where("vec_id < 0"), k=2)
    assert empty.collect() == []
    assert empty.columns == ["label", "vec_id", "cos_centroid", "rank"]


def test_bpe_merges_golden(spark):
    from dudb_spark.pipeline.bpe import bpe_merges

    df = spark.createDataFrame(
        [(1, "aa ab aa"), (2, "ab aa"), (3, "Zz 99 aa!")],
        ["doc_id", "text"],
    )
    # normalized words: aa x3, ab x2, zz x1 ("99"/"aa!" dropped by [a-z]+)
    rows = [tuple(r) for r in bpe_merges(df, rounds=5).collect()]
    assert rows[0] == (0, "a", "a", "aa", 3)
    assert rows[1] == (1, "a", "b", "ab", 2)
    assert rows[2] == (2, "z", "z", "zz", 1)
    # all pairs merged away -> induction stops early
    assert len(rows) == 3


def test_bpe_merge_fold_overlap_rule(spark):
    """Greedy left-to-right non-overlap: 'aaaa' under (a,a) becomes
    (aa)(aa), and the fresh merge never re-matches within the round."""
    from dudb_spark.pipeline.bpe import bpe_merges

    df = spark.createDataFrame([(1, "aaaa aaaa aab")], ["doc_id", "text"])
    rows = [tuple(r) for r in bpe_merges(df, rounds=2).collect()]
    # round 0: counts are weighted by word frequency (Sennrich get_stats):
    # 'aaaa' (freq 2) contributes 3 adjacent (a,a) pairs -> 3*2 = 6,
    # 'aab' (freq 1) contributes 1 -> total 7
    assert rows[0][:4] == (0, "a", "a", "aa") and rows[0][4] == 3 * 2 + 1
    # round 1 over vocab {'aa','aa'} and {'aa','b'}: (aa,aa) x1, (aa,b) x1
    # tie on count -> lexicographic (aa,aa) wins
    assert rows[1][:4] == (1, "aa", "aa", "aaaa")


def test_excise_frequent_lines(spark):
    from dudb_spark.pipeline.dedup import excise_frequent_lines

    docs = spark.createDataFrame(
        [
            (1, "boiler\nunique one\nboiler2"),
            (2, "boiler\nunique two"),
            (3, "boiler\nboiler2\nunique three\nboiler"),
            (4, "boiler2"),
        ],
        ["doc_id", "text"],
    )
    # 'boiler' occurs 4x (>=3 -> excised), 'boiler2' 3x (excised),
    # uniques stay in order; doc 4 empties but survives
    out = {
        r.doc_id: (r.n_lines, r.n_removed, r.text)
        for r in excise_frequent_lines(docs, min_count=3).collect()
    }
    assert out[1] == (3, 2, "unique one")
    assert out[2] == (2, 1, "unique two")
    assert out[3] == (4, 3, "unique three")
    assert out[4] == (1, 1, "")
    # min_count high enough keeps everything, order preserved
    keep = {
        r.doc_id: r.text
        for r in excise_frequent_lines(docs, min_count=99).collect()
    }
    assert keep[3] == "boiler\nboiler2\nunique three\nboiler"


def test_excise_frequent_lines_fuzz(spark):
    """Random corpora from a tiny line alphabet vs a pure-Python oracle:
    counts, order, and empty-document survival at several thresholds."""
    import random

    from dudb_spark.pipeline.dedup import excise_frequent_lines

    rng = random.Random(77)
    alpha = ["a", "bb", "ccc", "", "dd d"]
    for trial in range(4):
        docs = []
        for i in range(rng.randint(1, 12)):
            docs.append(
                (i, "\n".join(rng.choice(alpha)
                              for _ in range(rng.randint(1, 6))))
            )
        mc = rng.randint(2, 5)
        freq: dict[str, int] = {}
        for _, t in docs:
            for ln in t.split("\n"):
                freq[ln] = freq.get(ln, 0) + 1
        want = {}
        for i, t in docs:
            lines = t.split("\n")
            kept = [ln for ln in lines if freq[ln] < mc]
            want[i] = (len(lines), len(lines) - len(kept), "\n".join(kept))
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            r.doc_id: (r.n_lines, r.n_removed, r.text)
            for r in excise_frequent_lines(df, min_count=mc).collect()
        }
        assert got == want, (trial, mc)


def test_select_to_budget_fuzz(spark):
    """Random (id, score, tokens) frames vs the sorted-prefix Python
    oracle, including negative scores and exact-boundary budgets."""
    import random

    from dudb_spark.operators.prefix import select_to_budget

    rng = random.Random(55)
    for trial in range(4):
        n = rng.randint(1, 25)
        rows = [
            (i, rng.randint(-50, 50), rng.randint(1, 30))
            for i in range(n)
        ]
        order = sorted(rows, key=lambda r: (-r[1], r[0]))
        budget = rng.randint(1, sum(r[2] for r in rows))
        want, cum = {}, 0
        for i, s, t in order:
            cum += t
            if cum > budget:
                break
            want[i] = cum
        df = spark.createDataFrame(rows, ["doc_id", "score", "tokens"])
        got = {
            r.doc_id: r.cum_tokens
            for r in select_to_budget(
                df, "score", "doc_id", "tokens", budget
            ).collect()
        }
        assert got == want, (trial, budget)


def test_bigram_logprob_hand_model(spark):
    """Laplace bigram model on the train slice, hand-replayed: p(w2|w1)
    = (c12+1)/(c1+V), unseen contexts fall back to 1/V, <2-token docs
    drop out."""
    import math

    from dudb_spark.pipeline.text import bigram_logprob

    docs = spark.createDataFrame(
        [
            (0, "en", "a b a b c"),
            (1, "en", "a b"),
            (2, "fr", "b a x"),
            (3, "fr", "z"),
            (4, "fr", "q r"),
        ],
        "doc_id long, lang string, text string",
    )
    res = {r["doc_id"]: r for r in bigram_logprob(
        docs, F.col("lang") == "en"
    ).collect()}
    # train model: c(a,b)=3, c(b,a)=1, c(b,c)=1; ctx a=3, b=2; V=2
    lp_ab = math.log(4 / 5)
    lp_ba = math.log(2 / 4)
    lp_bc = math.log(2 / 4)
    lp_ax = math.log(1 / 5)   # unseen bigram, seen context a
    lp_qr = math.log(1 / 2)   # unseen context: 1/V
    assert 3 not in res  # single-token doc has no bigrams
    assert res[0]["n_bigrams"] == 4
    assert res[0]["mean_lp"] == round((2 * lp_ab + lp_ba + lp_bc) / 4, 6)
    assert res[1]["mean_lp"] == round(lp_ab, 6)
    assert res[2]["mean_lp"] == round((lp_ba + lp_ax) / 2, 6)
    assert res[4]["mean_lp"] == round(lp_qr, 6)
    # word ORDER sensitivity — the property q52's unigram filter lacks:
    # same bag of words, shuffled, scores strictly lower
    shuf = spark.createDataFrame(
        [(10, "xx", "a b a b c"), (11, "xx", "b b a c a")],
        "doc_id long, lang string, text string",
    )
    both = docs.unionByName(shuf)
    r2 = {r["doc_id"]: r["mean_lp"] for r in bigram_logprob(
        both, F.col("lang") == "en"
    ).collect()}
    assert r2[11] < r2[10]


def test_blocklist_filter_goldens(spark):
    """Hit counting is case-insensitive exact-token; density thresholds
    gate keep; NULL/empty text scores 0/0 and is KEPT; max_hits caps
    independently of density."""
    from dudb_spark.pipeline.text import blocklist_filter

    rows = [
        (0, "clean words only here"),
        (1, "BAD bad words bad"),          # 3 hits / 4 tokens
        (2, None),
        (3, ""),
        (4, "bad " * 20),                  # 20 hits, density 1.0
        (5, "one bad in twenty " + "x " * 16),  # 1/20 = 0.05
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in blocklist_filter(
        df, ["bad", "evil"], max_density=0.1, max_hits=10).collect()}
    assert (got[0]["n_hits"], got[0]["keep"]) == (0, True)
    assert (got[1]["n_tokens"], got[1]["n_hits"]) == (4, 3)
    assert got[1]["hit_density"] == 0.75 and not got[1]["keep"]
    for d in (2, 3):
        assert (got[d]["n_tokens"], got[d]["n_hits"],
                got[d]["hit_density"], got[d]["keep"]) == (0, 0, 0.0, True)
    assert not got[4]["keep"]  # both caps exceeded
    assert got[5]["n_hits"] == 1 and got[5]["hit_density"] == 0.05
    assert got[5]["keep"]

    # max_hits alone can reject a long doc whose density is tiny
    long_doc = spark.createDataFrame(
        [(9, "bad " * 11 + "x " * 989)], "doc_id long, text string")
    r = blocklist_filter(long_doc, ["bad"], max_density=0.5,
                         max_hits=10).collect()[0]
    assert r["n_hits"] == 11 and not r["keep"]


def test_centroid_separation_goldens(spark):
    """Two 2-D point clouds with known centroids: A = {(0,0),(2,0)}
    -> (1,0); B = {(4,3),(6,3)} -> (5,3); dist = 5.  NULL vectors and
    NULL groups drop; a third singleton group pairs with both."""
    from dudb_spark.pipeline.similarity import centroid_separation

    rows = [
        (0, [0.0, 0.0], "A"), (1, [2.0, 0.0], "A"),
        (2, [4.0, 3.0], "B"), (3, [6.0, 3.0], "B"),
        (4, [1.0, 1.0], "C"),
        (5, None, "A"), (6, [9.0, 9.0], None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")
    got = {(r["group_a"], r["group_b"]): r for r in centroid_separation(
        df, group_col="label").collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert (ab["n_a"], ab["n_b"]) == (2, 2)
    assert ab["dist"] == 5.0 and ab["dist_sq_nano"] == 25_000_000_000
    # A centroid (1,0) -> C (1,1): dist 1; B (5,3) -> C: sqrt(20)
    assert got[("A", "C")]["dist"] == pytest.approx(1.0, abs=1e-6)
    bc = got[("B", "C")]
    assert bc["n_b"] == 1
    assert bc["dist"] == pytest.approx(20 ** 0.5, abs=1e-6)


def test_dim_stats_goldens(spark):
    """Hand stats per dim over {(1,0),(3,4)}: dim0 mean 2, std 1,
    min/max 1/3; dim1 mean 2, std 2, min/max 0/4; NULL vectors drop."""
    from dudb_spark.pipeline.similarity import dim_stats

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [3.0, 4.0]), (2, None)],
        "vec_id long, embedding array<float>")
    got = {r["dim"]: r for r in dim_stats(df).collect()}
    assert set(got) == {0, 1}
    d0, d1 = got[0], got[1]
    assert (d0["n"], d0["mean"], d0["std"], d0["vmin"], d0["vmax"]) == (
        2, 2.0, 1.0, 1.0, 3.0)
    assert (d1["mean"], d1["std"], d1["vmin"], d1["vmax"]) == (
        2.0, 2.0, 0.0, 4.0)
