"""IVF ANN: pruning really happens, recall against brute force is decent."""

from __future__ import annotations

import pytest

from dudb_spark.pipeline.ivf import build_ivf
from dudb_spark.pipeline.similarity import brute_force_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_ivf_search_prunes_and_recalls(spark, corpus):
    idx = build_ivf(corpus, n_clusters=8)
    assigned = idx.assign(corpus).cache()
    try:
        n_total = assigned.count()
        q = corpus.where("vec_id = 0").first()["embedding"]

        # probing 4 of 8 cells scans roughly half the corpus
        cells = idx._query_cells(q, 4)
        n_scanned = assigned.where(assigned.cell.isin(cells)).count()
        assert n_scanned < n_total

        approx = idx.search(
            assigned.where("vec_id != 0"), q, k=10, n_probe=4
        ).collect()
        brute = [
            r["vec_id"]
            for r in brute_force_topk(corpus.where("vec_id != 0"), q, k=10).collect()
        ]
        got = [r["vec_id"] for r in approx]
        # neighbours live near the query's cell: half-corpus probe should
        # recover most of the true top-10
        assert len(set(got) & set(brute)) >= 5
        # every returned score must match brute force exactly (same math)
        brute_scores = {
            r["vec_id"]: r["cosine"]
            for r in brute_force_topk(
                corpus.where("vec_id != 0"), q, k=1000
            ).collect()
        }
        for r in approx:
            assert brute_scores[r["vec_id"]] == pytest.approx(r["cosine"], abs=1e-6)
    finally:
        assigned.unpersist()


def test_ivf_full_probe_equals_brute(spark, corpus):
    """Probing every cell must reproduce exact brute-force top-k."""
    idx = build_ivf(corpus, n_clusters=8)
    assigned = idx.assign(corpus)
    q = corpus.where("vec_id = 7").first()["embedding"]
    approx = idx.search(assigned.where("vec_id != 7"), q, k=5, n_probe=8).collect()
    brute = brute_force_topk(corpus.where("vec_id != 7"), q, k=5).collect()
    assert [(r["vec_id"], r["cosine"]) for r in approx] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]


def test_fixed_ivf_deterministic_and_sane(spark):
    from dudb_spark.pipeline.ivf import fixed_ivf_topk
    from dudb_spark.pipeline.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id = 0").first()["embedding"]
    a = [(r["vec_id"], r["cosine"]) for r in fixed_ivf_topk(emb, q, k=10).collect()]
    b = [(r["vec_id"], r["cosine"]) for r in fixed_ivf_topk(emb, q, k=10).collect()]
    assert a == b and len(a) == 10
    # probing 4/16 cells still recovers most of the true top-10
    brute = [r["vec_id"] for r in
             brute_force_topk(emb.where("vec_id != 0"), q, k=10).collect()]
    assert len({v for v, _ in a} & set(brute)) >= 5


def test_semantic_dedup_contract(spark, corpus):
    """SemDeDup invariants: one row per vector; a dropped vector's dup_of
    is a lower KEPT-or-dropped id in the SAME cell with cosine >= thr; a
    kept vector has no lower same-cell shadow."""
    from dudb_spark.pipeline.similarity import cosine, semantic_dedup, _as_double

    from pyspark.sql import functions as F

    res = semantic_dedup(corpus, threshold=0.2, n_clusters=8).cache()
    try:
        n = corpus.count()
        assert res.count() == n
        rows = {r["vec_id"]: r for r in res.collect()}
        # at least one drop at this threshold on the fixture corpus
        dropped = [r for r in rows.values() if not r["kept"]]
        assert dropped
        for r in dropped:
            assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
            assert rows[r["dup_of"]]["cell"] == r["cell"]
        # spot-check the shadowing cosine for a few dropped vectors
        vec = {
            r["vec_id"]: r["embedding"]
            for r in corpus.where(
                F.col("vec_id").isin(
                    [r["vec_id"] for r in dropped[:3]]
                    + [r["dup_of"] for r in dropped[:3]]
                )
            ).collect()
        }
        for r in dropped[:3]:
            a, b = vec[r["vec_id"]], vec[r["dup_of"]]
            d = sum(x * y for x, y in zip(a, b))
            na = sum(x * x for x in a) ** 0.5
            nb = sum(y * y for y in b) ** 0.5
            assert round(d / (na * nb), 6) >= 0.2 - 1e-9
    finally:
        res.unpersist()


def test_incremental_add_matches_full_assignment(spark, corpus):
    """assign_to_cells against a fixed quantizer == assigning everything
    in one pass (the add path changes WHEN vectors are quantized, never
    HOW), and the merged postings make new vectors searchable."""
    from pyspark.sql import functions as F

    from dudb_spark.pipeline.ivf import (
        assign_to_cells,
        fixed_cells,
        fixed_ivf_topk,
    )

    hi = corpus.agg(F.max("vec_id")).first()[0]
    cut = (hi + 1) * 4 // 5
    base = corpus.where(F.col("vec_id") < cut)
    new = corpus.where(F.col("vec_id") >= cut)

    assigned_base, c1 = fixed_cells(base, n_clusters=8)
    merged = assigned_base.unionByName(assign_to_cells(new, c1))
    onepass = assign_to_cells(corpus, c1)
    assert sorted(
        (r["vec_id"], r["cell"]) for r in merged.select("vec_id", "cell").collect()
    ) == sorted(
        (r["vec_id"], r["cell"]) for r in onepass.select("vec_id", "cell").collect()
    )

    # a newly added vector is findable: its own nearest neighbour search
    # over the merged index returns ids, including at least one added id
    qv = corpus.where(F.col("vec_id") == hi).first()["embedding"]
    top = fixed_ivf_topk(
        corpus, qv, k=5, n_clusters=8, n_probe=8,
        cells=(merged, c1), exclude_id=hi,
    ).collect()
    assert len(top) == 5
    assert all(r["vec_id"] != hi for r in top)


def test_ivf_sq8_full_probe_equals_sq8_brute(spark, corpus):
    """Probing every cell makes the compressed-index search equal the
    plain SQ8 brute force (cell pruning changes WHICH rows are scored,
    never HOW)."""
    from dudb_spark.pipeline.ivf import fixed_cells
    from dudb_spark.pipeline.quantize import ivf_sq8_topk, sq8_topk

    cells = fixed_cells(corpus, n_clusters=8)
    full = ivf_sq8_topk(corpus, cells, query_id=0, k=10, n_probe=8)
    brute = sq8_topk(corpus, query_id=0, k=10)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in brute.collect()
    ]
