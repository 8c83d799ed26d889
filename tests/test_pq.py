"""Product-quantization tests: encode/ADC parity with a plain-Python
reference, and the self-encoding property of seed vectors."""

from __future__ import annotations

import math
import random

import pytest

from dudb_spark.pipeline.pq import (
    _seqsum,
    fixed_pq_codebooks,
    pq_encode,
    pq_topk,
)


def _py_pq(vecs: dict, m: int, ksub: int, q, k: int):
    """Reference PQ: same seeding, same rounding/tie rules."""
    ids = sorted(vecs)
    d = len(vecs[ids[0]])
    dsub = d // m
    seeds = [vecs[i] for i in ids[:ksub]]
    books = [[v[s * dsub:(s + 1) * dsub] for v in seeds] for s in range(m)]

    def code(x, book):
        scores = [
            round(_seqsum(a * b for a, b in zip(x, c))
                  - _seqsum(c_ * c_ for c_ in c) / 2.0, 6)
            for c in book
        ]
        return scores.index(max(scores))

    codes = {
        i: [code(vecs[i][s * dsub:(s + 1) * dsub], books[s])
            for s in range(m)]
        for i in ids
    }
    qnorm = math.sqrt(_seqsum(x * x for x in q))
    out = []
    for i in ids:
        ip = 0.0
        nsq = 0.0
        for s in range(m):
            c = books[s][codes[i][s]]
            qs = q[s * dsub:(s + 1) * dsub]
            ip += _seqsum(a * b for a, b in zip(qs, c))
            nsq += _seqsum(x * x for x in c)
        out.append((i, round(ip / (qnorm * math.sqrt(nsq)), 6)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return codes, out[:k]


def _toy(spark, n=24, d=8, seed=5):
    rng = random.Random(seed)
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(d)]
            for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    return vecs, df


def test_pq_encode_matches_reference(spark):
    vecs, df = _toy(spark)
    books = fixed_pq_codebooks(df, m=2, ksub=4)
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(df, books).collect()}
    want, _ = _py_pq(vecs, 2, 4, vecs[0], 5)
    assert got == want


def test_pq_seed_vectors_encode_to_themselves(spark):
    vecs, df = _toy(spark)
    books = fixed_pq_codebooks(df, m=2, ksub=4)
    got = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(df, books).collect()}
    # a seed's subvector has L2 distance 0 to its own centroid, which
    # the argmax(t) rule always prefers (ties -> smaller code)
    for j in range(4):
        assert got[j] == [j, j] or all(
            vecs[j][s * 4:(s + 1) * 4] == books[s][got[j][s]]
            for s in range(2)
        )


def test_pq_topk_matches_reference(spark):
    vecs, df = _toy(spark)
    q = vecs[0]
    got = [(r["vec_id"], r["adc_cosine"])
           for r in pq_topk(df, q, k=6, m=2, ksub=4).collect()]
    _, want = _py_pq(vecs, 2, 4, q, 6)
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-6)


def test_pq_dim_must_divide(spark):
    _, df = _toy(spark, d=9)
    with pytest.raises(ValueError, match="not divisible"):
        fixed_pq_codebooks(df, m=2, ksub=4)


def test_ivf_pq_full_probe_equals_pq(spark):
    """Probing every cell must reduce IVF,PQ to plain PQ ranking."""
    from dudb_spark.pipeline.ivf import fixed_cells
    from dudb_spark.pipeline.pq import ivf_pq_topk

    _, df = _toy(spark, n=24, d=8)
    cells = fixed_cells(df, n_clusters=4, vec_col="embedding",
                        id_col="vec_id")
    q = df.where("vec_id = 1").first()["embedding"]
    full = [
        (r["vec_id"], r["adc_cosine"])
        for r in ivf_pq_topk(df, cells, q, k=6, n_probe=4, m=2, ksub=4,
                             exclude_id=1).collect()
    ]
    plain = [
        (r["vec_id"], r["adc_cosine"])
        for r in pq_topk(df, q, k=6, m=2, ksub=4, exclude_id=1).collect()
    ]
    assert full == plain


def test_ivf_pq_prunes_to_probed_cells(spark):
    from dudb_spark.pipeline.ivf import fixed_cells
    from dudb_spark.pipeline.pq import ivf_pq_topk

    _, df = _toy(spark, n=24, d=8)
    cells = fixed_cells(df, n_clusters=4, vec_col="embedding",
                        id_col="vec_id")
    assigned, _ = cells
    q = df.where("vec_id = 1").first()["embedding"]
    got = {r["vec_id"]
           for r in ivf_pq_topk(df, cells, q, k=24, n_probe=1, m=2,
                                ksub=4, exclude_id=1).collect()}
    # every result must come from ONE cell's members
    cell_of = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert len({cell_of[v] for v in got}) == 1


def test_residual_recall_beats_plain_ivf_pq(spark):
    """The FAISS accuracy argument, pinned: residuals from the coarse
    centroid are much smaller than raw vectors, so the same PQ code
    budget reconstructs them tighter — on a clustered fixture,
    recall@10 vs exact cosine is strictly better for the residual
    index (deterministic fixture, stable sets)."""
    import math
    import random

    from dudb_spark.pipeline.ivf import fixed_cells
    from dudb_spark.pipeline.pq import ivf_pq_residual_topk, ivf_pq_topk

    rng = random.Random(11)
    n, d = 200, 16
    centers = [[rng.uniform(-1, 1) for _ in range(d)] for _ in range(8)]
    vecs = {}
    for i in range(n):
        c = centers[i % 8]
        vecs[i] = [round(x + rng.uniform(-0.25, 0.25), 3) for x in c]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )

    def cos(a, b):
        dd = _seqsum(x * y for x, y in zip(a, b))
        return dd / (
            math.sqrt(_seqsum(x * x for x in a))
            * math.sqrt(_seqsum(y * y for y in b))
        )

    cells = fixed_cells(df, n_clusters=8)
    K = 10
    rec_plain, rec_res = [], []
    for qid in (1, 3, 5, 7):
        q = vecs[qid]
        exact = set(
            i for _, i in sorted(
                ((cos(q, vecs[i]), i) for i in vecs if i != qid),
                reverse=True,
            )[:K]
        )
        plain = set(
            r["vec_id"]
            for r in ivf_pq_topk(
                df, cells, q, k=K, n_probe=4, m=4, ksub=16, exclude_id=qid
            ).collect()
        )
        res = set(
            r["vec_id"]
            for r in ivf_pq_residual_topk(
                df, cells, q, k=K, n_probe=4, m=4, ksub=16, exclude_id=qid
            ).collect()
        )
        rec_plain.append(len(plain & exact) / K)
        rec_res.append(len(res & exact) / K)
        assert rec_res[-1] >= rec_plain[-1], qid
    assert sum(rec_res) > sum(rec_plain)


def test_residual_seed_vectors_reconstruct_exactly(spark):
    """A codebook seed's residual IS a codebook entry per subspace, so
    its codes must pick entries whose concatenation reproduces the
    residual exactly (ties may pick an identical earlier entry)."""
    import random

    from dudb_spark.pipeline.ivf import fixed_cells
    from dudb_spark.pipeline.pq import (
        fixed_residual_codebooks,
        pq_residual_encode,
    )

    rng = random.Random(3)
    vecs = {i: [round(rng.uniform(-1, 1), 3) for _ in range(8)]
            for i in range(24)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    assigned, centroids = fixed_cells(df, n_clusters=4)
    books = fixed_residual_codebooks(assigned, centroids, m=2, ksub=4)
    coded = {r["vec_id"]: (r["cell"], list(r["codes"]))
             for r in pq_residual_encode(assigned, centroids, books).collect()}
    for j in range(4):
        cell, codes = coded[j]
        resid = [x - c for x, c in zip(vecs[j], centroids[cell])]
        for s in range(2):
            assert books[s][codes[s]] == pytest.approx(
                resid[s * 4:(s + 1) * 4], abs=1e-9
            ), (j, s)
