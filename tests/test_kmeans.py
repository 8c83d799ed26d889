"""lloyd_kmeans / cluster_balance (pipeline/kmeans.py): value-checked
against a pure-Python decimal-exact oracle replaying the same rounds —
seed-by-lowest-id, 6-decimal cosine argmax with smaller-cell tie-break,
DECIMAL(27,18) mean sums — including an empty-cell round, the cache
hygiene contract, and the non-unique-label-id guard (ADVICE r7)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from dudb_spark.pipeline.kmeans import cluster_balance, lloyd_kmeans

# values chosen exactly representable in binary AND short decimal, so
# double->DECIMAL(27,18) casts agree bit-for-bit between engines
_VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.0, 1.0, 0.0]),
    (2, [1.0, 0.0, 0.0]),     # duplicate of seed 0 -> cell 2 empties
    (3, [0.75, 0.25, 0.0]),
    (4, [0.0, 0.875, 0.125]),
    (5, [0.5, 0.5, 0.0]),
    (6, [0.0625, 0.9375, 0.0]),
    (7, [0.875, 0.125, 0.25]),
]


def _py_lloyd(vecs, k, iters):
    """Decimal-exact replay of lloyd_kmeans' contract."""

    def cos6(v, c):
        d = sum(x * y for x, y in zip(v, c))
        nv = sum(x * x for x in v) ** 0.5
        nc = sum(y * y for y in c) ** 0.5
        return round(d / (nv * nc), 6)

    def argmax(v, cents):
        return max(
            ((cos6(v, c), -j) for j, c in enumerate(cents))
        )[1] * -1

    cents = [list(v) for _, v in sorted(vecs)[:k]]
    for _ in range(iters):
        cells = {}
        for i, v in vecs:
            cells.setdefault(argmax(v, cents), []).append(v)
        q = Decimal("1e-18")
        cents = []
        for cell in sorted(cells):
            mem = cells[cell]
            cents.append([
                float(
                    sum(
                        Decimal(repr(v[i])).quantize(q, ROUND_HALF_UP)
                        for v in mem
                    )
                ) / len(mem)
                for i in range(len(mem[0]))
            ])
    assign = {i: argmax(v, cents) for i, v in vecs}
    return assign, cents


def test_lloyd_matches_decimal_oracle_with_empty_cell(spark):
    """3 rounds, k=3, with cell 2 emptying in round 1 (vec 2 duplicates
    seed 0, ties break to the smaller cell) — assignments and centroids
    must equal the pure-Python decimal replay exactly."""
    emb = spark.createDataFrame(
        _VECS, "vec_id long, embedding array<double>"
    )
    assigned, cents = lloyd_kmeans(emb, k=3, iters=3)
    want_assign, want_cents = _py_lloyd(_VECS, 3, 3)
    got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert got == want_assign
    assert len(cents) < 3  # the duplicate seed emptied a cell
    assert cents == want_cents  # exact doubles, not approx


def test_lloyd_seed_validation_raises(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="non-null"):
        lloyd_kmeans(emb, k=2, iters=1)
    ragged = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dimensionality"):
        lloyd_kmeans(ragged, k=2, iters=1)


def test_cluster_balance_unpersists_and_sums(spark):
    emb = spark.createDataFrame(
        _VECS, "vec_id long, embedding array<double>"
    )
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = cluster_balance(emb, k=3, iters=2)
    rows = out.collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before  # no leaked cache (ADVICE r7)
    assert sum(r["n_vecs"] for r in rows) == len(_VECS)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-5
    # repeated calls must not accumulate executor storage
    cluster_balance(emb, k=3, iters=2).collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before


def test_cluster_balance_duplicate_label_ids_not_inflated(spark):
    emb = spark.createDataFrame(
        _VECS, "vec_id long, embedding array<double>"
    )
    lab_rows = [(i, v, "even" if i % 2 == 0 else "odd") for i, v in _VECS]
    # duplicate id 3 with a second label row: without the guard the join
    # would double-count vector 3
    lab_rows.append((3, [0.75, 0.25, 0.0], "odd"))
    lab = spark.createDataFrame(
        lab_rows, "vec_id long, embedding array<double>, lab string"
    )
    plain = {
        r["cell"]: r["n_vecs"]
        for r in cluster_balance(emb, k=3, iters=2).collect()
    }
    labeled = cluster_balance(
        lab.dropDuplicates(["vec_id"]), k=3, iters=2, label_col="lab"
    )
    got = {r["cell"]: r["n_vecs"] for r in labeled.collect()}
    assert got == plain
    # and even with the raw duplicated frame, counts stay un-inflated
    got2 = {
        r["cell"]: r["n_vecs"]
        for r in cluster_balance(lab, k=3, iters=2, label_col="lab")
        .collect()
    }
    assert sum(got2.values()) == sum(plain.values()) + 1  # 9 unique rows


def test_cluster_balance_empty_frame_raises(spark):
    """An empty embeddings frame must fail loudly at the boundary (like
    lloyd_kmeans' seed/mean validations), not emit NULL shares."""
    import pytest

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no seed vectors"):
        cluster_balance(empty, k=3, iters=1)
