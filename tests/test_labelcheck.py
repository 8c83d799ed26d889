"""kNN label-noise detection (pipeline/labelcheck.py): planted-noise
recovery, singleton-cell semantics, determinism, and the bounded
neighbor contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline.labelcheck import knn_label_noise


def _vec(x, y):
    return [float(x), float(y), 0.0, 0.0]


@pytest.fixture(scope="module")
def planted(spark):
    """Two tight clusters far apart: ids 0-9 near (1,0) labeled 0,
    ids 10-19 near (0,1) labeled 1 — except id 7 which sits in the
    first cluster but carries label 1 (the planted mislabel)."""
    rows = []
    for i in range(10):
        rows.append((i, _vec(1.0 + 0.01 * i, 0.02 * i), 1 if i == 7 else 0))
    for i in range(10, 20):
        rows.append((i, _vec(0.02 * (i - 10), 1.0 + 0.01 * (i - 10)), 1))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_planted_mislabel_is_flagged(spark, planted):
    out = knn_label_noise(planted, k=5, n_clusters=2).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 20  # one row per input vector
    flagged = {r["vec_id"] for r in out if r["noise_candidate"]}
    assert 7 in flagged
    # clean points in both clusters are not flagged
    assert flagged <= {7}
    # the planted point's neighbor majority is the true cluster label
    assert by_id[7]["maj_label"] == 0
    assert by_id[7]["n_agree"] == 0  # none of its neighbors share label 1


def test_neighbor_counts_bounded_by_k(spark, planted):
    out = knn_label_noise(planted, k=3, n_clusters=2).collect()
    assert all(r["n_neighbors"] <= 3 for r in out)
    assert all(r["n_agree"] <= r["n_neighbors"] for r in out)


def test_singleton_cell_never_flagged(spark):
    """A point alone in its quantizer cell has no neighbors: NULL
    majority, zero counts, and noise_candidate=false (absence of
    evidence is not noise)."""
    rows = [
        # direction-opposed singleton FIRST: the quantizer seeds
        # centroids from the lowest ids, so id 0 anchors its own cell
        # (cosine assignment is directional)
        (0, _vec(-50.0, -50.0), 9),
        (1, _vec(1.0, 0.0), 0),
        (2, _vec(1.01, 0.0), 0),
        (3, _vec(1.0, 0.01), 0),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r for r in knn_label_noise(df, k=5, n_clusters=2).collect()}
    lone = out[0]
    assert lone["n_neighbors"] == 0
    assert lone["maj_label"] is None
    assert lone["noise_candidate"] is False


def test_deterministic_under_repartition(spark, planted):
    a = sorted(
        knn_label_noise(planted, k=5, n_clusters=2).collect(),
        key=lambda r: r["vec_id"],
    )
    b = sorted(
        knn_label_noise(planted.repartition(5), k=5, n_clusters=2).collect(),
        key=lambda r: r["vec_id"],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_majority_tie_breaks_to_smaller_label(spark):
    """A point with an even split among neighbor labels must take the
    smaller label deterministically (both engines' ORDER BY n DESC,
    label ASC)."""
    # one probe at the origin-ish point, two neighbors labeled 5, two
    # labeled 3, all equidistant-ish within one cell
    rows = [
        (0, _vec(1.0, 1.0), 7),
        (1, _vec(1.1, 1.0), 5),
        (2, _vec(1.0, 1.1), 5),
        (3, _vec(0.9, 1.0), 3),
        (4, _vec(1.0, 0.9), 3),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r for r in knn_label_noise(df, k=4, n_clusters=1).collect()}
    assert out[0]["maj_label"] == 3
    assert out[0]["noise_candidate"] is True


def test_knn_plan_prunes_topk_before_shuffle(spark, planted):
    """The row_number<=k filter must compile to WindowGroupLimit (the
    q07 contract) so each partition keeps only its top-k candidate
    neighbors before the window shuffle."""
    plan = (
        knn_label_noise(planted, k=5, n_clusters=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
