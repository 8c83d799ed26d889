"""As-of join: brute-force oracle equality + plan shape.

The Python oracle restates the semantics directly: for each left row, the
latest (earliest, for forward) right row per key passing the timestamp
comparison.  Hypothesis drives random event sets through both.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dudb_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _oracle(left, right, direction, strict):
    # right already reduced to one row per (key, ts) with max value
    best = {}
    for k, ts, v in right:
        cur = best.setdefault((k, ts), v)
        if v > cur:
            best[(k, ts)] = v
    out = []
    for k, lts, lid in left:
        cands = []
        for (rk, rts), v in best.items():
            if rk != k:
                continue
            if direction == "backward":
                ok = rts < lts if strict else rts <= lts
            else:
                ok = rts > lts if strict else rts >= lts
            if ok:
                cands.append((rts, v))
        if not cands:
            out.append((lid, None, None))
        elif direction == "backward":
            rts, v = max(cands)
            out.append((lid, rts, v))
        else:
            rts, v = min(cands)
            out.append((lid, rts, v))
    return sorted(out, key=lambda r: r[0])


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
    st.sampled_from(["backward", "forward"]),
    st.booleans(),
)
def test_asof_matches_bruteforce(spark, lrows, rrows, direction, strict):
    left = [
        (k, T0 + dt.timedelta(minutes=m), i)
        for i, (k, m, _) in enumerate(lrows)
    ]
    right = [
        (k, T0 + dt.timedelta(minutes=m), float(v)) for k, m, v in rrows
    ]
    ldf = _mk(spark, [(k, t, i) for k, t, i in left], ["key", "ts", "lid"])
    rdf = _mk(spark, right or [(0, T0, 0.0)], ["key", "ts", "val"])
    if not right:
        rdf = rdf.where(F.lit(False))
    got = sorted(
        (r.lid, r.ts_right, r.val)
        for r in asof_join(
            ldf, rdf, on="key", ts="ts", direction=direction, strict=strict
        ).collect()
    )
    want = _oracle(
        [(k, t, i) for k, t, i in left],
        [(k, t, v) for k, t, v in right],
        direction,
        strict,
    )
    assert got == want


def test_asof_single_shuffle(spark):
    """The plan must shuffle ONCE on the key (union + window), never a
    range join — at scale a hot key degrades to a big sort, not a
    quadratic pair explosion."""
    ldf = spark.range(100).select(
        (F.col("id") % 5).alias("key"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    rdf = spark.range(50).select(
        (F.col("id") % 5).alias("key"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        (F.col("id") * 1.5).alias("val"),
    )
    plan = (
        asof_join(ldf, rdf, on="key", ts="ts", right_unique=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_colliding_right_columns_get_suffixed(spark):
    """A right value column sharing a left column's name must come back
    as <name>_right, never as a duplicate output name (ADVICE r1)."""
    import pytest

    ldf = _mk(spark, [(1, T0, 1.0)], ["key", "ts", "val"])
    rdf = _mk(spark, [(1, T0, 9.0)], ["key", "ts", "val"])
    out = asof_join(ldf, rdf, on="key", ts="ts")
    assert out.columns.count("val") == 1
    assert "val_right" in out.columns
    row = out.first()
    assert row["val"] == 1.0 and row["val_right"] == 9.0
    # unresolvable: left already owns both val and val_right
    ldf2 = _mk(spark, [(1, T0, 1.0, 2.0)], ["key", "ts", "val", "val_right"])
    with pytest.raises(ValueError, match="collides"):
        asof_join(ldf2, rdf, on="key", ts="ts")


def test_interval_join_rejects_shared_names(spark):
    import pytest

    from dudb_spark.operators.rangejoin import interval_join

    pts = _mk(spark, [(1, T0, 1.0)], ["pid", "ts", "val"])
    ivs = _mk(spark, [(1, T0, T0, 2.0)], ["iid", "lo", "hi", "val"])
    with pytest.raises(ValueError, match="both"):
        interval_join(pts, ivs)


def test_asof_keeps_left_rows(spark):
    ldf = _mk(
        spark,
        [(1, T0, 10), (2, T0, 20)],
        ["key", "ts", "lid"],
    )
    rdf = _mk(spark, [(1, T0, 5.0)], ["key", "ts", "val"])
    rows = {
        r.lid: (r.ts_right, r.val)
        for r in asof_join(ldf, rdf, on="key", ts="ts").collect()
    }
    assert rows[10] == (T0, 5.0)  # inclusive backward sees the equal-ts row
    assert rows[20] == (None, None)  # unmatched key survives with NULLs
