"""Exact grouped quantiles from order statistics: bit-parity with the
built-in exact percentile aggregate, without its group-sized buffer."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dudb_spark.operators.quantiles import grouped_quantiles
from dudb_spark.plans import plan_of


def _builtin(df, ps):
    return (
        df.where(F.col("v").isNotNull())
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.expr(f"percentile(v, {p}d)").alias(f"q{int(round(p*100))}")
                for p in ps
            ],
        )
    )


def test_matches_builtin_percentile(spark):
    rnd = random.Random(5)
    rows = [
        (f"g{i % 7}", rnd.uniform(-100, 100)) for i in range(3000)
    ]
    # edge groups: singleton, pair, and a group with heavy ties
    rows += [("solo", 42.0), ("pair", 1.0), ("pair", 2.0)]
    rows += [("ties", float(x)) for x in [5, 5, 5, 5, 9]]
    df = spark.createDataFrame(rows, ["g", "v"])
    ps = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]

    got = {
        r["g"]: tuple(r)[1:]
        for r in grouped_quantiles(df, ["g"], "v", ps).collect()
    }
    want = {r["g"]: tuple(r)[1:] for r in _builtin(df, ps).collect()}
    assert set(got) == set(want)
    for g in want:
        assert got[g] == want[g], g  # bit-exact, including interpolation


def test_quantiles_fuzz_matches_builtin(spark):
    """Randomized group shapes/sizes/duplicates: operator == builtin on
    every seed (deterministic seeds keep the runtime bounded)."""
    for seed in (11, 77, 303):
        rnd = random.Random(seed)
        rows = []
        for g in range(rnd.randint(1, 6)):
            n = rnd.randint(1, 40)
            vals = [
                float(rnd.choice([rnd.uniform(-5, 5), rnd.randint(-3, 3)]))
                for _ in range(n)
            ]
            rows += [(f"g{g}", v) for v in vals]
        ps = sorted(rnd.sample([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0], 3))
        df = spark.createDataFrame(rows, ["g", "v"])
        got = {
            r["g"]: tuple(r)[1:]
            for r in grouped_quantiles(df, ["g"], "v", ps).collect()
        }
        want = {r["g"]: tuple(r)[1:] for r in _builtin(df, ps).collect()}
        assert got == want, f"seed {seed}"


def test_nulls_excluded_like_builtin(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], ["g", "v"]
    )
    got = grouped_quantiles(df, ["g"], "v", [0.5]).collect()[0]
    assert got["n_rows"] == 2 and got["q50"] == 2.0


def _unpartitioned_windows(df):
    """Optimized-plan Window nodes with no partition spec (the
    single-task shape): ``Window [exprs], [order]`` — one ``], [``
    separator instead of a partitioned node's two."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return [
        ln
        for ln in plan.splitlines()
        if ln.lstrip(" +-:").startswith("Window [")
        and ln.lstrip(" +-:").count("], [") < 2
    ]


def test_global_quantiles_match_builtin(spark):
    """group_cols=[] (corpus-wide quantiles): bit-parity with the global
    builtin percentile, via the two-phase range-partitioned rank."""
    rnd = random.Random(9)
    rows = [("x", rnd.uniform(-50, 50)) for _ in range(2500)]
    rows += [("x", 7.0)] * 5  # heavy ties
    df = spark.createDataFrame(rows, ["g", "v"])
    ps = [0.0, 0.1, 0.5, 0.75, 0.99, 1.0]
    got = tuple(grouped_quantiles(df, [], "v", ps).collect()[0])
    want = tuple(
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.expr(f"percentile(v, {p}d)").alias(f"q{int(round(p*100))}")
                for p in ps
            ],
        ).collect()[0]
    )
    assert got == want


def test_constant_group_key_routes_to_two_phase(spark):
    """A literal group key constant-folds out of the window spec; the
    operator must detect that and rank via the two-phase path — same
    numbers, zero unpartitioned WindowExec in the plan (the round-6
    q116 scale-killer)."""
    rnd = random.Random(13)
    df = spark.createDataFrame(
        [(rnd.uniform(0, 1),) for _ in range(1200)], ["v"]
    ).withColumn("_g", F.lit(1))
    ps = [0.25, 0.5, 0.9]
    res = grouped_quantiles(df, ["_g"], "v", ps)
    assert _unpartitioned_windows(res) == []
    got = tuple(res.collect()[0])[1:]
    want = tuple(
        df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.expr(f"percentile(v, {p}d)") for p in ps],
        ).collect()[0]
    )
    assert got == want


def test_global_path_plan_has_no_unpartitioned_window(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    assert _unpartitioned_windows(grouped_quantiles(df, [], "v", [0.5])) == []


def test_no_group_buffer_in_plan(spark):
    df = spark.createDataFrame([("a", 1.0)], ["g", "v"])
    p = plan_of(grouped_quantiles(df, ["g"], "v", [0.5, 0.9]))
    # order statistics via window + join — the exact `percentile` agg
    # (group-sized buffer) must NOT appear
    assert "percentile" not in p.lower()
    assert "Window" in p


def test_weighted_quantiles_goldens(spark):
    """Hand-traced: values (1,w1),(2,w1),(10,w8) -> W=10; wq50 crosses
    at 10 (cum 1,2,10), wq10 at 1, wq20 at 2; zero/NULL weights drop;
    equal to the unweighted lower quantile when all weights are 1."""
    from dudb_spark.operators.quantiles import weighted_quantiles

    rows = [("a", 1.0, 1.0, 1), ("a", 2.0, 1.0, 2), ("a", 10.0, 8.0, 3),
            ("a", 99.0, 0.0, 4), ("a", 77.0, None, 5),
            ("b", 5.0, 1.0, 6), ("b", 6.0, 1.0, 7)]
    df = spark.createDataFrame(
        rows, "g string, v double, w double, i long")
    got = {r["g"]: r for r in weighted_quantiles(
        df, ["g"], "v", "w", [0.1, 0.2, 0.5], id_col="i").collect()}
    a = got["a"]
    assert (a["n_rows"], a["total_weight"]) == (3, 10.0)
    assert (a["wq10"], a["wq20"], a["wq50"]) == (1.0, 2.0, 10.0)
    b = got["b"]
    # all weights 1: wq50 = the 1st of 2 values (cum 1 >= 0.5*2)
    assert b["wq50"] == 5.0


def test_rank_normalize_goldens(spark):
    """Min-rank percentiles with ties: values (10,20,20,30) -> smaller
    counts (0,1,1,3)/(n-1)=3; blend is the weighted mean; NULL-signal
    rows drop; monotone rescaling of a signal changes nothing."""
    import pytest
    from pyspark.sql import functions as F

    from dudb_spark.operators.quantiles import rank_normalize

    rows = [(1, 10.0, 5), (2, 20.0, 1), (3, 20.0, 9), (4, 30.0, 3),
            (5, None, 7)]
    df = spark.createDataFrame(rows, "id long, a double, b long")
    got = {r["id"]: (r["a_pct"], r["b_pct"], r["blended"])
           for r in rank_normalize(df, ["a", "b"], "id",
                                   weights=[3.0, 1.0]).collect()}
    assert 5 not in got
    assert got[1][0] == 0.0 and got[4][0] == 1.0
    assert got[2][0] == got[3][0] == pytest.approx(1 / 3, abs=1e-9)
    # b values 5,1,9,3 -> smaller 2,0,3,1 over n-1=3
    assert got[2][1] == 0.0 and got[3][1] == 1.0
    assert got[1][2] == pytest.approx(
        (0.0 * 3 + (2 / 3) * 1) / 4, abs=1e-9)

    # rescale signal a monotonically: percentiles identical
    df2 = df.withColumn("a", F.col("a") * F.col("a"))
    got2 = {r["id"]: r["a_pct"] for r in rank_normalize(
        df2, ["a", "b"], "id", weights=[3.0, 1.0]).collect()}
    assert {k: v[0] for k, v in got.items()} == got2
