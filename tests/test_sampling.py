"""Hash sampling: determinism, subset consistency, rate accuracy, and a
no-shuffle plan contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from dudb_spark.pipeline.sampling import (
    hash_sample,
    sample_hash,
    stratified_hash_sample,
)


def test_deterministic_and_subset_consistent(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.1).collect()}
    assert a == b  # rerun picks identical rows
    small = {r.doc_id for r in hash_sample(df, "doc_id", 0.01).collect()}
    assert small <= a  # 1% sample is a subset of the 10% sample
    # rate lands near the target (hash uniformity)
    assert 0.08 <= len(a) / 20_000 <= 0.12
    assert 0.005 <= len(small) / 20_000 <= 0.02


def test_negative_ids_sample_at_rate(spark):
    """% follows the dividend's sign in Spark, so pre-pmod a negative id
    landed in a negative bucket and was kept at EVERY rate; pmod keeps the
    coordinate in [0, 1e6) over the full bigint domain (ADVICE r1)."""
    df = spark.range(-20_000, 0).withColumnRenamed("id", "doc_id")
    kept = hash_sample(df, "doc_id", 0.1).count()
    assert 0.07 <= kept / 20_000 <= 0.13
    # the coordinate itself is never negative
    mins = (
        spark.range(-1000, 1000)
        .select(F.min(sample_hash(F.col("id"))).alias("m"))
        .first()
    )
    assert mins["m"] >= 0


def test_salt_decorrelates(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id for r in hash_sample(df, "doc_id", 0.1, salt=1).collect()}
    b = {r.doc_id for r in hash_sample(df, "doc_id", 0.1, salt=2).collect()}
    overlap = len(a & b) / max(len(a | b), 1)
    assert overlap < 0.2  # independent samples share ~rate of rows


def test_stratified_rates(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    got = stratified_hash_sample(
        df, "doc_id", "lang", {"en": 0.05, "de": 0.5}, default_rate=0.0
    )
    counts = {r.lang: r.c for r in got.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert counts.get("fr", 0) == 0
    assert 0.03 <= counts["en"] / 10_000 <= 0.07
    assert 0.45 <= counts["de"] / 10_000 <= 0.55


def test_sample_is_shuffle_free(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    plan = (
        hash_sample(df, "doc_id", 0.1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_sql_restatement_matches(spark):
    import duckdb

    from dudb_spark.pipeline.sampling import sample_hash_sql

    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    got = sorted(
        r.doc_id
        for r in df.where(sample_hash(F.col("doc_id"), salt=7) < 100_000).collect()
    )
    want = [
        r[0]
        for r in duckdb.sql(
            "SELECT i FROM range(5000) t(i) "
            f"WHERE {sample_hash_sql('i', salt=7)} < 100000 ORDER BY i"
        ).fetchall()
    ]
    assert got == want


def test_mixture_sample_hits_target_ratios(spark):
    from dudb_spark.pipeline.sampling import mixture_sample

    df = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 4)).alias("source"),
    )
    # equal 10k-per-source input; want s0:s1:s2 at 1:2:2, s3 dropped
    got = mixture_sample(
        df, "doc_id", "source", {"s0": 1.0, "s1": 2.0, "s2": 2.0}
    )
    counts = {
        r.source: r.c
        for r in got.groupBy("source").agg(F.count("*").alias("c")).collect()
    }
    assert "s3" not in counts
    # binding sources (s1, s2 at w=2 need 2*scale=10k each -> rate 1.0)
    assert counts["s1"] == 10_000 and counts["s2"] == 10_000
    # s0 sampled at ~0.5
    assert 0.45 <= counts["s0"] / 10_000 <= 0.55
    # deterministic
    again = mixture_sample(
        df, "doc_id", "source", {"s0": 1.0, "s1": 2.0, "s2": 2.0}
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_reservoir_per_group_contract(spark):
    from dudb_spark.pipeline.sampling import reservoir_per_group

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(300)], ["id", "grp"]
    )
    from pyspark.sql import functions as F

    k5 = reservoir_per_group(df, "id", "grp", 5)
    per = {r["grp"]: r["n"] for r in
           k5.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    # determinism + subset consistency: k=5 sample is a subset of k=8
    ids5 = {(r["grp"], r["id"]) for r in k5.collect()}
    ids8 = {(r["grp"], r["id"])
            for r in reservoir_per_group(df, "id", "grp", 8).collect()}
    assert ids5 < ids8


def test_assign_split_partitions_and_ratios(spark):
    import pytest

    from dudb_spark.pipeline.sampling import assign_split

    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    res = assign_split(df, "doc_id", w, salt=7)
    counts = {r["split"]: r["n"] for r in
              res.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 20_000  # every row exactly one split
    for name, frac in w.items():
        assert abs(counts.get(name, 0) / 20_000 - frac) < 0.01, counts
    # stability: a row's split never depends on the rest of the corpus
    sub = assign_split(df.where("doc_id < 1000"), "doc_id", w, salt=7)
    full = {r["doc_id"]: r["split"] for r in res.where("doc_id < 1000").collect()}
    assert all(full[r["doc_id"]] == r["split"] for r in sub.collect())
    with pytest.raises(ValueError):
        assign_split(df, "doc_id", {"train": 0.5, "val": 0.4}, salt=7)


def _hamilton(counts: dict[str, int], budget: int) -> dict[str, int]:
    n = sum(counts.values())
    base = {s: (c * budget) // n for s, c in counts.items()}
    rem = {s: (c * budget) % n for s, c in counts.items()}
    left = budget - sum(base.values())
    order = sorted(counts, key=lambda s: (-rem[s], -counts[s], s))
    for s in order[:left]:
        base[s] += 1
    return base


def test_largest_remainder_quotas_match_python(spark):
    from dudb_spark.pipeline.sampling import largest_remainder_quotas

    counts = {"a": 7, "b": 13, "c": 29, "d": 2, "e": 49}
    rows = [(f"{s}{i}", s) for s, c in counts.items() for i in range(c)]
    df = spark.createDataFrame(rows, "id string, src string")
    for budget in (0, 1, 17, 50, 99, 100):
        got = {r["stratum"]: r["quota"]
               for r in largest_remainder_quotas(df, "src", budget).collect()}
        assert got == _hamilton(counts, budget), budget
        assert sum(got.values()) == budget


def test_stratified_exact_sample_properties(spark):
    import pytest

    from dudb_spark.pipeline.sampling import stratified_exact_sample

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7).cast("string")).alias("src"),
    )
    sel = stratified_exact_sample(df, "doc_id", "src", 123, salt=3)
    rows = sel.collect()
    assert len(rows) == 123  # EXACTLY the budget
    per = {}
    for r in rows:
        per.setdefault(r["src"], []).append(r["doc_id"])
    for src, ids in per.items():
        quota = next(r["quota"] for r in rows if r["src"] == src)
        assert len(ids) == quota
    # rerun-stable under repartitioning: identical selected SET
    again = stratified_exact_sample(
        df.repartition(13, "doc_id"), "doc_id", "src", 123, salt=3
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in rows
    )
    # infeasible budget is an error, not a silent truncation
    with pytest.raises(ValueError):
        stratified_exact_sample(df, "doc_id", "src", 1001)


def test_stratified_exact_sample_group_limit_plan(spark):
    # the constant rn <= max(quota) bound must reach a group-limit
    # prune so the per-stratum sort shuffles at most max_q rows per
    # input partition
    from dudb_spark.pipeline.sampling import stratified_exact_sample

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("src"),
    )
    plan = stratified_exact_sample(
        df, "doc_id", "src", 50, salt=1
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_temperature_quotas_flatten_and_cap(spark):
    import math

    from dudb_spark.pipeline.sampling import (
        temperature_quotas,
        temperature_sample,
    )

    counts = {"big": 900, "mid": 90, "tiny": 10}
    rows, nxt = [], 0
    for s, c in counts.items():
        for _ in range(c):
            rows.append((nxt, s))
            nxt += 1
    df = spark.createDataFrame(rows, "id long, src string")
    got = {r["stratum"]: r for r in
           temperature_quotas(df, "src", 100, alpha=0.5).collect()}
    # python replay of the weighted Hamilton step
    w = {s: math.floor(math.sqrt(c) * 1_000_000) for s, c in counts.items()}
    W = sum(w.values())
    base = {s: (wv * 100) // W for s, wv in w.items()}
    rem = {s: (wv * 100) % W for s, wv in w.items()}
    left = 100 - sum(base.values())
    for s in sorted(counts, key=lambda s: (-rem[s], -w[s], s))[:left]:
        base[s] += 1
    assert {s: r["quota"] for s, r in got.items()} == base
    assert sum(r["quota"] for r in got.values()) == 100
    # temperature flattens: tiny's share ∝ sqrt grows vs proportional
    assert got["tiny"]["quota"] > 10 * 100 // 1000
    assert got["big"]["quota"] < 900 * 100 // 1000
    # capping: a budget that over-allocates tiny reports the shortfall
    big = {r["stratum"]: r for r in
           temperature_quotas(df, "src", 600, alpha=0.5).collect()}
    assert big["tiny"]["quota"] > 10
    assert big["tiny"]["capped"] == 10
    assert (big["tiny"]["shortfall"]
            == big["tiny"]["quota"] - 10 > 0)
    sel = temperature_sample(df, "id", "src", 600, alpha=0.5).collect()
    assert len(sel) == 600 - sum(r["shortfall"] for r in big.values())
    per = {}
    for r in sel:
        per[r["src"]] = per.get(r["src"], 0) + 1
    assert per["tiny"] == 10  # never more than the population


def test_exact_samplers_refuse_null_strata(spark):
    import pytest

    from dudb_spark.pipeline.sampling import (
        stratified_exact_sample,
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, None), (3, "b")],
        "doc_id long, src string",
    )
    with pytest.raises(ValueError, match="NULL"):
        stratified_exact_sample(df, "doc_id", "src", 2).collect()
    with pytest.raises(ValueError, match="NULL"):
        temperature_sample(df, "doc_id", "src", 2).collect()


# ------------------------------------------------ weighted (A-ES) sampling


def _wdf(spark):
    # 2000 rows: even ids weight 10, odd ids weight 1; ids 0/1 get
    # NULL / non-positive weights to pin the exclusion contract
    return spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 0, F.lit(None).cast("double"))
        .when(F.col("id") == 1, F.lit(-5.0))
        .when(F.col("id") % 2 == 0, F.lit(10.0))
        .otherwise(F.lit(1.0))
        .alias("w"),
        (F.col("id") % 4).alias("grp"),
    )


def test_weighted_sample_size_determinism_and_monotonicity(spark):
    from dudb_spark.pipeline.sampling import weighted_sample

    df = _wdf(spark)
    a = {r.doc_id for r in weighted_sample(df, "doc_id", "w", 200).collect()}
    b = {r.doc_id for r in
         weighted_sample(df.repartition(13), "doc_id", "w", 200).collect()}
    assert len(a) == 200 and a == b  # rerun + repartition stable
    small = {r.doc_id for r in
             weighted_sample(df, "doc_id", "w", 50).collect()}
    assert small <= a  # top-n keys: growing n only adds rows
    assert 0 not in a and 1 not in a  # NULL / non-positive excluded


def test_weighted_sample_respects_weights(spark):
    from dudb_spark.pipeline.sampling import weighted_sample

    df = _wdf(spark)
    sel = weighted_sample(df, "doc_id", "w", 200).collect()
    heavy = sum(1 for r in sel if r.w == 10.0)
    # 10:1 weights on a 50/50 population: expected heavy share ≈ 0.9
    # for early draws; even after without-replacement depletion the
    # 200-draw share stays far above parity
    assert heavy >= 150, heavy


def test_weighted_sample_takes_all_when_short(spark):
    from dudb_spark.pipeline.sampling import weighted_sample

    df = _wdf(spark).where("doc_id < 10")
    sel = weighted_sample(df, "doc_id", "w", 200).collect()
    # 8 positive-weight rows exist (0 NULL, 1 negative)
    assert sorted(r.doc_id for r in sel) == [2, 3, 4, 5, 6, 7, 8, 9]


def test_weighted_sample_plan_contracts(spark):
    from dudb_spark.pipeline.sampling import weighted_sample

    df = _wdf(spark)
    gplan = weighted_sample(df, "doc_id", "w", 25)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in gplan, gplan
    grp = weighted_sample(df, "doc_id", "w", 25, group_col="grp")
    pplan = grp._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in pplan and "Partial" in pplan, pplan
    per = {r["grp"]: r["cnt"] for r in
           grp.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert per == {0: 25, 1: 25, 2: 25, 3: 25}


def test_weighted_sample_duckdb_lockstep(spark):
    import pytest
    duckdb = pytest.importorskip("duckdb")
    from dudb_spark.pipeline.sampling import aes_key_sql, weighted_sample

    df = _wdf(spark)
    got = sorted(
        r.doc_id for r in weighted_sample(df, "doc_id", "w", 120,
                                          salt=7).collect()
    )
    con = duckdb.connect()
    con.register("src", df.toPandas())
    key = aes_key_sql("doc_id", "w", salt=7)
    want = sorted(
        r[0] for r in con.execute(f"""
            SELECT doc_id FROM src
            WHERE w IS NOT NULL AND w > 0
            ORDER BY {key} DESC, doc_id
            LIMIT 120
        """).fetchall()
    )
    assert got == want


# ------------------------------------------- weighted-mass exact sampling


def test_weighted_mass_quotas_exact_and_capped(spark):
    from dudb_spark.pipeline.sampling import weighted_mass_quotas

    # stratum a: 3 rows of mass 300; b: 30 rows of mass 60; c: one
    # huge-mass row that forces quota > population (capped + shortfall)
    rows = [(i, "a", 100) for i in range(3)]
    rows += [(100 + i, "b", 2) for i in range(30)]
    rows += [(200, "c", 640)]
    rows += [(201, "c", None), (202, "a", -7)]  # massless, excluded
    df = spark.createDataFrame(rows, "doc_id long, s string, w long")
    q = {r["stratum"]: r for r in
         weighted_mass_quotas(df, "s", "w", 10).collect()}
    assert sum(r["quota"] for r in q.values()) == 10
    assert q["a"]["w_mass"] == 300 and q["b"]["w_mass"] == 60
    assert q["c"]["quota"] > 1 and q["c"]["capped"] == 1
    assert q["c"]["shortfall"] == q["c"]["quota"] - 1
    assert q["a"]["n_rows"] == 3  # the negative-weight row carries none


def test_weighted_exact_sample_contract_and_guards(spark):
    from dudb_spark.pipeline.sampling import (
        weighted_exact_sample,
        weighted_mass_quotas,
    )

    rows = [(i, "a" if i < 40 else "b", (i % 5 + 1) * 10)
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, s string, w long")
    sel = weighted_exact_sample(df, "doc_id", "s", "w", 30, salt=3)
    got = sel.collect()
    q = {r["stratum"]: r for r in
         weighted_mass_quotas(df, "s", "w", 30).collect()}
    per = {}
    for r in got:
        per[r["s"]] = per.get(r["s"], 0) + 1
    assert per == {s: q[s]["capped"] for s in per}
    assert len(got) == 30 - sum(r["shortfall"] for r in q.values())
    # rerun + repartition stable
    again = weighted_exact_sample(
        df.repartition(7), "doc_id", "s", "w", 30, salt=3
    ).collect()
    assert sorted(r["doc_id"] for r in again) == \
        sorted(r["doc_id"] for r in got)

    import pytest as _pt
    with _pt.raises(ValueError, match="NULL"):
        weighted_exact_sample(
            df.withColumn("s", F.when(F.col("doc_id") < 5, None)
                          .otherwise(F.col("s"))),
            "doc_id", "s", "w", 10)
    with _pt.raises(ValueError, match="fractional"):
        weighted_exact_sample(
            df.withColumn("w", F.col("w") + 0.5), "doc_id", "s", "w", 10)
    with _pt.raises(ValueError, match="overflow"):
        weighted_exact_sample(
            df.withColumn("w", F.col("w") * F.lit(1 << 40)),
            "doc_id", "s", "w", 1 << 22)


def test_weighted_exact_sample_duckdb_lockstep(spark):
    import pytest as _pt
    duckdb = _pt.importorskip("duckdb")
    from dudb_spark.pipeline.sampling import (
        aes_key_sql,
        weighted_exact_sample,
        weighted_mass_quotas_sql,
    )

    rows = [(i, "s" + str(i % 4), (i % 7 + 1) * 3) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, s string, w long")
    got = sorted(
        r["doc_id"]
        for r in weighted_exact_sample(df, "doc_id", "s", "w", 50,
                                       salt=9).collect()
    )
    con = duckdb.connect()
    con.register("src", df.toPandas())
    cte = weighted_mass_quotas_sql("src", "s", "w", 50)
    key = aes_key_sql("doc_id", "w", salt=9)
    want = sorted(r[0] for r in con.execute(f"""
        WITH {cte}
        SELECT doc_id FROM (
            SELECT p.doc_id, q.capped,
                   ROW_NUMBER() OVER (
                       PARTITION BY p.s ORDER BY {key} DESC, p.doc_id
                   ) AS rn
            FROM wpos p JOIN quotas q ON q.stratum = p.s
        ) WHERE rn <= capped
    """).fetchall())
    assert got == want
