"""Seeded fuzz for the sketch family: random grouped multisets (skewed
sizes, duplicates, degenerate single-item groups, adversarial all-zero
high bits) folded in ONE Spark job and compared against pure-Python
restatements of HLL and CMS, plus a DuckDB lockstep pass over the same
frame — three independent implementations must agree."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline.sketch import (
    cms_cells,
    cms_estimate,
    cms_estimate_sql,
    cms_sql_cte,
    hll_distinct,
    hll_sql_cte,
)

M31 = (1 << 31) - 1


def _py_hll(hashes, p=8, hash_bits=31):
    """Pure-Python restatement of hll_registers + hll_estimate."""
    m = 1 << p
    width = hash_bits - p
    regs = {}
    for h in hashes:
        r = h % m
        w = h // m
        rho = width + 1 if w == 0 else width - (w.bit_length() - 1)
        regs[r] = max(regs.get(r, 0), rho)
    s = sum(2.0 ** -v for v in regs.values()) + (m - len(regs))
    v = m - len(regs)
    if m <= 16:
        alpha = 0.673
    elif m <= 32:
        alpha = 0.697
    elif m <= 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    space = float(1 << hash_bits)
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    elif e > space / 30.0:
        e = -space * math.log(1.0 - e / space)
    return e


def _py_cms(hashes, d=4, w=1024):
    """Pure-Python restatement of cms_cells."""
    A = (131, 137, 139, 149)
    B = (17, 19, 23, 29)
    cells = {}
    for h in hashes:
        for j in range(d):
            b = ((h * A[j] + B[j]) % M31) % w
            cells[(j, b)] = cells.get((j, b), 0) + 1
    return cells


def _gen_groups(rnd: random.Random, n_groups: int = 40):
    """Adversarial multisets: tiny groups, heavy duplication, hashes
    with zeroed high bits (w == 0 forces the rho = width+1 branch) and
    near-boundary values."""
    out = []
    for g in range(n_groups):
        kind = rnd.choice(["tiny", "dups", "lowbits", "mixed", "big"])
        if kind == "tiny":
            vals = [rnd.randrange(M31) for _ in range(rnd.choice([1, 2, 3]))]
        elif kind == "dups":
            base = [rnd.randrange(M31) for _ in range(5)]
            vals = [rnd.choice(base) for _ in range(200)]
        elif kind == "lowbits":
            # register bits only: w == 0 for every item
            vals = [rnd.randrange(256) for _ in range(50)]
        elif kind == "big":
            vals = [rnd.randrange(M31) for _ in range(2000)]
        else:
            vals = [rnd.choice([0, 1, 255, 256, M31 - 1, rnd.randrange(M31)])
                    for _ in range(100)]
        out += [(g, v) for v in vals]
    return out


def test_hll_fuzz_vs_python_model(spark):
    rnd = random.Random(20260816)
    rows = _gen_groups(rnd)
    df = spark.createDataFrame(rows, ["g", "h"])
    got = {
        r["g"]: r["est_distinct"]
        for r in hll_distinct(df, ["g"], "h", p=8).collect()
    }
    by_group = {}
    for g, h in rows:
        by_group.setdefault(g, []).append(h)
    assert set(got) == set(by_group)
    for g, hs in by_group.items():
        want = _py_hll(hs)
        assert abs(got[g] - want) <= 1e-4, (g, got[g], want)


def test_hll_fuzz_duckdb_lockstep(spark):
    duckdb = pytest.importorskip("duckdb")
    rnd = random.Random(20260817)
    rows = _gen_groups(rnd, n_groups=25)
    df = spark.createDataFrame(rows, ["g", "h"])
    got = sorted(
        (r["g"], r["est_distinct"])
        for r in hll_distinct(df, ["g"], "h", p=8).collect()
    )
    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = ("WITH " + hll_sql_cte("SELECT g, h FROM src", "g", "h", p=8)
           + " SELECT grp, est_distinct FROM hll ORDER BY grp")
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want  # bit-exact, no tolerance


def test_cms_fuzz_vs_python_model_and_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    rnd = random.Random(20260818)
    hashes = [rnd.choice([0, 1, M31 - 1, rnd.randrange(M31)])
              for _ in range(3000)]
    df = spark.createDataFrame([(h,) for h in hashes], ["h"])
    cells = cms_cells(df, "h", d=4, w=256)
    got_cells = {(r["j"], r["bucket"]): r["cnt"] for r in cells.collect()}
    assert got_cells == _py_cms(hashes, d=4, w=256)

    cand = df.groupBy("h").agg(F.count(F.lit(1)).alias("exact"))
    est_rows = cms_estimate(cand, cells, "h", d=4, w=256).collect()
    # invariant: never underestimates
    assert all(r["est_count"] >= r["exact"] for r in est_rows)
    got_est = sorted((r["h"], r["est_count"]) for r in est_rows)

    con = duckdb.connect()
    con.register("src", df.toPandas())
    sql = ("WITH " + cms_sql_cte("SELECT h FROM src", "h", d=4, w=256)
           + ", cand AS (SELECT h FROM src GROUP BY h) SELECT h, "
           + cms_estimate_sql("h", d=4, w=256) + " AS e FROM cand")
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got_est == want
