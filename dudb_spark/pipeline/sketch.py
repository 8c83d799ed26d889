"""HyperLogLog distinct-count sketch as a pure DataFrame fold.

Exact ``COUNT(DISTINCT x)`` is the classic 100 TB trap: Catalyst plans
it as an Expand + re-shuffle of EVERY distinct value (see
operators/checks.py's approx gate, which exists to route around it).
The sketch path bounds the state instead: each group folds into
``m = 2**p`` registers no matter how many distinct values it holds, so
the shuffle moves O(groups × m) rows and the answer costs two
bounded-key aggregations (Flajolet et al., "HyperLogLog: the analysis
of a near-optimal cardinality estimation algorithm", AofA 2007).

Spark shape / the 100 TB story
------------------------------
- **Register fold**: ``groupBy(group, register).agg(max(rho))`` —
  map-side partial aggregation collapses every partition to
  ≤ groups×m rows before the exchange, so the shuffle is constant in
  the corpus size.  The estimate pass is a second ≤ groups-row agg.
- **No driver state**: registers never collect; the estimator is a
  column expression over the ≤ m-row-per-group register frame.
- **Mergeable by construction**: ``max(rho)`` is associative, so
  per-shard register frames union + re-max into a corpus-wide sketch —
  the property that lets incremental ingest keep running cardinalities
  without re-scanning history.

Cross-engine determinism (the oracle story, same discipline as
pipeline/dsir.py): the production default hashes with ``xxhash64``
(JVM-side, 64-bit); the oracle-certified configuration instead feeds
the engine's Horner token hashes (pipeline/dedup.poly_token_hash_array,
values in [0, 2^31-1)), whose SQL restatement already exists.  Every
arithmetic step is chosen to be bit-reproducible in any IEEE engine:

- ``rho`` is computed with INTEGER comparisons only — never
  ``floor(log2(w))``, whose libm-vs-JVM last-ulp can flip the floor at
  exact powers of two.  ``floor_log2(w) = Σ_k [w >= 2^k]``; the
  register/suffix split itself is an integer ``shiftright`` (a double
  division would round 2^53+ hashes onto the wrong side of a 2^k
  boundary — round-10 ADVICE).
- the harmonic sum adds exact powers of two, and determinism requires
  every PARTIAL sum exact: the terms span exponents ``p-1`` (the
  ≤ m/2 total) down to ``-(width+1)``, i.e. ``hash_bits + 1`` bits, so
  the sum is order-independent iff ``hash_bits <= 52``
  (:data:`_MAX_EXACT_BITS`).  Both shipped hash paths obey it: Horner
  tokens are 31-bit, and the xxhash64 id path folds to 52 bits
  (cli.py cmd_pipeline_cardinality).  Wider hashes still estimate
  correctly but forfeit the bit-determinism claim.
- the two ``ln`` correction branches are the only inexact ops; the
  final estimate is rounded to 4 decimals, 9 orders of magnitude above
  their cross-library last-ulp drift.

The reference engine has no sketches (its distinct-shaped state is the
per-prefix user/group id sets, stats.go); this extends the stats
surface (SURVEY.md §7 step 9) with the cardinality operator a corpus
profiler needs at scales where exact distinct is unpayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# poly_token_hash_array values live in [0, _POLY_M); 2^31 is the
# power-of-two hash-space bound the estimator corrections use
_POLY_BITS = 31

# widest hash for which the harmonic sum's partial sums are all exact
# doubles (p + width + 1 <= 53 for every p) — the order-independence
# bound the module docstring derives; callers wanting bit-determinism
# must fold wider hashes down to this
_MAX_EXACT_BITS = 52

# large-range clamp: ln(1 - raw/space) is undefined once raw reaches
# the hash space (every register saturated); clamp the argument to the
# smallest power of two both engines represent identically.  2^-52 is
# exact in IEEE754 and round-trips through a DuckDB CAST(... AS DOUBLE)
_LN_FLOOR = 2.0 ** -52


def _floor_log2(w: Column, width: int) -> Column:
    """``floor(log2(w))`` for ``w`` in [1, 2**width) via a comparison
    ladder — pure integer arithmetic, no libm."""
    out = F.lit(0)
    for k in range(1, width):
        out = out + (w >= F.lit(1 << k)).cast("int")
    return out


def hll_register(h: Column, p: int) -> Column:
    """Register index: the low ``p`` bits (well, ``h mod 2**p`` — the
    Horner hashes are non-negative so pmod == mod)."""
    return F.pmod(h, F.lit(1 << p)).cast("int")


def hll_rho(h: Column, p: int, hash_bits: int = _POLY_BITS) -> Column:
    """Rank of the first set bit of the remaining ``hash_bits - p`` bits
    (1-based; all-zero suffix ranks ``width + 1``), counted from the
    most significant end as in the paper."""
    width = hash_bits - p
    # integer shift, NOT floor(h / 2^p): the double division rounds
    # longs past 2^53 and can land w on the wrong side of a 2^k
    # boundary (rho off-by-one on wide-hash inputs)
    w = F.shiftright(h.cast("long"), p)
    return (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width) - _floor_log2(w, width))
        .cast("int")
    )


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, group_cols: list[str], hash_col: str, p: int = 8,
    hash_bits: int = _POLY_BITS,
) -> DataFrame:
    """The register fold: ``(group..., reg, rho)`` with rho the max rank
    seen — ≤ groups×m rows, mergeable with further unions + re-max."""
    h = F.col(hash_col)
    return (
        df.select(
            *group_cols,
            hll_register(h, p).alias("reg"),
            hll_rho(h, p, hash_bits).alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    regs: DataFrame, group_cols: list[str], p: int = 8,
    hash_bits: int = _POLY_BITS,
) -> DataFrame:
    """Estimate per group from a register frame: raw harmonic-mean
    estimate with the paper's small-range (linear counting) and
    large-range (hash-collision) corrections, rounded to 4 decimals."""
    m = 1 << p
    space = float(1 << hash_bits)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s_present"),
    )
    s = F.col("_s_present") + (F.lit(m) - F.col("_present"))
    v = (F.lit(m) - F.col("_present")).cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    est = (
        F.when((raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v))
        .when(
            raw > F.lit(space / 30.0),
            # clamp: raw can exceed space when every register saturates
            # (alpha*m*2^(width+1) > 2^hash_bits) — unclamped this is
            # ln of a non-positive number (NaN)
            -F.lit(space)
            * F.log(F.greatest(F.lit(1.0) - raw / F.lit(space),
                               F.lit(_LN_FLOOR))),
        )
        .otherwise(raw)
    )
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def hll_distinct(
    df: DataFrame, group_cols: list[str], hash_col: str, p: int = 8,
    hash_bits: int = _POLY_BITS,
) -> DataFrame:
    """``(group..., est_distinct)`` — the full sketch pipeline: register
    fold + estimator, two bounded-key shuffles total."""
    return hll_estimate(
        hll_registers(df, group_cols, hash_col, p, hash_bits),
        group_cols, p, hash_bits,
    )


# Count-min row constants: bucket_j(h) = ((h*A_j + B_j) mod M) mod w.
# h < 2^31 and A_j <= 149 keep every product far inside int64.
#
# Error contract (Cormode & Muthukrishnan 2005, Thm 1), written down so
# the defaults are a choice, not an accident: with d rows and w buckets,
# the MIN estimate overshoots the true count by more than eps*N with
# probability at most delta, where eps = e/w and delta = e^-d.  At the
# shipped d=4, w=1024 that is eps ~= 0.27% of total stream weight N and
# delta ~= 1.8% — on Zipfian corpora the absolute overshoot on TAIL
# terms is therefore material (q150 prints it per term).  Remedies, in
# order: grow w (error is linear in 1/w; state is d*w cells either
# way), or use :func:`cms_estimate_meanmin` below, which debiases the
# expected collision noise and typically cuts tail error by an order of
# magnitude at the cost of the one-sided (est >= exact) guarantee.
_CMS_A = (131, 137, 139, 149)
_CMS_B = (17, 19, 23, 29)
_CMS_M = (1 << 31) - 1


def cms_bucket(h: Column, j: int, w: int) -> Column:
    """Row-``j`` bucket for a 31-bit item hash."""
    return F.pmod(
        F.pmod(h * F.lit(_CMS_A[j]) + F.lit(_CMS_B[j]), F.lit(_CMS_M)),
        F.lit(w),
    ).cast("int")


def cms_cells(
    df: DataFrame, hash_col: str, d: int = 4, w: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch table ``(j, bucket, cnt)`` — ≤ d×w rows no
    matter how many items flow in (Cormode & Muthukrishnan, "An
    improved data stream summary: the count-min sketch", J.Alg 2005).
    One explode to d rows per item + one bounded-key groupBy whose
    map-side combine collapses every partition to ≤ d×w rows before the
    exchange — the same constant-state shuffle shape as the HLL fold,
    for FREQUENCY instead of cardinality.  ``weight_col`` counts
    pre-aggregated items (e.g. (term, tf) pairs) without re-expansion.
    Mergeable by construction: union + re-sum."""
    h = F.col(hash_col)
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    rows = df.select(
        F.posexplode(
            F.array(*[cms_bucket(h, j, w) for j in range(d)])
        ).alias("j", "bucket"),
        wcol.alias("_w"),
    )
    return rows.groupBy("j", "bucket").agg(F.sum("_w").alias("cnt"))


def cms_estimate(
    items: DataFrame, cells: DataFrame, hash_col: str,
    d: int = 4, w: int = 1024,
) -> DataFrame:
    """Point estimates for candidate items: min over the d row cells —
    always ≥ the true count (the one-sided CMS guarantee).  ``cells``
    is ≤ d×w rows, so the join broadcasts and the estimate is a
    map-side lookup + a per-item min."""
    h = F.col(hash_col)
    probes = items.select(
        "*",
        F.posexplode(
            F.array(*[cms_bucket(h, j, w) for j in range(d)])
        ).alias("j", "bucket"),
    )
    keep = [c for c in items.columns]
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy(*keep)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def cms_estimate_meanmin(
    items: DataFrame, cells: DataFrame, hash_col: str,
    d: int = 4, w: int = 1024,
) -> DataFrame:
    """Count-MEAN-min point estimates (Deng & Rafiei, "New estimation
    algorithms for data streams: count-min can do more", 2007): each
    row's cell count is debiased by the expected collision noise,
    ``est_j = cnt_j - (N - cnt_j) / (w - 1)``, and the per-item
    estimate is the MEDIAN over the d rows, clipped into
    ``[0, min_j cnt_j]`` — never worse than the classic one-sided min,
    and typically an order of magnitude tighter on Zipfian tails (the
    error contract above), at the cost of the est ≥ exact guarantee.

    Cross-engine determinism: the median is computed on INTEGER-scaled
    values (``cnt_j*(w-1) - (N - cnt_j)``, exact int64) as
    ``(sum - min - max) / 2`` — the middle-two average for the fixed
    ``d = 4`` — so the only float op is one final division.  ``N``
    (total stream weight) is row 0's column sum, a ≤ w-row aggregate
    that rides a broadcast.  Requires ``d == 4``."""
    if d != 4:
        raise ValueError("cms_estimate_meanmin: median-by-sum-min-max "
                         "requires d == 4")
    h = F.col(hash_col)
    tot = cells.where(F.col("j") == 0).agg(
        F.sum("cnt").alias("_N")
    )
    probes = items.crossJoin(F.broadcast(tot)).select(
        "*",
        F.posexplode(
            F.array(*[cms_bucket(h, j, w) for j in range(d)])
        ).alias("j", "bucket"),
    )
    keep = [c for c in items.columns]
    cnt = F.coalesce(F.col("cnt"), F.lit(0))
    scaled = cnt * F.lit(w - 1) - (F.col("_N") - cnt)
    agg = (
        probes.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy(*keep)
        .agg(
            F.min(cnt).alias("_min_cnt"),
            F.sum(scaled).alias("_s"),
            F.min(scaled).alias("_lo"),
            F.max(scaled).alias("_hi"),
        )
    )
    med = (F.col("_s") - F.col("_lo") - F.col("_hi")).cast("double") \
        / F.lit(2.0 * (w - 1))
    return agg.select(
        *keep,
        F.col("_min_cnt").alias("est_count"),
        F.round(
            F.least(
                F.col("_min_cnt").cast("double"),
                F.greatest(med, F.lit(0.0)),
            ), 4,
        ).alias("est_meanmin"),
    )


def cms_meanmin_sql(hash_expr: str, d: int = 4, w: int = 1024) -> str:
    """Scalar SQL for the count-mean-min estimate of one item hash
    (correlated against the ``cms`` CTE from :func:`cms_sql_cte`) —
    lockstep with :func:`cms_estimate_meanmin`: integer-scaled
    median-of-4 via (sum − min − max)/2, one final double division."""
    if d != 4:
        raise ValueError("cms_meanmin_sql requires d == 4")
    ls = [
        f"(SELECT COALESCE(MAX(cnt), 0) FROM cms WHERE j = {j} AND "
        f"bucket = CAST(((({hash_expr}) * {_CMS_A[j]} + {_CMS_B[j]}) "
        f"% {_CMS_M}) % {w} AS INT))"
        for j in range(d)
    ]
    sc = [f"({l} * {w - 1} - ((SELECT SUM(cnt) FROM cms WHERE j = 0) "
          f"- {l}))" for l in ls]
    s = " + ".join(sc)
    lo = f"least({', '.join(sc)})"
    hi = f"greatest({', '.join(sc)})"
    med = (f"CAST(({s}) - {lo} - {hi} AS DOUBLE) "
           f"/ CAST({2.0 * (w - 1)!r} AS DOUBLE)")
    mn = f"least({', '.join(ls)})"
    return (f"ROUND(least(CAST({mn} AS DOUBLE), "
            f"greatest({med}, CAST(0.0 AS DOUBLE))), 4)")


def cms_sql_cte(
    source_sql: str, hash_expr: str, d: int = 4, w: int = 1024,
    weight_expr: str = "1",
) -> str:
    """Oracle restatement of the sketch build: CTEs ending with
    ``cms(j, bucket, cnt)``.  ``source_sql`` must yield ``{hash_expr}``
    (and ``{weight_expr}`` if weighted)."""
    # every interpolation is parenthesized: a compound expression
    # argument ('a + b') must not rebind against the template's * / %
    buckets = " UNION ALL ".join(
        f"SELECT {j} AS j, "
        f"CAST(((({hash_expr}) * {_CMS_A[j]} + {_CMS_B[j]}) % {_CMS_M}) % {w}"
        f" AS INT) AS bucket, ({weight_expr}) AS wgt FROM csrc"
        for j in range(d)
    )
    return f"""
        csrc AS ({source_sql}),
        cprobe AS ({buckets}),
        cms AS (
            SELECT j, bucket, SUM(wgt) AS cnt FROM cprobe GROUP BY j, bucket
        )
    """


def cms_estimate_sql(hash_expr: str, d: int = 4, w: int = 1024) -> str:
    """Scalar SQL for the min-over-rows estimate of one item hash
    (correlated against the ``cms`` CTE from :func:`cms_sql_cte`)."""
    lookups = ", ".join(
        f"(SELECT COALESCE(MAX(cnt), 0) FROM cms WHERE j = {j} AND bucket = "
        f"CAST(((({hash_expr}) * {_CMS_A[j]} + {_CMS_B[j]}) % {_CMS_M}) % {w}"
        f" AS INT))"
        for j in range(d)
    )
    return f"least({lookups})"


def floor_log2_sql(expr: str, width: int) -> str:
    """The identical comparison-ladder floor(log2) as ANSI SQL."""
    terms = " + ".join(
        f"CASE WHEN {expr} >= {1 << k} THEN 1 ELSE 0 END"
        for k in range(1, width)
    )
    return f"({terms})"


def hll_sql_cte(
    source_sql: str, group_expr: str, hash_expr: str, p: int = 8,
    hash_bits: int = _POLY_BITS, prefix: str = "h",
) -> str:
    """Oracle restatement: the whole sketch as SQL CTEs over
    ``source_sql`` (must yield ``{group_expr}`` and ``{hash_expr}``
    columns).  Ends with ``{prefix}ll(grp, est_distinct)`` (``hll`` by
    default; pass distinct prefixes to use several sketches in one
    statement).  Keep in lockstep with hll_registers/hll_estimate."""
    m = 1 << p
    width = hash_bits - p
    # every float literal is CAST(... AS DOUBLE): DuckDB parses bare
    # decimal literals as DECIMAL and its fixed-point arithmetic both
    # overflows (alpha*m*m) and rounds differently from the IEEE ops
    # the Spark side uses
    alpha = f"CAST({_alpha(m)!r} AS DOUBLE)"
    fm = f"CAST({float(m)!r} AS DOUBLE)"
    fspace = f"CAST({float(1 << hash_bits)!r} AS DOUBLE)"
    small_thr = f"CAST({2.5 * m!r} AS DOUBLE)"
    large_thr = f"CAST({float(1 << hash_bits) / 30.0!r} AS DOUBLE)"
    ln_floor = f"CAST({_LN_FLOOR!r} AS DOUBLE)"
    # parenthesized interpolations (compound group/hash expressions must
    # not rebind against % and //)
    fl2 = floor_log2_sql(f"(({hash_expr}) // {m})", width)
    x = prefix
    return f"""
        {x}src AS ({source_sql}),
        {x}reg AS (
            SELECT ({group_expr}) AS grp,
                   CAST(({hash_expr}) % {m} AS INT) AS reg,
                   CAST(CASE WHEN (({hash_expr}) // {m}) = 0 THEN {width + 1}
                        ELSE {width} - {fl2}
                        END AS INT) AS rho
            FROM {x}src
        ),
        {x}max AS (
            SELECT grp, reg, MAX(rho) AS rho FROM {x}reg GROUP BY grp, reg
        ),
        {x}agg AS (
            SELECT grp, COUNT(*) AS _present,
                   SUM(power(2.0, -rho)) AS _s_present
            FROM {x}max GROUP BY grp
        ),
        {x}ll AS (
            SELECT grp,
                   ROUND(CASE
                     WHEN ({alpha} * {m} * {m})
                          / (_s_present + ({m} - _present)) <= {small_thr}
                          AND ({m} - _present) > 0
                       THEN {fm} * ln({fm}
                            / CAST({m} - _present AS DOUBLE))
                     WHEN ({alpha} * {m} * {m})
                          / (_s_present + ({m} - _present)) > {large_thr}
                       THEN -{fspace} * ln(greatest(CAST(1.0 AS DOUBLE)
                            - (({alpha} * {m} * {m})
                            / (_s_present + ({m} - _present))) / {fspace},
                            {ln_floor}))
                     ELSE ({alpha} * {m} * {m})
                          / (_s_present + ({m} - _present))
                   END, 4) AS est_distinct
            FROM {x}agg
        )
    """


def bloom_bits(
    df: DataFrame, hash_col: str, m_bits: int = 1 << 16, k: int = 4,
) -> DataFrame:
    """Bloom filter build as a DataFrame fold: the distinct set bit
    positions ``(bit)`` — ≤ m_bits rows out of any corpus (Bloom 1970).
    Bit positions reuse the CMS affine row hashes (``k ≤ 4``), so the
    whole filter is exact int64 arithmetic and bit-deterministic.
    Mergeable via union + distinct.  False-positive contract:
    p ≈ (1 − e^(−k·n/m))^k for n inserted items — at the default
    m=65536, k=4 that is <2.4% up to n=8192; size m to your n, the
    state is always ≤ m rows / m bits.  No false NEGATIVES ever — the
    property a decontamination pre-filter needs (a miss is definitely
    clean; only hits pay the exact check)."""
    if k > len(_CMS_A):
        raise ValueError(f"bloom_bits: k <= {len(_CMS_A)}")
    h = F.col(hash_col)
    return (
        df.select(
            F.explode(
                F.array(*[cms_bucket(h, j, m_bits) for j in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    items: DataFrame, bits: DataFrame, hash_col: str,
    m_bits: int = 1 << 16, k: int = 4,
) -> DataFrame:
    """Membership probe: ``maybe_member`` true iff ALL k bit positions
    are set.  ``bits`` is ≤ m_bits rows, so the join broadcasts and the
    probe is a map-side lookup + a per-item count — the bounded-state
    replacement for broadcasting the exact member set when that set is
    huge (decontam.py's shingle broadcast at 100 TB)."""
    h = F.col(hash_col)
    probes = items.select(
        "*",
        F.explode(
            F.array(*[cms_bucket(h, j, m_bits) for j in range(k)])
        ).alias("bit"),
    )
    keep = [c for c in items.columns]
    hit = F.when(F.col("_set").isNotNull(), 1).otherwise(0)
    return (
        probes.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
        )
        .groupBy(*keep)
        .agg((F.sum(hit) == F.lit(k)).alias("maybe_member"))
    )


def bloom_sql_cte(
    source_sql: str, hash_expr: str, m_bits: int = 1 << 16, k: int = 4,
) -> str:
    """Oracle restatement of the filter build: CTEs ending with
    ``bloom(bit)``."""
    sel = " UNION ALL ".join(
        f"SELECT CAST(((({hash_expr}) * {_CMS_A[j]} + {_CMS_B[j]}) "
        f"% {_CMS_M}) % {m_bits} AS INT) AS bit FROM bsrc"
        for j in range(k)
    )
    return f"""
        bsrc AS ({source_sql}),
        bloom AS (SELECT DISTINCT bit FROM ({sel}))
    """


def bloom_probe_sql(hash_expr: str, m_bits: int = 1 << 16,
                    k: int = 4) -> str:
    """Scalar SQL: true iff every bit position of ``hash_expr`` is in
    the ``bloom`` CTE."""
    terms = " AND ".join(
        f"EXISTS (SELECT 1 FROM bloom WHERE bit = "
        f"CAST(((({hash_expr}) * {_CMS_A[j]} + {_CMS_B[j]}) % {_CMS_M}) "
        f"% {m_bits} AS INT))"
        for j in range(k)
    )
    return f"({terms})"


def hist_cells(
    df: DataFrame, group_cols: list[str], value_col: str,
    lo: int, hi: int, n_bins: int = 64,
) -> DataFrame:
    """Fixed-grid histogram fold over an INTEGER value column:
    ``(group..., bin, cnt)`` with ``bin = (v - lo) * n_bins div
    (hi - lo)`` clamped into [0, n_bins) — pure int64 arithmetic, so
    the fold is bit-deterministic and mergeable (union + re-sum), the
    same constant-state shuffle shape as the CMS/HLL folds: ≤
    groups × n_bins rows out of any corpus.  Out-of-range values
    saturate into the edge bins (documented: the estimate is then the
    edge-bin bound, not the true tail value).  NULL values drop up
    front: they would otherwise fold into a NULL bin whose ordering
    the cumulative window reads NULLS-FIRST in Spark but NULLS-LAST in
    DuckDB — a NULL measurement is a missing observation, not a bin."""
    v = F.col(value_col).cast("long")
    num = ((v - F.lit(lo)) * F.lit(n_bins)).alias("_num")
    proj = df.where(v.isNotNull()).select(*group_cols, num)
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.expr(f"_num DIV {hi - lo}").cast("int")),
    )
    return (
        proj.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles(
    cells: DataFrame, group_cols: list[str], qs: list[float],
    lo: int, hi: int, n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram fold: per (group, q), the
    first bin whose cumulative count reaches ``rank = ceil(q * total)``
    (clamped to ≥ 1), linearly interpolated within the bin —
    ``est = lo + (bin + (rank - cum_prev)/cnt) * width``.  Error is
    bounded by one bin width, ``(hi - lo) / n_bins``, the contract a
    fixed-grid sketch trades for constant state (vs the exact grouped
    quantiles in operators/quantiles.py, whose window sorts data-
    proportional partitions).  Every step up to the final interpolation
    is integer arithmetic; the interpolation and ``ceil(q * total)``
    are single IEEE ops identical in any engine.  Windows partition by
    group (and q) over ≤ n_bins rows — never a global sort."""
    from pyspark.sql.window import Window

    width = (hi - lo) / n_bins
    wcum = Window.partitionBy(*group_cols).orderBy("bin")
    tot = cells.groupBy(*group_cols).agg(F.sum("cnt").alias("_tot"))
    cum = (
        cells.withColumn("_cum", F.sum("cnt").over(wcum))
        .join(tot, group_cols)
        .select(
            *group_cols, "bin", "cnt", "_cum", "_tot",
            F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"),
        )
        .withColumn(
            "_rank",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("q") * F.col("_tot").cast("double"))
                .cast("long"),
            ),
        )
        .where(F.col("_cum") >= F.col("_rank"))
    )
    wfirst = Window.partitionBy(*group_cols, "q").orderBy("bin")
    first = cum.withColumn("_rn", F.row_number().over(wfirst)).where(
        F.col("_rn") == 1
    )
    frac = (F.col("_rank") - (F.col("_cum") - F.col("cnt"))).cast(
        "double"
    ) / F.col("cnt").cast("double")
    est = F.lit(float(lo)) + (F.col("bin").cast("double") + frac) \
        * F.lit(width)
    return first.select(*group_cols, "q", F.round(est, 4).alias("est"))


def hist_quantiles_sql_cte(
    source_sql: str, group_expr: str, value_expr: str, qs: list[float],
    lo: int, hi: int, n_bins: int = 64,
) -> str:
    """Oracle restatement of hist_cells + hist_quantiles as CTEs ending
    with ``hq(grp, q, est)`` — lockstep with the DataFrame path (same
    int64 binning, same rank/interpolation expressions)."""
    width = f"CAST({(hi - lo) / n_bins!r} AS DOUBLE)"
    qlist = ", ".join(f"CAST({q!r} AS DOUBLE)" for q in qs)
    return f"""
        hsrc AS ({source_sql}),
        hcell AS (
            SELECT ({group_expr}) AS grp,
                   least({n_bins - 1}, greatest(0,
                       CAST((CAST(({value_expr}) AS BIGINT) - {lo})
                            * {n_bins} // {hi - lo} AS INT))) AS bin,
                   COUNT(*) AS cnt
            FROM hsrc
            WHERE ({value_expr}) IS NOT NULL
            GROUP BY 1, 2
        ),
        hcum AS (
            SELECT grp, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY grp) AS tot
            FROM hcell
        ),
        hq AS (
            SELECT grp, q,
                   ROUND({lo} + (CAST(bin AS DOUBLE)
                         + CAST(rank_ - (cum - cnt) AS DOUBLE)
                           / CAST(cnt AS DOUBLE)) * {width}, 4) AS est
            FROM (
                SELECT grp, bin, cnt, cum, q,
                       greatest(1, CAST(ceil(q * CAST(tot AS DOUBLE))
                                        AS BIGINT)) AS rank_,
                       ROW_NUMBER() OVER (
                           PARTITION BY grp, q ORDER BY bin
                       ) AS rn_pre
                FROM hcum, (SELECT unnest([{qlist}]) AS q) qs
                WHERE cum >= greatest(1, CAST(ceil(q * CAST(tot AS DOUBLE))
                                              AS BIGINT))
            )
            WHERE rn_pre = 1
        )
    """


def hll_pair_union_estimates(
    regs: DataFrame, src_col: str, p: int = 8,
    hash_bits: int = _POLY_BITS,
) -> DataFrame:
    """Union-cardinality estimates for every pair of groups from ONE
    per-group register frame — the sketch set-operation that makes
    cross-source overlap auditing free once the registers exist:
    ``|A ∪ B|`` is the estimate of the register-wise max-merge (exactly
    the property streamed/sharded merges already rely on), and
    ``|A ∩ B| ≈ |A| + |B| − |A ∪ B|`` by inclusion–exclusion.

    Returns ``(src_a, src_b, est_union)`` for ``src_a < src_b``.  Work
    is bounded by pairs × m register rows — the corpus is never
    re-scanned; both joins are equi-joins against the tiny distinct-
    group frame (no nested-loop)."""
    srcs = regs.select(src_col).distinct()
    pairs = (
        srcs.select(F.col(src_col).alias("src_a"))
        .crossJoin(F.broadcast(srcs.select(F.col(src_col).alias("src_b"))))
        .where(F.col("src_a") < F.col("src_b"))
    )
    ca = regs.join(
        F.broadcast(pairs), F.col(src_col) == F.col("src_a")
    ).select("src_a", "src_b", "reg", "rho")
    cb = regs.join(
        F.broadcast(pairs), F.col(src_col) == F.col("src_b")
    ).select("src_a", "src_b", "reg", "rho")
    uni = (
        ca.unionByName(cb)
        .groupBy("src_a", "src_b", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(uni, ["src_a", "src_b"], p, hash_bits).select(
        "src_a", "src_b", F.col("est_distinct").alias("est_union")
    )


# --------------------------------------------------------------------- KMV
# k-minimum-values ("theta") sketch: keep the k smallest DISTINCT hash
# values per group.  The capability HLL registers cannot provide: a KMV
# sketch is a uniform θ-sample of each group's distinct values, so two
# sketches estimate their INTERSECTION and DIFFERENCE directly (Beyer et
# al., "On synopses for distinct-value estimation under multiset
# operations", SIGMOD 2007; the theta-sketch framing of Dasgupta et al.,
# "Theta sketch framework", 2016) — where the HLL route (q151) is stuck
# with inclusion–exclusion, whose error grows with |A∪B| even when the
# true intersection is tiny.
#
# Spark shape / the 100 TB story: dense_rank() ≤ k over (group ORDER BY
# hash) compiles to a PARTIAL-mode WindowGroupLimit BEFORE the exchange
# (plan-pinned in tests/test_sketch.py) — each map task keeps a bounded
# heap of k distinct values per group, so the shuffle moves at most
# partitions × k values per group (plus duplicates of those k values;
# callers with heavy duplication pre-collapse with a (group, h) agg).
# Merge = union the shards' minima and re-rank: the k smallest of the
# union of per-shard k-minima ARE the k smallest of the union, the same
# shard-merge property the HLL register fold has (pinned in tests).
#
# Determinism (the oracle story): the sketch itself is a set of int64
# hashes — no floats anywhere.  The estimators perform ONE double
# division each ((k-1)·space/h_k; count·space/θ) and round to 4
# decimals, the same single-IEEE-op discipline as the HLL corrections.

# Horner token hashes are uniform over [0, 2^31 - 1) — the prime modulus
# in pipeline/dedup.py.  KMV's estimators divide by the TRUE hash-space
# size, so this is the modulus itself, not the 2^31 power-of-two bound
# the HLL register split uses.
_POLY_M = (1 << 31) - 1


def kmv_minima(
    df: DataFrame, group_cols: list[str], hash_col: str, k: int = 64
) -> DataFrame:
    """Fold ``(group..., hash)`` rows into the per-group KMV sketch:
    the ``k`` smallest DISTINCT hash values, as rows ``(group..., h)``.
    dense_rank (not row_number) so duplicate hashes cannot evict
    genuinely distinct values from the heap.  NULL hashes are dropped
    up front: Spark's ASC window puts NULLS FIRST, so one NULL would
    enter every sketch as its "smallest value" (and DuckDB's
    NULLS-LAST default would disagree) — a NULL hash is a missing
    observation, not a value."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy(hash_col)
    return (
        df.select(*group_cols, F.col(hash_col).alias("h"))
        .where(F.col("h").isNotNull())
        .withColumn("_dr", F.dense_rank().over(w))
        .where(F.col("_dr") <= k)
        .select(*group_cols, "h")
        .distinct()
    )


def kmv_theta(
    minima: DataFrame, group_cols: list[str], k: int,
    space: int = _POLY_M,
) -> DataFrame:
    """Per-group sampling threshold θ: the k-th smallest value when the
    sketch is full, else ``space`` (a group with < k distinct values is
    held EXHAUSTIVELY — its θ-sample is the whole set, and every
    estimate built on it degrades gracefully to exact counting).
    Returns ``(group..., n_sample, theta)``."""
    return minima.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.when(F.count(F.lit(1)) < k, F.lit(space))
        .otherwise(F.max("h"))
        .alias("theta"),
    )


def kmv_estimate(
    minima: DataFrame, group_cols: list[str], k: int,
    space: int = _POLY_M,
) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: the Beyer et al.
    unbiased estimator ``(k-1)·space / h_k`` (values strictly below the
    k-th minimum are a uniform sample at rate h_k/space and number
    k-1); a partial sketch (< k values) IS its group's value set, so
    the estimate is the exact count.  One double division, rounded to
    4 decimals.  Returns ``(group..., n_sample, est_distinct)``."""
    th = kmv_theta(minima, group_cols, k, space)
    est = F.when(
        F.col("n_sample") < k, F.col("n_sample").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * space))
        / F.greatest(F.col("theta"), F.lit(1)).cast("double")
    )
    return th.select(
        *group_cols, "n_sample", F.round(est, 4).alias("est_distinct")
    )


def kmv_distinct(
    df: DataFrame, group_cols: list[str], hash_col: str, k: int = 64,
    space: int = _POLY_M,
) -> DataFrame:
    """Convenience: fold + estimate in one call."""
    return kmv_estimate(kmv_minima(df, group_cols, hash_col, k),
                        group_cols, k, space)


def kmv_pair_set_estimates(
    minima: DataFrame, src_col: str, k: int, space: int = _POLY_M,
) -> DataFrame:
    """Set-operation estimates for every group pair from ONE per-group
    minima frame: union, intersection, and difference — the direct
    theta-sketch estimates HLL registers cannot express.  For a pair,
    ``θ = min(θ_a, θ_b)``; each sketch's values below θ are a uniform
    θ/space-rate sample of its group's distinct set, so
    ``|A ∘ B| ≈ |{h < θ in sample(A) ∘ sample(B)}| · space / θ`` for
    ∘ ∈ {∪, ∩, \\}.  When both groups are exhaustive (θ = space) the
    estimates ARE the exact counts.

    Work is bounded by pairs × 2k sketch rows — the corpus is never
    re-scanned PROVIDED ``minima`` is materialized (localCheckpoint /
    persisted artifact): the sketch frame feeds ≥5 plan branches here
    (θ, the pair list, both sample sides), and an unpinned lazy fold
    would re-run per branch (q163's before-plan embedded it 8×).  The
    pair list and per-group θ frames ride as broadcasts.  Returns ``(src_a, src_b, est_union, est_intersection,
    est_diff_ab)`` for ``src_a < src_b``."""
    th = kmv_theta(minima, [src_col], k, space)
    srcs = th.select(src_col).distinct()
    pairs = (
        srcs.select(F.col(src_col).alias("src_a"))
        .crossJoin(F.broadcast(srcs.select(F.col(src_col).alias("src_b"))))
        .where(F.col("src_a") < F.col("src_b"))
    )
    pth = (
        pairs.join(
            F.broadcast(th.select(F.col(src_col).alias("src_a"),
                                  F.col("theta").alias("_tha"))),
            "src_a",
        )
        .join(
            F.broadcast(th.select(F.col(src_col).alias("src_b"),
                                  F.col("theta").alias("_thb"))),
            "src_b",
        )
        .select("src_a", "src_b",
                F.least("_tha", "_thb").alias("theta"))
    )
    ma = minima.join(
        F.broadcast(pairs), F.col(src_col) == F.col("src_a")
    ).select("src_a", "src_b", "h",
             F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    mb = minima.join(
        F.broadcast(pairs), F.col(src_col) == F.col("src_b")
    ).select("src_a", "src_b", "h",
             F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    mm = (
        ma.unionByName(mb)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
        .join(F.broadcast(pth), ["src_a", "src_b"])
        .where(F.col("h") < F.col("theta"))
    )
    agg = mm.groupBy("src_a", "src_b", "theta").agg(
        F.count(F.lit(1)).alias("_cu"),
        F.sum(F.col("ia") * F.col("ib")).alias("_ci"),
        F.sum(F.col("ia") * (1 - F.col("ib"))).alias("_cda"),
    )

    def _scale(c: str) -> Column:
        return F.round(
            F.col(c).cast("double") * F.lit(float(space))
            / F.col("theta").cast("double"),
            4,
        )

    # a pair can drop out of `agg` only if BOTH θ-samples are empty —
    # possible when a group's single smallest value equals θ; restore
    # it with zero counts so every pair reports
    return (
        pairs.join(agg, ["src_a", "src_b"], "left")
        .select(
            "src_a", "src_b",
            F.coalesce(_scale("_cu"), F.lit(0.0)).alias("est_union"),
            F.coalesce(_scale("_ci"), F.lit(0.0))
            .alias("est_intersection"),
            F.coalesce(_scale("_cda"), F.lit(0.0)).alias("est_diff_ab"),
        )
    )


def kmv_sql_cte(
    source_sql: str, group_expr: str, hash_expr: str, k: int,
    space: int = _POLY_M, prefix: str = "k",
) -> str:
    """Oracle restatement of kmv_minima + kmv_estimate as CTEs ending
    with ``{prefix}min(grp, h)`` (the sketch) and ``{prefix}est(grp,
    n_sample, est_distinct)`` — lockstep with the DataFrame path (same
    dense_rank fold, same (k-1)·space/h_k single division)."""
    p = prefix
    return f"""
        {p}src AS ({source_sql}),
        {p}rk AS (
            SELECT ({group_expr}) AS grp, ({hash_expr}) AS h,
                   DENSE_RANK() OVER (
                       PARTITION BY ({group_expr}) ORDER BY ({hash_expr})
                   ) AS dr
            FROM {p}src
            WHERE ({hash_expr}) IS NOT NULL
        ),
        {p}min AS (
            SELECT DISTINCT grp, h FROM {p}rk WHERE dr <= {k}
        ),
        {p}est AS (
            SELECT grp, n_sample,
                   ROUND(CASE WHEN n_sample < {k}
                         THEN CAST(n_sample AS DOUBLE)
                         ELSE CAST({(k - 1) * space} AS DOUBLE)
                              / CAST(greatest(theta, 1) AS DOUBLE)
                         END, 4) AS est_distinct
            FROM (
                SELECT grp, COUNT(*) AS n_sample,
                       CASE WHEN COUNT(*) < {k} THEN {space}
                            ELSE MAX(h) END AS theta
                FROM {p}min GROUP BY grp
            )
        )
    """
