"""Deterministic sampling for training-data pipelines.

``df.sample()`` is the wrong tool for corpus construction: its RNG is
partition-seeded, so the chosen rows change under repartitioning,
retries, and engine versions — a training set that can't be rebuilt
bit-for-bit.  **Hash sampling** decides per row from a hash of a stable
key: ``keep iff h(id) mod D < rate*D``.  Properties that matter at
100 TB:

- **no shuffle**: a narrow filter, fused into the scan stage and
  column-pruned like any predicate;
- **reproducible anywhere**: any engine that can compute the hash
  (the oracle restates it in SQL) selects the identical rows;
- **consistent subsets**: rate 1% ⊂ rate 10% for the same salt — grow a
  sample without resampling (the canonical trick behind web-corpus dev
  splits);
- **stratified**: per-stratum rates via a broadcast rate table, still
  one filter.

The hash is a multiplicative congruential mix mod a Mersenne prime —
3 integer ops per row, JVM-side, and exactly reproducible in ANSI SQL
(unlike xxhash64/md5-on-bigint variants which differ across engines'
string casts).

The reference has no sampling operators (its scans are always
exhaustive, badgerdb.go:319–348); this is a scale extension for the
LLM-pipeline surface (SURVEY.md §7 step 9)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 keeps every intermediate in signed-64 range:
# max id * MULT < 2^63 for ids up to ~2^37.
_MOD = (1 << 31) - 1
_MULT = 48271  # MINSTD multiplier (Park–Miller)
_DENOM = 1_000_000


def sample_hash(id_col: Column, salt: int = 0) -> Column:
    """Uniform [0, 1e6) bucket for a bigint id — the sampling coordinate.

    pmod, not %: Spark's % follows the dividend's sign, so a negative id
    (or id+salt) would land in a negative bucket that sits below every
    threshold and is kept at ANY rate.  pmod keeps the coordinate in
    [0, mod) for the full bigint domain; for non-negative ids the result
    is unchanged."""
    h = F.pmod((id_col.cast("long") + F.lit(salt)) * F.lit(_MULT), F.lit(_MOD))
    # second round breaks the linearity between consecutive ids
    h = F.pmod(h * F.lit(_MULT) + F.lit(salt), F.lit(_MOD))
    return F.pmod(h, F.lit(_DENOM))


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: int = 0
) -> DataFrame:
    """Keep ~rate of rows, decided per row by key hash (deterministic,
    shuffle-free, subset-consistent across rates)."""
    return df.where(sample_hash(F.col(id_col), salt) < int(rate * _DENOM))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-stratum rates (e.g. upsample low-resource languages): the rate
    table rides along as a CASE expression — no join, no shuffle."""
    thresh = F.lit(int(default_rate * _DENOM))
    for value, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * _DENOM)))
            .otherwise(thresh)
        )
    return df.where(sample_hash(F.col(id_col), salt) < thresh)


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    salt: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or any named) split assignment: the
    hash coordinate is cut at the cumulative weight thresholds, the last
    split absorbs the remainder.  Same properties as the samplers — a
    narrow scan-side CASE, no shuffle, reproducible in any engine, and
    STABLE under dataset growth: a row's split depends only on its id and
    the salt, never on the other rows (the property that keeps eval sets
    uncontaminated as the corpus is re-crawled).
    """
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = sample_hash(F.col(id_col), salt)
    names = list(weights)
    case = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name]
        cond = h < int(cum * _DENOM)
        case = F.when(cond, name) if case is None else case.when(cond, name)
    return df.withColumn(split_col, case.otherwise(names[-1]))


def assign_split_sql(
    id_expr: str, weights: dict[str, float], salt: int = 0
) -> str:
    """The identical split CASE as ANSI SQL (oracle restatement)."""
    h = sample_hash_sql(id_expr, salt)
    names = list(weights)
    parts, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name]
        parts.append(f"WHEN {h} < {int(cum * _DENOM)} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def sample_hash_sql(id_expr: str, salt: int = 0) -> str:
    """The identical bucket computation as ANSI SQL, for oracles and for
    rebuilding the same sample in another engine.  SQL % is also
    dividend-signed, so each reduction is the ((x % m) + m) % m pmod
    idiom to stay in lockstep with sample_hash."""

    def pmod(x: str, m: int) -> str:
        return f"(((({x}) % {m}) + {m}) % {m})"

    h1 = pmod(f"(({id_expr}) + {salt}) * {_MULT}", _MOD)
    h2 = pmod(f"({h1}) * {_MULT} + {salt}", _MOD)
    return pmod(h2, _DENOM)


def mixture_sample(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    salt: int = 0,
) -> DataFrame:
    """Resolve target mixture WEIGHTS into per-source hash-sampling rates
    and apply them — the "source mixing" step of corpus construction.

    The largest corpus satisfying mixture ∝ weights without upsampling
    keeps ``scale = min_s(count_s / w_s)`` weight-units: source s then
    samples at rate ``scale·w_s/count_s`` (the binding source at 1.0).
    Counts, scale, and thresholds all resolve IN-PLAN (aggregate →
    broadcast), no driver collect; the row choice inherits hash
    sampling's determinism, so the same corpus + weights rebuild the
    same mixture anywhere.  Sources not in ``weights`` are dropped."""
    thresh = None
    for value, w in sorted(weights.items()):
        c = F.when(F.col(source_col) == value, F.lit(float(w)))
        thresh = c.otherwise(thresh) if thresh is not None else c.otherwise(
            F.lit(None)
        )
    counts = (
        df.withColumn("_w", thresh)
        .where(F.col("_w").isNotNull() & (F.col("_w") > 0))
        .groupBy(source_col, "_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    scale = counts.select(
        F.min(F.col("_cnt").cast("double") / F.col("_w")).alias("_scale")
    )
    rates = (
        counts.crossJoin(F.broadcast(scale))
        .withColumn(
            "_thresh",
            F.floor(
                F.lit(float(_DENOM)) * F.col("_scale") * F.col("_w")
                / F.col("_cnt")
            ).cast("long"),
        )
        .select(source_col, "_thresh")
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .where(sample_hash(F.col(id_col), salt) < F.col("_thresh"))
        .drop("_thresh")
    )


def reservoir_per_group(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic k-per-group sample: rank rows inside each group by
    their hash coordinate (ties broken by id) and keep the first k — the
    distributed, rerun-stable replacement for reservoir sampling.

    Scale shape: ONE shuffle on the group key; WindowGroupLimit prunes
    each partition's ranking to k rows before the exchange, so the
    shuffle carries at most k rows per (group × input partition), not the
    group's full population.  Subset-consistent: a row keeps its
    coordinate across runs and SFs, so growing k only ADDS rows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_hash(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def largest_remainder_quotas(
    df: DataFrame,
    stratum_col: str,
    budget: int,
) -> DataFrame:
    """Exact per-stratum sample quotas by the largest-remainder
    (Hamilton) method: quotas are proportional to stratum size, sum to
    EXACTLY ``budget``, and every arithmetic step is integer — base
    quota ``(budget*n_s) div n_total``, remainder ``(budget*n_s) mod
    n_total``, and the ``budget - sum(base)`` leftover units go to the
    largest remainders (ties: larger stratum, then stratum name).  No
    floats anywhere, so any engine reproduces the allocation bit-for-bit
    (the rate-based samplers above can only hit the budget in
    expectation; corpus contracts are often "exactly N documents").

    The reference has no sampling surface (scans are exhaustive); this
    extends the LLM-pipeline family (SURVEY.md §7 step 9).

    Scale shape: one groupBy fold to ≤|strata| rows, then windows over
    that bounded frame — the data-proportional pass is the count
    aggregation only.  Output: (stratum, n_rows, quota).

    ``budget`` must be ≤ n_total; then quota ≤ n_rows holds provably
    (floor(n_s·B/N) = n_s forces B = N and remainder 0, so the +1 only
    lands where base < n_s).  Overflow headroom: n_s·B must stay in
    int64 (Spark wraps silently with ANSI off where DuckDB promotes to
    HUGEINT) — holds for B·N < 2^62; the samplers enforce it, direct
    callers at extreme scale must too."""
    from pyspark.sql.window import Window

    if budget < 0:
        raise ValueError("budget must be non-negative")
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    return _lr_quotas_from_counts(counts, budget)


def _lr_quotas_from_counts(counts: DataFrame, budget: int) -> DataFrame:
    """Largest-remainder arithmetic over a pre-folded ``(stratum,
    n_rows)`` frame — windows over ≤|strata| bounded rows (one
    partition by construction — see PLAN_LINT single-partition notes);
    the data-proportional pass is the caller's count aggregation."""
    from pyspark.sql.window import Window

    b = F.lit(int(budget))
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.col("rem").desc(), F.col("n_rows").desc(), F.col("stratum")
    )
    quoted = (
        counts
        .withColumn("n_total", F.sum("n_rows").over(w_all))
        .withColumn("base", F.expr("(n_rows * {b}) div n_total".format(b=int(budget))))
        .withColumn("rem", (F.col("n_rows") * b) % F.col("n_total"))
        .withColumn("leftover", b - F.sum("base").over(w_all))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "quota",
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    return quoted.select("stratum", "n_rows", "quota")


def stratified_exact_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    budget: int,
    salt: int = 0,
) -> DataFrame:
    """Exactly ``budget`` rows overall, allocated across strata by
    largest remainder and chosen inside each stratum by hash rank
    (ties by id) — deterministic, rerun- and engine-stable, and
    subset-consistent in the ranking coordinate.

    Scale shape: the quota table is ≤|strata| rows and broadcast; the
    ranking window shuffles once on the stratum key.  Per-stratum
    quotas vary, which defeats WindowGroupLimit's constant-k pruning —
    so the filter carries a SECOND, constant bound ``rn <= max(quota)``
    (one collected scalar) that Catalyst CAN push into a group-limit,
    restoring the ≤k-rows-per-partition shuffle bound; the per-stratum
    quota then trims inside it.  Output: input columns + (quota, rn)."""
    from pyspark.sql.window import Window

    # ONE data-proportional fold, pinned: previously the quota lineage
    # was re-evaluated by the scalar-guard job AND the join side (plus
    # the ranking window's own input scan: 3 full input scans per call,
    # now 2).  The pin executes only the count aggregation; the quota
    # arithmetic still first runs inside the guarded scalar job below.
    # Size note (spill-aware pin policy): one row per stratum, two
    # fixed-width columns.
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    ).localCheckpoint()
    quotas = _lr_quotas_from_counts(counts, budget)
    # bounded driver scalars: ONE row (budget-feasibility + NULL-stratum
    # + overflow checks — the quota ≤ n_rows proof needs budget ≤
    # n_total — plus the constant group-limit bound).
    max_q, n_total, null_rows = quotas.agg(
        F.max("quota"),
        F.sum("n_rows"),
        F.sum(F.when(F.col("stratum").isNull(), F.col("n_rows"))),
    ).collect()[0]
    max_q, n_total = max_q or 0, n_total or 0
    if null_rows:
        # a NULL stratum gets a quota but the equi-join below drops its
        # rows (NULL != NULL) — the EXACTLY-budget contract would break
        # silently, and cross-engine NULL orderings diverge; refuse
        raise ValueError(
            f"{null_rows} rows have NULL {stratum_col!r}: fill or "
            "filter the stratum column before exact allocation"
        )
    if budget > n_total:
        raise ValueError(
            f"budget {budget} exceeds population {n_total}: "
            "exact allocation is undefined (quotas would exceed strata)"
        )
    if n_total and budget > (1 << 62) // n_total:
        # n_rows*budget must stay in int64 (Spark wraps silently with
        # ANSI off; DuckDB promotes to HUGEINT — a cross-engine split)
        raise ValueError(
            f"budget {budget} × population {n_total} would overflow "
            "the int64 quota arithmetic"
        )
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.join(
            F.broadcast(quotas.withColumnRenamed("stratum", stratum_col)),
            stratum_col,
        )
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= F.lit(int(max_q))) & (F.col("rn") <= F.col("quota")))
    )


def largest_remainder_quotas_sql(
    from_sql: str, stratum_expr: str, budget: int
) -> str:
    """The identical allocation as an ANSI-SQL CTE body (oracle
    restatement): ``WITH <this> SELECT ... FROM quotas``.  Integer
    arithmetic end-to-end — both engines agree bit-for-bit."""
    b = int(budget)
    return f"""
        counts AS (
            SELECT {stratum_expr} AS stratum, COUNT(*) AS n_rows
            FROM {from_sql} GROUP BY 1
        ), sized AS (
            SELECT stratum, n_rows,
                   SUM(n_rows) OVER () AS n_total,
                   (n_rows * {b}) // SUM(n_rows) OVER () AS base,
                   (n_rows * {b}) % SUM(n_rows) OVER () AS rem
            FROM counts
        ), ranked AS (
            SELECT *,
                   {b} - SUM(base) OVER () AS leftover,
                   ROW_NUMBER() OVER (
                       ORDER BY rem DESC, n_rows DESC, stratum
                   ) AS rk
            FROM sized
        ), quotas AS (
            SELECT stratum, n_rows,
                   base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                     AS quota
            FROM ranked
        )
    """


def temperature_quotas(
    df: DataFrame,
    stratum_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled exact quotas: allocation proportional to
    ``n_s**alpha`` instead of ``n_s`` — the multilingual rebalancing
    rule (alpha < 1 upweights low-resource strata; XLM-R and mT5 train
    with exactly this exponent family) — then the same largest-remainder
    integerization as :func:`largest_remainder_quotas`.

    Weights enter the Hamilton step as ``floor(n_s**alpha * 1e6)``
    int64s, so every allocation step after the single power is integer
    and engine-exact (overflow headroom: w_s·B < 2^63 ⇒ B < 2^43 at
    α=0.5 even for trillion-row strata — the ×1e6 weight scale spends
    20 of the 63 bits).  The certified configuration is ``alpha=0.5``:
    IEEE-754 sqrt is correctly rounded on every engine, so even the
    weight step is bit-reproducible; other alphas go through pow(),
    whose last ulp may differ across libm implementations — supported,
    but the oracle contract covers 0.5.

    A temperature quota can EXCEED its stratum (that's the point —
    upsampling small strata), which selection-without-replacement can't
    honor; the output keeps both numbers honest: ``quota`` (allocated),
    ``capped`` = min(quota, n_rows) (selectable), ``shortfall`` =
    quota − capped for the caller to resolve by repetition/epochs.
    Scale shape identical to largest_remainder_quotas: one count fold,
    windows over ≤|strata| rows."""
    from pyspark.sql.window import Window

    if budget < 0:
        raise ValueError("budget must be non-negative")
    if alpha == 0.5:
        wexpr = F.floor(F.sqrt(F.col("n_rows")) * F.lit(1_000_000))
    else:
        wexpr = F.floor(
            F.pow(F.col("n_rows"), F.lit(float(alpha))) * F.lit(1_000_000)
        )
    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    b = F.lit(int(budget))
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.col("rem").desc(), F.col("w").desc(), F.col("stratum")
    )
    quoted = (
        counts
        .withColumn("w", wexpr.cast("long"))
        .withColumn("w_total", F.sum("w").over(w_all))
        .withColumn("base", F.expr(f"(w * {int(budget)}) div w_total"))
        .withColumn("rem", (F.col("w") * b) % F.col("w_total"))
        .withColumn("leftover", b - F.sum("base").over(w_all))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "quota",
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .withColumn("capped", F.least(F.col("quota"), F.col("n_rows")))
        .withColumn("shortfall", F.col("quota") - F.col("capped"))
    )
    return quoted.select(
        "stratum", "n_rows", "quota", "capped", "shortfall"
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    budget: int,
    alpha: float = 0.5,
    salt: int = 0,
) -> DataFrame:
    """Temperature-rebalanced deterministic sample: ``capped`` rows per
    stratum (see :func:`temperature_quotas`), chosen by the MINSTD hash
    rank exactly like :func:`stratified_exact_sample` (same constant
    group-limit bound).  Total rows = budget − Σ shortfall."""
    from pyspark.sql.window import Window

    quotas = temperature_quotas(df, stratum_col, budget, alpha)
    # bounded driver scalar: ONE row over ≤|strata| quotas (group-limit
    # bound + the same NULL-stratum refusal as stratified_exact_sample —
    # the equi-join below would silently drop a NULL stratum's quota)
    max_q, null_rows = quotas.agg(
        F.max("capped"),
        F.sum(F.when(F.col("stratum").isNull(), F.col("n_rows"))),
    ).collect()[0]
    max_q = max_q or 0
    if null_rows:
        raise ValueError(
            f"{null_rows} rows have NULL {stratum_col!r}: fill or "
            "filter the stratum column before exact allocation"
        )
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.join(
            F.broadcast(quotas.withColumnRenamed("stratum", stratum_col)),
            stratum_col,
        )
        .withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") <= F.lit(int(max_q)))
            & (F.col("rn") <= F.col("capped"))
        )
    )


def temperature_quotas_sql(
    from_sql: str, stratum_expr: str, budget: int
) -> str:
    """The alpha=0.5 allocation as an ANSI-SQL CTE body ending in
    ``quotas`` — sqrt is the one float op and it's correctly rounded
    everywhere, so the whole chain replays bit-for-bit."""
    b = int(budget)
    return f"""
        counts AS (
            SELECT {stratum_expr} AS stratum, COUNT(*) AS n_rows
            FROM {from_sql} GROUP BY 1
        ), weighted AS (
            SELECT stratum, n_rows,
                   CAST(FLOOR(SQRT(n_rows) * 1000000) AS BIGINT) AS w
            FROM counts
        ), sized AS (
            SELECT stratum, n_rows, w,
                   (w * {b}) // SUM(w) OVER () AS base,
                   (w * {b}) % SUM(w) OVER () AS rem
            FROM weighted
        ), ranked AS (
            SELECT *,
                   {b} - SUM(base) OVER () AS leftover,
                   ROW_NUMBER() OVER (
                       ORDER BY rem DESC, w DESC, stratum
                   ) AS rk
            FROM sized
        ), quotas AS (
            SELECT stratum, n_rows,
                   base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                     AS quota,
                   LEAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END,
                         n_rows) AS capped
            FROM ranked
        )
    """


# ------------------------------------------------- weighted (A-ES) sampling


def sample_uniform(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform coordinate in (0, 1] at full 31-bit
    resolution — ``sample_hash``'s MINSTD double-round WITHOUT the final
    1e6 fold (weighted keys need the resolution: a 1e6 grid would tie
    ~1 in 2k documents onto identical keys and hand their ordering to
    the tie-break instead of the weights).  ``(h + 1) / (2^31 - 1)`` is
    one exact int step and one IEEE division — bit-identical anywhere."""
    h = F.pmod(
        (id_col.cast("long") + F.lit(salt)) * F.lit(_MULT), F.lit(_MOD)
    )
    h = F.pmod(h * F.lit(_MULT) + F.lit(salt), F.lit(_MOD))
    return (h + F.lit(1)).cast("double") / F.lit(float(_MOD))


def aes_key(id_col: Column, weight_col: Column, salt: int = 0) -> Column:
    """Efraimidis–Spirakis selection key ``ln(u) / w`` (the log form of
    ``u^(1/w)``; order-isomorphic, and ln keeps the exponent range sane
    where u^(1/w) underflows for tiny weights).  Larger is better: the
    top-n keys ARE the weighted sample."""
    return F.log(sample_uniform(id_col, salt)) / weight_col.cast("double")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: int = 0,
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement: exactly ``n`` rows (per
    group, if ``group_col``), selected with probability proportional to
    ``weight_col`` at each of the n draws — the A-ES reservoir scheme of
    Efraimidis & Spirakis ("Weighted random sampling with a reservoir",
    IPL 2006): every row gets key ``u^(1/w)`` and the n largest keys are
    EXACTLY a weight-proportional draw-by-draw sample.  The corpus ops
    that need it: quality-score-weighted corpus selection, freshness-
    weighted event sampling (operators/retention.py's decay feature),
    length-balanced eval picks — anywhere "sample ∝ score" must also be
    rerun-stable.

    Determinism: u is the exact 31-bit MINSTD coordinate, so the key is
    ``ln`` of a bit-identical double divided by the weight — the one
    libm op in the pipeline (same budget as the HLL correction
    branches).  Engines agree on ln to ≤1 ulp, so orderings replay
    cross-engine whenever adjacent key gaps exceed ~2⁻⁵²·|key| — at
    random-hash key spacings the selection boundary gap is orders of
    magnitude wider (ties broken by id close the residual).  Emit the
    selected ROWS, not the key, so nothing downstream depends on the
    last ulp.

    Rows with NULL or non-positive weight are EXCLUDED — the w → 0⁺
    limit of the scheme (key → −∞: never drawn while any positive-
    weight row remains); if fewer than n positive-weight rows exist the
    sample is all of them.

    Scale shape: the key is a scan-side expression (no shuffle to build
    it); global top-n compiles to TakeOrderedAndProject (each partition
    ships only its n best), grouped top-n to a Partial WindowGroupLimit
    — both bounded-state, both plan-pinned in tests."""
    from pyspark.sql.window import Window

    if n < 0:
        raise ValueError("n must be non-negative")
    w = F.col(weight_col)
    key = aes_key(F.col(id_col), w, salt)
    pos = df.where(w.isNotNull() & (w > 0))
    if group_col is None:
        return (
            pos.orderBy(key.desc(), F.col(id_col))
            .limit(int(n))
        )
    win = Window.partitionBy(group_col).orderBy(key.desc(), F.col(id_col))
    return (
        pos.withColumn("_aes_rn", F.row_number().over(win))
        .where(F.col("_aes_rn") <= int(n))
        .drop("_aes_rn")
    )


def aes_key_sql(id_expr: str, weight_expr: str, salt: int = 0) -> str:
    """The identical A-ES key as ANSI SQL (oracle restatement): the
    sample_hash_sql pmod chain at full 31-bit resolution, then
    ``ln((h+1)/M) / w``."""

    def pmod(x: str, m: int) -> str:
        return f"(((({x}) % {m}) + {m}) % {m})"

    h1 = pmod(f"(({id_expr}) + {salt}) * {_MULT}", _MOD)
    h2 = pmod(f"({h1}) * {_MULT} + {salt}", _MOD)
    return (
        f"ln(CAST(({h2}) + 1 AS DOUBLE) / {float(_MOD)!r})"
        f" / CAST(({weight_expr}) AS DOUBLE)"
    )


def weighted_mass_quotas(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Exact per-stratum quotas proportional to each stratum's WEIGHT
    MASS (sum of an integral weight column) instead of its row count —
    "allocate the document budget by where the tokens/quality mass is":
    the corpus-construction rule when strata differ in document size or
    score, where count-proportional allocation (largest_remainder_quotas)
    over-serves strata of many tiny documents.  Same Hamilton
    integerization, and with an integral weight column every step is
    int64 — engine-exact, no floats anywhere.

    Rows with NULL or non-positive weight carry no mass and are not
    selectable (:func:`weighted_exact_sample` draws ∝ weight — their
    draw probability is the w→0 limit, zero), so they are excluded
    here too: quota mass and selectability stay consistent.

    A mass quota can EXCEED its stratum's population (mass concentrated
    in few big rows); like :func:`temperature_quotas` the output keeps
    both numbers honest: ``quota`` (allocated), ``capped`` =
    min(quota, n_rows), ``shortfall`` = quota − capped.

    Output: (stratum, n_rows, w_mass, n_nonint, quota, capped,
    shortfall) — ``n_nonint`` counts fractional weights for the
    caller's integrality refusal (the Hamilton arithmetic is only
    engine-exact over integers).  Scale shape: one fold to ≤|strata|
    rows, windows over that bounded frame."""
    from pyspark.sql.window import Window

    if budget < 0:
        raise ValueError("budget must be non-negative")
    return _mass_quotas_from_counts(
        _mass_counts(df, stratum_col, weight_col), budget
    )


def _mass_counts(
    df: DataFrame, stratum_col: str, weight_col: str
) -> DataFrame:
    """The one data-proportional pass of the mass allocator: per-stratum
    (n_rows, w_mass, n_nonint) over the positive-weight rows.  Factored
    out so :func:`weighted_exact_sample` can fold it ONCE (pinned) and
    feed the guards, the quota arithmetic, and the group-limit bound
    from the same ≤|strata|-row frame."""
    wc = F.col(weight_col)
    pos = df.where(wc.isNotNull() & (wc > 0))
    return pos.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(wc.cast("long")).alias("w_mass"),
        F.sum(
            F.when(wc != F.floor(wc), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_nonint"),
    )


def _mass_quotas_from_counts(counts: DataFrame, budget: int) -> DataFrame:
    """Hamilton integerization over a pre-folded counts frame — windows
    over ≤|strata| bounded rows, no data-proportional work."""
    from pyspark.sql.window import Window

    b = F.lit(int(budget))
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.col("rem").desc(), F.col("w_mass").desc(), F.col("stratum")
    )
    quoted = (
        counts
        .withColumn("w_total", F.sum("w_mass").over(w_all))
        .withColumn(
            "base", F.expr(f"(w_mass * {int(budget)}) div w_total")
        )
        .withColumn("rem", (F.col("w_mass") * b) % F.col("w_total"))
        .withColumn("leftover", b - F.sum("base").over(w_all))
        .withColumn("rk", F.row_number().over(w_rank))
        .withColumn(
            "quota",
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0)),
        )
        .withColumn("capped", F.least(F.col("quota"), F.col("n_rows")))
        .withColumn("shortfall", F.col("quota") - F.col("capped"))
    )
    return quoted.select(
        "stratum", "n_rows", "w_mass", "n_nonint", "quota", "capped",
        "shortfall",
    )


def weighted_exact_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weight_col: str,
    budget: int,
    salt: int = 0,
) -> DataFrame:
    """Weight-everything exact sampling: the budget is ALLOCATED across
    strata by integer weight mass (:func:`weighted_mass_quotas`) and
    rows are DRAWN within each stratum ∝ weight (the A-ES key of
    :func:`weighted_sample`) — both halves of "sample by quality/size"
    in one deterministic, engine-replayable pass.  Total rows =
    budget − Σ shortfall (a mass quota can exceed a small stratum's
    population; shortfall is reported, not silently redistributed).

    Refuses NULL strata (the quota equi-join would silently drop them
    — the stratified_exact_sample contract), fractional weights (the
    Hamilton arithmetic is engine-exact only over integers), and
    budget × total mass beyond int64.

    Scale shape: quota table ≤|strata| rows, broadcast; ONE shuffle on
    the stratum key; the ranking filter carries the constant
    ``rn <= max(capped)`` bound so Catalyst plans a group limit, the
    per-stratum quota trims inside it.  Output: input columns +
    (quota, capped, rn)."""
    from pyspark.sql.window import Window

    wc = F.col(weight_col)
    # ONE data-proportional fold, pinned: the ≤|strata|-row counts frame
    # feeds the guard scalars, the quota arithmetic, AND (via quotas) the
    # group-limit bound — previously each of those re-folded the corpus
    # (4 full input scans per call; r12 plan audit: q167 carried 4
    # parquet scans of `documents`, now 2 — the pin and the ranking
    # window).  The eager pin executes ONLY the counts aggregation — no
    # quota multiplication — so the ANSI-overflow guard ordering below
    # is preserved.  Size note (spill-aware pin policy): one row per
    # stratum, four fixed-width columns — bounded by the stratum
    # vocabulary, never by the corpus.
    counts = _mass_counts(df, stratum_col, weight_col).localCheckpoint()
    # bounded driver scalars: the guards must run BEFORE any quota
    # arithmetic executes — with ANSI on, an overflowing w_mass×budget
    # in the quota fold throws before a guard reading the same frame
    # could fire
    null_rows, nonint, w_total = counts.agg(
        F.sum(F.when(F.col("stratum").isNull(), F.col("n_rows"))),
        F.sum("n_nonint"),
        F.sum("w_mass"),
    ).collect()[0]
    w_total = w_total or 0
    if null_rows:
        raise ValueError(
            f"{null_rows} positive-weight rows have NULL "
            f"{stratum_col!r}: fill or filter the stratum column "
            "before exact allocation"
        )
    if nonint:
        raise ValueError(
            f"{nonint} rows have fractional {weight_col!r}: the "
            "mass-quota arithmetic is engine-exact only over integral "
            "weights (scale them up, e.g. ×1000, first)"
        )
    if w_total and budget > (1 << 62) // w_total:
        raise ValueError(
            f"budget {budget} × weight mass {w_total} would overflow "
            "the int64 quota arithmetic"
        )
    quotas = _mass_quotas_from_counts(counts, budget)
    max_q = quotas.agg(F.max("capped")).collect()[0][0] or 0
    win = Window.partitionBy(stratum_col).orderBy(
        aes_key(F.col(id_col), wc, salt).desc(), F.col(id_col)
    )
    return (
        df.where(wc.isNotNull() & (wc > 0))
        .join(
            F.broadcast(
                quotas.select("stratum", "quota", "capped")
                .withColumnRenamed("stratum", stratum_col)
            ),
            stratum_col,
        )
        .withColumn("rn", F.row_number().over(win))
        .where(
            (F.col("rn") <= F.lit(int(max_q)))
            & (F.col("rn") <= F.col("capped"))
        )
    )


def weighted_mass_quotas_sql(
    from_sql: str, stratum_expr: str, weight_expr: str, budget: int
) -> str:
    """The identical mass allocation as an ANSI-SQL CTE body ending in
    ``quotas(stratum, n_rows, w_mass, quota, capped, shortfall)`` —
    integer arithmetic end-to-end over the positive-weight rows."""
    b = int(budget)
    return f"""
        wpos AS (
            SELECT * FROM {from_sql}
            WHERE ({weight_expr}) IS NOT NULL AND ({weight_expr}) > 0
        ), counts AS (
            SELECT {stratum_expr} AS stratum, COUNT(*) AS n_rows,
                   SUM(CAST(({weight_expr}) AS BIGINT)) AS w_mass
            FROM wpos GROUP BY 1
        ), sized AS (
            SELECT stratum, n_rows, w_mass,
                   SUM(w_mass) OVER () AS w_total,
                   (w_mass * {b}) // SUM(w_mass) OVER () AS base,
                   (w_mass * {b}) % SUM(w_mass) OVER () AS rem
            FROM counts
        ), ranked AS (
            SELECT *,
                   {b} - SUM(base) OVER () AS leftover,
                   ROW_NUMBER() OVER (
                       ORDER BY rem DESC, w_mass DESC, stratum
                   ) AS rk
            FROM sized
        ), quotas AS (
            SELECT stratum, n_rows, w_mass,
                   base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                     AS quota,
                   least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0
                         END, n_rows) AS capped,
                   base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                     - least(base + CASE WHEN rk <= leftover THEN 1
                             ELSE 0 END, n_rows) AS shortfall
            FROM ranked
        )
    """
