"""Declarative data-quality checks over a table — the Deequ-style
validation pass a production ingest/training pipeline runs before
trusting a dataset (completeness, uniqueness, bounds, referential
integrity), expressed as ONE aggregation job plus one anti-join per
foreign-key constraint.

Scale shape: every metric that can come from a single grouped pass does
— completeness ratios, bound-violation counts, and row counts are all
``count(when(...))`` expressions in one ``agg`` (map-side partial
combine, one single-row result).  Uniqueness adds one distinct-count
per key set (each a hash aggregate over the key columns only, pruned at
the scan).  Referential integrity is a broadcast/shuffled ANTI join
counting orphans — bounded by the violation volume, never a cartesian.
Nothing collects to the driver but the one-row metric frames.

The output is long-form ``(check, metric, passed)`` so a gate can both
alert (``passed`` column) and trend the metrics over time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    completeness: dict[str, float] | None = None,
    unique: list[list[str]] | None = None,
    bounds: dict[str, tuple[float | None, float | None]] | None = None,
    fk: list[tuple[str, DataFrame, str]] | None = None,
    min_rows: int = 1,
) -> DataFrame:
    """One row per declared check: ``(check, metric, passed)``.

    - ``completeness``: column → required non-null fraction (metric =
      observed fraction, rounded to 6).
    - ``unique``: key-column lists that must be row-unique (metric =
      distinct keys / rows).
    - ``bounds``: column → (lo, hi) inclusive value range (metric =
      in-range fraction; ``None`` skips that side).
    - ``fk``: (local column, parent frame, parent column) — every
      non-null local value must exist in the parent (metric = orphan
      count, passes at 0).
    - ``min_rows``: table must have at least this many rows.
    """
    completeness = completeness or {}
    unique = unique or []
    bounds = bounds or {}
    fk = fk or []

    aggs = [F.count(F.lit(1)).alias("_n")]
    for col in completeness:
        aggs.append(
            F.count(F.col(col)).alias(f"_nn_{col}")
        )
    for col, (lo, hi) in bounds.items():
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(col) >= lo)
        if hi is not None:
            cond = cond & (F.col(col) <= hi)
        aggs.append(F.count(F.when(cond, 1)).alias(f"_in_{col}"))
    base = df.agg(*aggs)

    results = []

    def frac(num, n):
        return F.round(num.cast("double") / F.greatest(n, F.lit(1)), 6)

    n = F.col("_n")
    results.append(
        base.select(
            F.lit("min_rows").alias("check"),
            n.cast("double").alias("metric"),
            (n >= min_rows).alias("passed"),
        )
    )
    for col, req in completeness.items():
        m = frac(F.col(f"_nn_{col}"), n)
        results.append(
            base.select(
                F.lit(f"completeness:{col}").alias("check"),
                m.alias("metric"),
                (m >= req).alias("passed"),
            )
        )
    for col in bounds:
        m = frac(F.col(f"_in_{col}"), n)
        results.append(
            base.select(
                F.lit(f"bounds:{col}").alias("check"),
                m.alias("metric"),
                (m >= 1.0).alias("passed"),
            )
        )
    # uniqueness and FK metrics stay LAZY single-row frames cross-joined
    # onto the base row — no eager driver-side count() actions, so the
    # whole report is one composable DAG
    for keys in unique:
        name = "uniqueness:" + ",".join(keys)
        dq = (
            df.select(*keys)
            .distinct()
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        results.append(
            base.crossJoin(F.broadcast(dq)).select(
                F.lit(name).alias("check"),
                frac(F.col("_d"), n).alias("metric"),
                (F.col("_d") == n).alias("passed"),
            )
        )
    for col, parent, pcol in fk:
        oq = (
            df.select(F.col(col))
            .where(F.col(col).isNotNull())
            .join(
                parent.select(F.col(pcol).alias(col)).distinct(),
                col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("_o"))
        )
        results.append(
            base.crossJoin(F.broadcast(oq)).select(
                F.lit(f"fk:{col}").alias("check"),
                F.col("_o").cast("double").alias("metric"),
                (F.col("_o") == 0).alias("passed"),
            )
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _jnum(v) -> int:
    """A numeric py4j result as int: scala BigInt usually arrives
    auto-converted to a Python int, but fall back to toString for any
    gateway that hands the JavaObject through."""
    return v if isinstance(v, int) else int(v.toString())


def _tier_row_estimate(df: DataFrame) -> tuple[int, bool]:
    """(row estimate, is_exact) for profile_table's exact-vs-approx tier
    decision, costing a metadata job at most.  A bare file scan
    (optionally under projections/aliases) answers ``count()`` from
    parquet footer metadata — no data scan — so the exact count is used.
    A DERIVED plan (filters, joins, aggregates) would pay a full extra
    pass for ``count()``, so instead the plan's own statistics stand in
    (zero jobs): ``rowCount`` when Catalyst propagated one, else
    ``sizeInBytes`` divided by a crude row width.  The size-based path
    is flagged inexact so the caller can bias the tier decision safe:
    for parquet-rooted plans ``sizeInBytes`` is the COMPRESSED file
    size, and dictionary/RLE-heavy tables compress far below
    8 bytes/value — taking the quotient at face value near the
    threshold could mis-tier a huge table into the exact
    multi-COUNT(DISTINCT) Expand pass, the very 100 TB hazard the
    threshold exists to prevent (round-9 ADVICE, medium)."""
    try:
        jplan = df._jdf.queryExecution().optimizedPlan()
        p = jplan
        while p.getClass().getSimpleName() in ("Project", "SubqueryAlias"):
            p = p.children().head()
        if p.getClass().getSimpleName() in (
            "LogicalRelation", "DataSourceV2Relation",
            "DataSourceV2ScanRelation", "HiveTableRelation",
            # RDD-backed / driver-local leaves: their sizeInBytes is the
            # pessimistic defaultSizeInBytes (Long.MaxValue), useless as
            # an estimate — count() them (one cheap pass; these frames
            # are driver-created, never the 100 TB table)
            "LogicalRDD", "LocalRelation",
        ):
            return df.count(), True
        stats = jplan.stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return _jnum(rc.get()), True
        # NB: py4j hands scala BigInt back as a plain Python int here
        # (the old `.toString()` call raised on it, silently demoting
        # every derived plan to the except-branch df.count() — i.e. the
        # "zero-job" tier was paying a full count job)
        size = _jnum(stats.sizeInBytes())
        return size // max(8 * len(df.columns), 1), False
    except Exception:
        # plan introspection unavailable (e.g. Connect): pay the count
        return df.count(), True


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    top_k: int = 0,
    approx_threshold: int | None = 100_000_000,
) -> DataFrame:
    """Unsupervised per-column profile — the ``ANALYZE TABLE``-style
    pass a pipeline runs on an UNKNOWN dataset before declaring
    :func:`quality_report` checks.  Long-form output ``(column, metric,
    value)`` with value stringified (a profile mixes types):

    - ``count`` / ``nulls`` / ``distinct`` per column,
    - ``min`` / ``max`` (native ordering, stringified),
    - ``mean`` for numeric columns (6 decimals),
    - with ``top_k > 0``: ``top_i:<value>`` → occurrence count for the
      k most frequent values (ties broken by value string).

    Scale shape: counts/min/max/mean AND every distinct count come
    from ONE aggregation job.  The distinct counts AUTO-TIER on table
    size: at or below ``approx_threshold`` rows (decided by
    :func:`_tier_row_estimate` — a metadata-only count for bare file
    scans, the plan's zero-job rowCount/size statistics for derived
    plans, with size-derived estimates required to clear the threshold
    by 10x before the exact tier is chosen)
    Catalyst plans the
    multi-COUNT(DISTINCT) as a single Expand pass whose volume is
    rows × profiled columns; above it, that multiplied Expand is the
    100 TB hazard, so the profile swaps to ``approx_count_distinct``
    (HyperLogLog++, default 5% rsd) which drops the Expand entirely —
    exact at gate scale, bounded at warehouse scale.  Pass
    ``approx_threshold=None`` to force exact, ``0`` to force approx.
    The optional top-k pass melts all profiled columns into ONE
    (column, value) shuffle + a keyed WindowGroupLimit rank — k rows
    per column survive, nothing unpartitioned, no driver data.
    """
    from pyspark.sql.types import NumericType
    from pyspark.sql.window import Window

    cols = columns or [f.name for f in df.schema.fields]
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, NumericType)
    }
    if approx_threshold is None:
        exact = True
    else:
        est, est_exact = _tier_row_estimate(df)
        # size-derived estimates (compressed bytes / crude width) can be
        # low by orders of magnitude on well-compressed data: demand a
        # 10x margin below the threshold before choosing the Expand
        # pass; anything closer tiers approx (the bounded plan).  Exact
        # counts compare directly.
        exact = (
            est <= approx_threshold
            if est_exact
            else est * 10 <= approx_threshold
        )
    dc = F.count_distinct if exact else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            # all distinct counts ride the SAME job: exact plans as one
            # Expand pass (rows × profiled columns, the same volume as
            # the top-k melt) instead of one full scan per column; the
            # approx tier has no Expand at all (see docstring)
            dc(F.col(c)).cast("string").alias(f"_dc_{c}"),
        ]
        if c in numeric:
            # fixed-point string, not a double cast: float-to-string
            # formatting differs across engines (Java vs C++), and the
            # profile's contract is an engine-portable value string
            aggs.append(
                F.avg(F.col(c)).cast("decimal(28,6)").cast("string")
                .alias(f"_avg_{c}")
            )
    base = df.agg(*aggs)

    rows = []
    for c in cols:
        rows += [
            (c, "count", F.col(f"_nn_{c}").cast("string")),
            (c, "nulls",
             (F.col("_n") - F.col(f"_nn_{c}")).cast("string")),
            (c, "min", F.col(f"_min_{c}")),
            (c, "max", F.col(f"_max_{c}")),
            (c, "distinct", F.col(f"_dc_{c}")),
        ]
        if c in numeric:
            rows.append((c, "mean", F.col(f"_avg_{c}")))
    parts = [
        base.select(
            F.lit(c).alias("column"), F.lit(m).alias("metric"),
            v.alias("value"),
        )
        for c, m, v in rows
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if top_k > 0:
        melted = df.select(
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ])
            ).alias("kv")
        ).select("kv.column", "kv.v").where(F.col("v").isNotNull())
        counted = melted.groupBy("column", "v").agg(
            F.count(F.lit(1)).alias("_c")
        )
        w = Window.partitionBy("column").orderBy(
            F.col("_c").desc(), F.col("v")
        )
        top = (
            counted.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= top_k)
            .select(
                "column",
                F.concat(
                    F.lit("top_"), F.col("_rk").cast("string"),
                    F.lit(":"), F.col("v"),
                ).alias("metric"),
                F.col("_c").cast("string").alias("value"),
            )
        )
        out = out.unionByName(top)
    return out


def robust_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD outlier audit per group — the robust alternative to
    z-scores (Hampel's rule: |x − median| > k·MAD), immune to the very
    outliers it hunts, where mean/stddev gates move with every extreme
    value.  The numeric-column cousin of q112's declarative checks:
    run it on telemetry values, token counts, or any metric column
    before trusting aggregate stats.

    Both the median and the MAD come from the exact grouped-quantile
    operator (operators/quantiles.grouped_quantiles — spillable keyed
    windows, no approximation), so the thresholds are selection-exact
    and engine-reproducible: deviations are |v − med| in double (one
    subtraction per row), counts are integers, and the only rounding
    is the 6-place display round.  Scale shape: two quantile passes
    (each one keyed shuffle) + one broadcast-back join + one counting
    aggregation; nothing driver-side.

    Returns (group cols..., n_rows, med, mad, n_outliers,
    outlier_ppm) — outlier_ppm an exact integer parts-per-million
    (n_outliers·1e6 div n_rows)."""
    from dudb_spark.operators.quantiles import grouped_quantiles

    med = grouped_quantiles(df, group_cols, value_col, [0.5], ["med"])
    vals = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("double").alias("_v")
    )
    dev = vals.join(F.broadcast(med.select(*group_cols, "med")),
                    group_cols).select(
        *group_cols, "med",
        F.abs(F.col("_v") - F.col("med")).alias("_d"),
    )
    mad = grouped_quantiles(dev, group_cols, "_d", [0.5], ["mad"])
    thr = F.broadcast(
        med.select(*group_cols, "n_rows", "med")
        .join(mad.select(*group_cols, "mad"), group_cols)
    )
    counted = (
        vals.join(thr, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(
                F.when(
                    F.abs(F.col("_v") - F.col("med"))
                    > F.lit(float(k)) * F.col("mad"),
                    1,
                )
            ).alias("n_outliers"),
        )
    )
    return counted.select(
        *group_cols,
        "n_rows",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "n_outliers",
        F.expr("n_outliers * 1000000 div n_rows").alias("outlier_ppm"),
    ).orderBy(*group_cols)


def fd_violations(
    df: DataFrame,
    lhs: list[str],
    rhs: str,
) -> DataFrame:
    """Functional-dependency audit ``lhs → rhs``: every left-hand-side
    group carrying MORE than one distinct right-hand value, with its
    row count and distinct-value count — the key-discovery / schema-
    inference primitive of a profiling pass (a clean FD means ``rhs``
    can be normalized out; violations localize the dirty keys), and
    the generalization of q112's uniqueness check from "is this a
    key" to "does this key determine that column".

    One grouped aggregation with a single exact COUNT(DISTINCT) —
    Spark plans a single-distinct agg as the standard two-phase
    hash aggregate (no Expand, which only multi-distinct aggs pay);
    NULL rhs values count as a distinct value when mixed with
    non-NULLs?  No: COUNT(DISTINCT) ignores NULLs in both engines —
    documented, so an lhs group with {x, NULL} reports n_rhs = 1.

    Returns (lhs..., n_rows, n_rhs) for violating groups only."""
    return (
        df.groupBy(*lhs)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(rhs).alias("n_rhs"),
        )
        .where(F.col("n_rhs") > 1)
        .orderBy(*lhs)
    )
