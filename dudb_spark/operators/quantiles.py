"""Scale-safe EXACT grouped quantiles (order statistics + linear
interpolation), computed without buffering a group in memory.

Spark's built-in exact ``percentile`` aggregate collects every value of a
group into one aggregation buffer — fine for bounded groups, an OOM at
100 TB when a group holds billions of rows.  This operator computes the
same numbers from order statistics:

1. rank every row within its group (``row_number`` window — Spark's
   window sort is the spillable ExternalSorter, so a giant group costs
   disk, not heap);
2. derive, per group and requested quantile p, the two target ranks
   ``lo = floor(p*(n-1))`` / ``hi = ceil(p*(n-1))`` from the group's row
   count (a tiny aggregate broadcast back onto the ranked frame);
3. semi-join the ranked frame to exactly those ranks (everything else is
   filtered before the final aggregation) and interpolate
   ``(hi - r) * v_lo + (r - lo) * v_hi`` — bit-for-bit THE formula
   Spark's ``percentile`` applies, so results agree bit-for-bit.

Cost: one count aggregate + one window shuffle/sort on the group key +
a broadcast join of the (groups × quantiles) target frame.  Nothing
holds more than a partition's sort run in memory.

**Global quantiles are ranked in two phases, never one task.**  With
``group_cols=[]`` (corpus-wide quantiles) — or when the caller passes a
*constant* group key, which Catalyst folds out of the window spec,
silently turning ``row_number().over(partitionBy(_g))`` into an
unpartitioned window that sorts the whole input in ONE task — ranking
routes through the classic two-phase parallel rank instead (the
operators/prefix.py pattern): ``repartitionByRange`` on the value (so
partition i holds a contiguous sorted slice), per-partition
``row_number`` keyed by ``spark_partition_id()``, and a broadcast of
per-partition exclusive count offsets.  Range partitioning preserves
order between partitions, so local rank + offset IS the global rank;
ties may split across a boundary, but the value at any rank is
identical under every tie order, so quantiles are deterministic.  The
constant-key case is caught by inspecting the optimized plan of the
grouped window: if the partition spec folded away, the two-phase path
is used (the folded key is provably single-group, so global rank ==
per-group rank).

The reference engine has no quantiles at all (SURVEY.md §2.3); q45 uses
the built-in exact aggregate (bounded groups), and this operator is the
drop-in for unbounded groups; ``percentile_approx`` remains the
constant-memory alternative when declared error is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dudb_spark.operators.prefix import exclusive_offsets


def _window_folded_unpartitioned(ranked: DataFrame) -> bool:
    """True when Catalyst constant-folded the window's partition spec
    away (a literal group key), i.e. the optimized plan's Window node has
    only an order spec.  Plan text shape: partitioned windows print
    ``Window [exprs], [part], [order]`` (two ``], [`` separators),
    folded ones print ``Window [exprs], [order]`` (one)."""
    try:
        plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - plan text is best-effort
        return False
    for line in plan.splitlines():
        node = line.lstrip(" +-:")
        if node.startswith("Window ["):
            return node.count("], [") < 2
    return False


def _two_phase_global_rank(vals: DataFrame) -> DataFrame:
    """0-based global rank over ``_v`` without a single-task window:
    range-partition on the value, rank locally per partition, add the
    broadcast exclusive prefix of per-partition counts (the
    operators/prefix.py:41 two-phase pattern).  Extra columns (e.g. a
    constant group key) pass through untouched."""
    n = int(
        vals.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    d = vals.repartitionByRange(n, F.col("_v")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid").orderBy("_v")
    local = d.withColumn("_lrn", F.row_number().over(w_local))
    # one row per partition — exclusive prefix via the windowless
    # non-equi join (prefix.exclusive_offsets), so NO WindowExec in the
    # whole plan is unpartitioned
    offsets = exclusive_offsets(
        local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_pn")), "_pn"
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_rn", F.col("_lrn") - 1 + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: list[float],
    names: list[str] | None = None,
) -> DataFrame:
    """One row per group: ``n_rows`` plus one column per quantile.

    ``names`` labels the quantile columns (default ``q50``-style from the
    fraction).  Null values are excluded (matching the built-in
    ``percentile``'s null handling).
    """
    names = names or [f"q{int(round(p * 100))}" for p in ps]
    gcols = [F.col(c) for c in group_cols]
    vals = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, F.col(value_col).cast("double").alias("_v")
    )

    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy("_v")
        ranked = vals.withColumn("_rn", F.row_number().over(w) - 1)
        if _window_folded_unpartitioned(ranked):
            # constant group key: provably one group, so the two-phase
            # global rank is the per-group rank (see module docstring)
            ranked = _two_phase_global_rank(vals)
    else:
        ranked = _two_phase_global_rank(vals)

    counts = vals.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    # (group, quantile) -> the two ranks to fetch and the interpolation
    # fraction.  r = p*(n-1); lo==hi when r is integral (then frac==0 and
    # only lo is fetched).
    quant_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("_qi"),
                F.lit(p).cast("double").alias("_p"),
            )
            for i, p in enumerate(ps)
        ]
    )
    targets = (
        counts.withColumn("_q", F.explode(quant_structs))
        .select(
            *group_cols,
            "n_rows",
            F.col("_q._qi").alias("_qi"),
            (F.col("_q._p") * (F.col("n_rows") - 1)).alias("_r"),
        )
        .withColumn("_lo", F.floor("_r").cast("long"))
        .withColumn("_hi", F.ceil("_r").cast("long"))
    )
    # fetch rows at the needed ranks only: explode each target to its
    # (rank, role) probes and broadcast-join onto the ranked frame
    probes = targets.select(
        *group_cols,
        "n_rows",
        "_qi",
        "_r",
        "_lo",
        F.explode(
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.array(
                    F.struct(F.col("_lo").alias("_rn"), F.lit("lo").alias("_role")),
                    F.struct(F.col("_hi").alias("_rn"), F.lit("hi").alias("_role")),
                ),
            ).otherwise(
                F.array(
                    F.struct(F.col("_lo").alias("_rn"), F.lit("lo").alias("_role"))
                )
            )
        ).alias("_probe"),
    ).select(
        *group_cols,
        "n_rows",
        "_qi",
        "_r",
        "_lo",
        F.col("_probe._rn").alias("_rn"),
        F.col("_probe._role").alias("_role"),
    )
    hit = ranked.join(F.broadcast(probes), [*group_cols, "_rn"])
    per_q = hit.groupBy(*group_cols, "n_rows", "_qi", "_r", "_lo").agg(
        F.max(F.when(F.col("_role") == "lo", F.col("_v"))).alias("_vlo"),
        F.max(F.when(F.col("_role") == "hi", F.col("_v"))).alias("_vhi"),
    )
    # Spark's Percentile.getPercentile computes the weighted-sum form
    # (higher - rank) * v_lo + (rank - lower) * v_hi — NOT
    # v_lo + frac * (v_hi - v_lo); the two differ at the last ulp, so the
    # same form is used here for bit-parity (pinned by
    # test_matches_builtin_percentile).  hi == lo + 1 whenever a hi row
    # exists (r non-integral).
    interp = per_q.withColumn(
        "_qv",
        F.when(F.col("_vhi").isNull(), F.col("_vlo")).otherwise(
            (F.col("_lo") + 1 - F.col("_r")) * F.col("_vlo")
            + (F.col("_r") - F.col("_lo")) * F.col("_vhi")
        ),
    )
    out = interp.groupBy(*group_cols, "n_rows").pivot(
        "_qi", list(range(len(ps)))
    ).max("_qv")
    return out.select(
        *gcols,
        F.col("n_rows"),
        *[F.col(f"`{i}`").alias(names[i]) for i in range(len(ps))],
    )


def weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    ps: list[float],
    names: list[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """EXACT weighted quantiles per group: for each ``p`` the smallest
    value whose cumulative weight reaches ``p·W`` (the lower weighted
    quantile, no interpolation) — what "median price weighted by
    quantity" or "token-budget p90 doc length" actually mean, where
    the unweighted family treats every row the same.

    Determinism: rows totally ordered by (value, id); the running
    weight sum is a KEYED window in that order, so the sequential
    double additions happen in one fixed order on any engine —
    bit-identical cumulative weights, and the ``cum >= p·W``
    threshold is formed in the same op order both sides.  NULL and
    non-positive weights drop (the weighted-sample contract).

    Scale shape: one keyed sort window (spillable) + one ≤|groups|-row
    totals fold + one bounded filter-argmin per requested quantile —
    no global windows, no self-joins.

    Returns (group cols..., n_rows, total_weight, <one col per p>)."""
    names = names or [f"wq{int(round(p * 100))}" for p in ps]
    wc = F.col(weight_col)
    vals = df.where(wc.isNotNull() & (wc > 0)).select(
        *group_cols,
        F.col(value_col).cast("double").alias("_v"),
        wc.cast("double").alias("_w"),
        *( [F.col(id_col).alias("_id")] if id_col else
           [F.lit(0).alias("_id")] ),
    )
    w = (
        Window.partitionBy(*group_cols).orderBy("_v", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pinned: the sorted cumulative frame feeds the totals fold AND the
    # quantile selection — unpinned, the spillable sort window executed
    # once per consumer (r11: 4 window sorts of the whole input for 3
    # quantiles; now exactly one)
    cum = vals.withColumn("_cw", F.sum("_w").over(w)).localCheckpoint()
    # total weight = the LAST cumulative value (max of a monotone
    # column), NOT a separate unordered double fold — the sequential
    # window order makes it bit-identical on any engine even for
    # arbitrary double weights
    totals = cum.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("_cw").alias("total_weight"),
    )
    # ALL requested quantiles fold in ONE pass as conditional argmins
    # (min over a when-guard ≡ min over the filtered frame): was one
    # broadcast-join + filter + agg + equi-join PER p — for every p in
    # (0, 1] the last row of a group satisfies _cw = W ≥ p·W, so each
    # conditional min is non-NULL and the rewrite is value-identical
    # to the old per-p inner joins
    hit = (
        cum.join(
            F.broadcast(totals.select(*group_cols, "total_weight")),
            group_cols,
        )
        .groupBy(*group_cols)
        .agg(*[
            F.min(
                F.when(
                    F.col("_cw")
                    >= F.lit(float(p)) * F.col("total_weight"),
                    F.col("_v"),
                )
            ).alias(name)
            for p, name in zip(ps, names)
        ])
    )
    return totals.join(hit, group_cols).orderBy(*group_cols)


def rank_normalize(
    df: DataFrame,
    signal_cols: list[str],
    id_col: str,
    weights: list[float] | None = None,
) -> DataFrame:
    """Percentile-rank normalization + weighted blend of quality
    signals — the RefinedWeb-style ensembling move: raw signals live
    on incomparable scales (a log-prob, a ratio, a token count), so
    each is mapped to its corpus percentile (min-rank semantics:
    fraction of OTHER rows strictly below) and the blend is a
    weighted mean of percentiles, robust to any monotone rescaling of
    any signal.

    Exactness: per signal ONE value-frequency fold, then the
    two-phase range-partitioned cumsum (operators/prefix.
    distributed_cumsum — distinct values are unique, so the order is
    total) gives each VALUE its exact integer count-of-smaller;
    percentile = smaller/(n−1) and the blend are formed in one fixed
    double op order.  Rows with a NULL in any signal drop (document
    upstream imputation instead of silently ranking NULL).  No
    unpartitioned windows anywhere; joins back to rows are
    value-keyed.

    Returns (id, <sig>_pct per signal, blended) sorted by id."""
    weights = weights or [1.0] * len(signal_cols)
    if len(weights) != len(signal_cols):
        raise ValueError("one weight per signal")
    from dudb_spark.operators.prefix import distributed_cumsum

    # materialize the narrow (id, signals) frame ONCE: every signal's
    # frequency fold and value-join re-reads it, and when signals are
    # computed expressions (tokenizer scores) re-evaluating them per
    # reference would re-scan and re-tokenize the corpus 2·|signals|
    # times (the BPE localCheckpoint discipline)
    base = (
        df.select(id_col, *signal_cols)
        .na.drop(subset=signal_cols)
        .localCheckpoint()
    )
    nr = base.agg(F.count(F.lit(1)).alias("_n"))
    out = base
    for s in signal_cols:
        freq = base.groupBy(s).agg(F.count(F.lit(1)).alias("_c"))
        cum = distributed_cumsum(freq, s, "_c", out="_cum")
        out = out.join(
            cum.select(
                s, (F.col("_cum") - F.col("_c")).alias(f"_sm_{s}")
            ),
            s,
        )
    out = out.crossJoin(F.broadcast(nr))
    wsum = float(sum(weights))
    pcts = {
        s: F.when(F.col("_n") > 1,
                  F.col(f"_sm_{s}").cast("double") / (F.col("_n") - 1)
                  ).otherwise(F.lit(0.0))
        for s in signal_cols
    }
    blend = pcts[signal_cols[0]] * F.lit(float(weights[0]))
    for s, w in zip(signal_cols[1:], weights[1:]):
        blend = blend + pcts[s] * F.lit(float(w))
    return out.select(
        id_col,
        *[F.round(pcts[s], 9).alias(f"{s}_pct") for s in signal_cols],
        F.round(blend / F.lit(wsum), 9).alias("blended"),
    ).orderBy(id_col)
