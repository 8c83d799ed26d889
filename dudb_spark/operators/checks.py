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
