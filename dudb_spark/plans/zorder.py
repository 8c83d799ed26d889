"""Z-order (Morton) layout for multi-column data skipping.

Parquet/Delta data skipping works off per-file min/max ranges; sorting by
one column gives perfect pruning on that column and none on the others.
Interleaving the bits of several columns' normalized values and
range-partitioning on the result gives every interleaved column
sub-linear per-file ranges — the OPTIMIZE ZORDER BY path of lakehouse
engines, here as a plain repartitionByRange + sortWithinPartitions that
any writer can use before ``.write.parquet``.

All arithmetic is integer-exact (affine normalization to 16 bits with
BIGINT multiply + ``div`` floor division, then bit interleave) so an
external engine can replay the key bit-for-bit — no float rounding in
the layout decision, which is what makes q80 value-certifiable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BITS = 16
_SCALE = (1 << BITS) - 1  # normalize to 0..65535


def _norm_expr(c: str) -> str:
    """(x−lo)·65535 div (hi−lo), exact BIGINT arithmetic; constant
    columns normalize to 0."""
    return (
        f"CAST(((CAST({c} AS BIGINT) - _lo_{c}) * {_SCALE}) "
        f"DIV GREATEST(_hi_{c} - _lo_{c}, 1) AS BIGINT)"
    )


def _z_expr(cols: list[str]) -> str:
    """Interleave the low 16 bits of staged ``_n_<col>`` columns: bit k
    of column j → position k·n + j.  Operates on BOUND attributes, not
    inlined normalization expressions — a lambda body re-evaluates its
    free expressions per element (the repo's documented transform()
    hazard), so the normalization is staged as its own projection."""
    n = len(cols)
    parts = [
        f"AGGREGATE(SEQUENCE(0, {BITS - 1}), CAST(0 AS BIGINT), "
        f"(acc, k) -> acc + SHIFTLEFT(SHIFTRIGHT(_n_{c}, k) & 1, "
        f"k * {n} + {j}))"
        for j, c in enumerate(cols)
    ]
    return " + ".join(parts)


def with_z(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add a ``z`` column from integer-valued ``cols`` (one agg pass for
    per-column bounds, broadcast back — same shape as quantize.py)."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("long")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("long")).alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    staged = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        staged = staged.withColumn(f"_n_{c}", F.expr(_norm_expr(c)))
    return staged.withColumn("z", F.expr(_z_expr(cols))).drop(
        *[f"_lo_{c}" for c in cols],
        *[f"_hi_{c}" for c in cols],
        *[f"_n_{c}" for c in cols],
    )


def zorder_layout(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Range-partition on z and sort within partitions — each output file
    covers a compact Z-curve segment, so every ``cols`` member gets tight
    per-file min/max ranges for scan pruning."""
    return (
        with_z(df, cols)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
    )
