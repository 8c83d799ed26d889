"""As-of join: attach to each left row the most recent right row for the
same key (time-series point-in-time lookup).

Spark has no native as-of join (Pandas ``merge_asof`` exists only
single-node).  The classic distributed mistake is a range join
(``l.key == r.key AND r.ts <= l.ts`` + a window to keep the max) — the
inequality makes every hot key quadratic.  This implementation uses the
**union–sort trick** instead:

1. tag left rows side=0 and right rows side=1, union them into one frame;
2. one window per key ordered by (ts, side) — right rows sort *before*
   left rows at equal timestamps, so inclusive semantics fall out of the
   sort order;
3. ``last(payload, ignorenulls=True)`` carries the latest right payload
   forward onto each left row.

Cost: ONE shuffle on the join key (the same shuffle the equi-join would
need anyway), no join blow-up, and skew degrades to a big sort partition
instead of a quadratic pair explosion.  At 100 TB this is the difference
between a plan that finishes and one that doesn't: a user with 10M events
costs 10M log 10M sort comparisons, not 10M x 10M candidate pairs.

Forward as-of (earliest right row at-or-after the left row) is the mirror
image: order right rows *after* left rows and carry ``first(payload)``
over the following frame.

Determinism: if several right rows share (key, ts), ``last`` would pick an
arbitrary one, so callers must pre-reduce the right side to one row per
(key, ts) — ``asof_join`` enforces this with a deterministic reducer
(max over the payload struct) unless told the input is already unique.

The reference engine has no as-of join (its only join-shaped logic is the
incremental diff, analyze.go:226–243); this is a scale extension in the
spirit of SURVEY.md §2.9's event-table operators.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PAYLOAD = "__asof_payload"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts: str = "ts",
    direction: str = "backward",
    strict: bool = False,
    right_unique: bool = False,
) -> DataFrame:
    """Join each left row to the nearest right row per key.

    direction='backward': latest right row with ``r.ts <= l.ts``
    (``<`` when ``strict``); 'forward': earliest right row with
    ``r.ts >= l.ts``.  Right value columns (everything except the key and
    timestamp) keep their names unless they collide with a left column,
    in which case they come back as ``<name>_right``; the right timestamp
    is always ``<ts>_right``.  Left rows with no match keep NULLs
    (left-outer semantics, like ``merge_asof``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    val_cols = [c for c in right.columns if c not in (*keys, ts)]
    # Right value columns keep their names unless that would duplicate a
    # left column (ambiguous downstream select); collisions get _right,
    # and an unresolvable collision is an error, not a silent dup.
    out_names = {}
    taken = set(left.columns)
    for c in val_cols:
        name = c if c not in taken else f"{c}_right"
        if name in taken or name == f"{ts}_right":
            raise ValueError(
                f"asof_join: right column {c!r} collides with left column "
                f"{name!r}; rename it before joining"
            )
        out_names[c] = name
        taken.add(name)
    if f"{ts}_right" in left.columns:
        raise ValueError(
            f"asof_join: left already has a {ts}_right column; rename it"
        )
    payload = F.struct(
        F.col(ts).alias(f"{ts}_right"), *[F.col(c) for c in val_cols]
    )
    r = right.select(*keys, F.col(ts), payload.alias(_PAYLOAD))
    if not right_unique:
        # Deterministic reduce: one payload per (key, ts).  max over the
        # struct orders by (ts_right, val_cols...) lexicographically.
        r = r.groupBy(*keys, ts).agg(F.max(_PAYLOAD).alias(_PAYLOAD))

    lhs = left.select(
        "*",
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    rhs = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*keys, ts)],
        *keys,
        F.col(ts),
        F.col(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    ).select(*lhs.columns)
    u = lhs.unionByName(rhs)

    # Sort order decides inclusivity: in both directions an inclusive join
    # needs the right row at an equal timestamp to precede the left row in
    # iteration order so last() sees it; strict flips the tie order
    # instead of the frame.  Forward is just backward over reversed time.
    side_order = F.col(_SIDE).asc() if strict else F.col(_SIDE).desc()
    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        u.withColumn(_PAYLOAD, filled)
        .where(F.col(_SIDE) == 0)
        .drop(_SIDE)
    )
    return out.select(
        *[c for c in left.columns],
        F.col(f"{_PAYLOAD}.{ts}_right").alias(f"{ts}_right"),
        *[F.col(f"{_PAYLOAD}.{c}").alias(out_names[c]) for c in val_cols],
    )
