"""Plan inspection helpers — make the scale contract testable.

``tests/test_plans.py`` pins plan shapes (pushdown, pruning, broadcast,
TakeOrderedAndProject) with these helpers; operators use them in
development to iterate on ``.explain("formatted")`` output until the plan
is the one you'd want on a 1000-executor cluster, not just the first one
that returned correct rows.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_in_plan(df: DataFrame, *needles: str, absent: tuple[str, ...] = ()):
    """Assert plan fragments are present (and optionally absent)."""
    plan = plan_of(df)
    for n in needles:
        if n not in plan:
            raise AssertionError(f"expected {n!r} in plan:\n{plan}")
    for n in absent:
        if n in plan:
            raise AssertionError(f"did not expect {n!r} in plan:\n{plan}")
    return plan


def n_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan (lower is better; a
    co-located join has zero on the pre-partitioned sides)."""
    plan = plan_of(df, "simple")
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
