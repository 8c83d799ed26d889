"""Plan linter — the 100 TB scale audit as a runnable check.

Every round of development ends with the same manual review: explain
each query, look for the handful of shapes that are fine at sf0.1 and
fatal at 100 TB.  This module encodes that review so it runs in CI and
from the CLI (``python -m dudb_spark plan-lint``), the way
tests/test_plans.py pins individual operators but across ANY query.

Rules (each names the failure mode it guards):

- ``cartesian``       CartesianProduct — all-pairs row explosion; only
                      sound against a literal few-row frame, which
                      Spark plans as BroadcastNestedLoopJoin instead.
- ``nested-loop``     BroadcastNestedLoopJoin — linear scans of the
                      broadcast side per row; acceptable ONLY for tiny
                      literal frames (scalar configs, probe lists), so
                      it must be explicitly allowlisted per query.
- ``global-window``   a Window with neither PARTITION BY nor a
                      preceding bounded aggregation — the whole dataset
                      sorts through ONE task (the q116 round-6
                      scale-killer, generalized).
- ``row-python-udf``  BatchEvalPython — row-at-a-time Python UDF in the
                      hot path; Arrow (``ArrowEvalPython`` /
                      ``mapInPandas``) is the sanctioned Python escape.
- ``single-partition-run`` more than ``max_single_partition`` Exchange
                      SinglePartition nodes — bounded final aggregates
                      legitimately collapse to one partition once or
                      twice; a run of them means data-proportional work
                      is being serialized through one task.

``lint_plan`` inspects one DataFrame; ``lint_queries`` sweeps a
queries() registry with a per-query allowlist of (rule, reason) pairs —
an allowlisted finding is REPORTED with its reason, never silently
dropped, so intentional exceptions stay visible.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from dudb_spark.plans.inspect import plan_of


@dataclass
class Finding:
    rule: str
    detail: str
    allowed: str | None = None  # reason, when allowlisted


def _optimized(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def lint_plan(
    df: DataFrame, max_single_partition: int = 2
) -> list[Finding]:
    phys = plan_of(df, "simple")
    out: list[Finding] = []
    if "CartesianProduct" in phys:
        out.append(Finding("cartesian", "CartesianProduct in physical plan"))
    if "BroadcastNestedLoopJoin" in phys:
        out.append(
            Finding("nested-loop", "BroadcastNestedLoopJoin in physical plan")
        )
    if "BatchEvalPython" in phys:
        out.append(
            Finding("row-python-udf", "row-at-a-time Python UDF (BatchEvalPython)")
        )
    n_single = phys.count("SinglePartition")
    if n_single > max_single_partition:
        out.append(
            Finding(
                "single-partition-run",
                f"{n_single} Exchange SinglePartition nodes "
                f"(cap {max_single_partition})",
            )
        )
    # unpartitioned windows, from the OPTIMIZED plan.  A Window node
    # prints `Window [exprs]` plus up to two trailing lists — partition
    # spec and/or order spec, either of which may be absent.  With both
    # present there are >= 2 `], [` separators: fine.  With one, the
    # trailing list is an ORDER spec iff it carries ASC/DESC sort
    # directions — that's an ordered window with NO partition (the
    # whole dataset sorts through one task).  A partitioned-but-
    # unordered window (count() OVER (PARTITION BY ...)) also prints
    # one separator but no sort direction: fine.  Zero separators is a
    # single global unordered group: flag.
    for ln in _optimized(df).splitlines():
        body = ln.lstrip(" +-:")
        if not body.startswith("Window ["):
            continue
        n_sep = body.count("], [")
        if n_sep >= 2:
            continue
        if n_sep == 0:
            out.append(Finding("global-window", body[:160]))
            continue
        tail = body.rsplit("], [", 1)[1]
        if " ASC" in tail or " DESC" in tail:
            out.append(Finding("global-window", body[:160]))
    return out


def lint_queries(
    queries: dict, spark, sf_dir: str,
    allow: dict[str, dict[str, str]] | None = None,
    max_single_partition: int = 2,
) -> dict[str, list[Finding]]:
    """Sweep a queries() registry.  ``allow`` maps query name →
    {rule: reason}; matching findings are marked allowed (and still
    returned).  Returns only queries with findings."""
    allow = allow or {}
    results: dict[str, list[Finding]] = {}
    for name, fn in queries.items():
        findings = lint_plan(fn(spark, sf_dir), max_single_partition)
        for f in findings:
            reason = allow.get(name, {}).get(f.rule)
            if reason is not None:
                f.allowed = reason
        if findings:
            results[name] = findings
    return results
