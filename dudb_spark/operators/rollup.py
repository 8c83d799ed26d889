"""Recursive subtree rollup — `du`-style hierarchical totals.

The reference explicitly does NOT roll directory sizes up to ancestors:
each prefix's totals cover only its own record (SURVEY.md §2.3 note;
internal/reports/report_stats.go:231-245 accumulates per-prefix rows
independently).  This operator is the natural Spark extension users of
`du`-like tooling expect: for every directory, the totals of its ENTIRE
subtree.

Scale design (the naive formulations both fail at 100 TB):

- A prefix-LIKE join (``e.parent LIKE d.path || '/%'``) is a quadratic
  theta-join — no equi-key, so Spark plans BroadcastNestedLoopJoin.  Dead
  at scale.
- A recursive/iterative parent→child closure is O(depth) self-join rounds,
  each a full shuffle of the fact table.
- **Ancestor explode** (used here) is linear: each entry row fans out to
  its ~depth ancestor prefixes (a native ``transform`` over the split
  path — no UDF, no join), then ONE groupBy with map-side partial
  aggregation.  Row inflation is bounded by tree depth (typically < 20),
  and the hot top-level keys (every row carries the root ancestor) are
  harmless because partial aggregation collapses them per-partition before
  the shuffle — aggregation hot keys are not join skew.

Contract: a directory's rollup covers all entry rows strictly below it.
The directory's own record (its entry row in its parent) contributes to
its ancestors, not to itself — matching how `du` attributes a directory's
own block usage when summing children.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dudb_spark.plans.layout import ensure_min_parallelism


def ancestors(path: Column) -> Column:
    """Array of all ancestor prefixes of an absolute path, outermost first:
    ``/a/b/c`` → ``['/a', '/a/b', '/a/b/c']``.  Pure Catalyst expression
    (split + transform + slice), so it stays inside whole-stage codegen."""
    parts = F.split(path, "/")
    return F.transform(
        F.sequence(F.lit(2), F.size(parts)),
        lambda i: F.concat_ws("/", F.slice(parts, 1, i)),
    )


def subtree_totals(
    entries: DataFrame,
    root: str = "/",
    max_depth: int | None = None,
    block_size: int = 512,
) -> DataFrame:
    """Per-directory recursive totals over every entry in the subtree.

    Output: one row per directory that contains anything (at any depth):
    ``(dir_path, n_files, n_dirs, file_bytes, total_bytes, storage_bytes)``
    where ``file_bytes`` sums file sizes, ``total_bytes`` adds subdirectory
    own-sizes, and ``storage_bytes`` applies block rounding (A8 `block`
    calculator) to file sizes.

    ``root`` prunes the scan (pushed-down prefix predicate) AND the output;
    ``max_depth`` (relative to root, like ``du -d N``) prunes the exploded
    ancestors BEFORE the aggregation, so deep trees don't pay for output
    rows that will be discarded.
    """
    root = root.rstrip("/") or "/"  # '/data/' must match dir_path '/data'
    e = entries
    if root != "/":
        e = e.where(F.col("path").startswith(root))

    # the explode + per-ancestor path construction costs ~depth string
    # builds per row — floor the parallelism so a narrow scan doesn't
    # serialize it (no-op on wide inputs; filter above stays pushed down)
    e = ensure_min_parallelism(e.select("parent", "is_dir", "size"))
    anc = e.select(
        F.explode(ancestors(F.col("parent"))).alias("dir_path"),
        "is_dir",
        "size",
    )
    if root != "/":
        # keep the root itself plus everything under it; drop ancestors
        # above the requested subtree
        anc = anc.where(
            (F.col("dir_path") == root)
            | F.col("dir_path").startswith(root + "/")
        )
    if max_depth is not None:
        root_depth = 0 if root == "/" else root.count("/")
        # '/' splits to ['',''] (size 2) but is depth 0, not 1
        d = F.when(F.col("dir_path") == "/", F.lit(0)).otherwise(
            F.size(F.split(F.col("dir_path"), "/")) - 1
        )
        anc = anc.where(d <= root_depth + max_depth)

    is_file = ~F.col("is_dir")
    bs = F.lit(block_size)
    return anc.groupBy("dir_path").agg(
        F.sum(F.when(is_file, 1).otherwise(0)).cast("long").alias("n_files"),
        F.sum(F.when(F.col("is_dir"), 1).otherwise(0)).cast("long").alias("n_dirs"),
        F.sum(F.when(is_file, F.col("size")).otherwise(0)).cast("long").alias("file_bytes"),
        F.sum("size").cast("long").alias("total_bytes"),
        F.sum(F.when(is_file, F.ceil(F.col("size") / bs) * bs).otherwise(0))
        .cast("long")
        .alias("storage_bytes"),
    )


def top_subtrees(
    entries: DataFrame,
    n: int = 20,
    metric: str = "file_bytes",
    root: str = "/",
    max_depth: int | None = None,
) -> DataFrame:
    """`du | sort -rh | head` analog: the n heaviest subtrees.  orderBy +
    limit compiles to TakeOrderedAndProject — only n rows survive each
    partition; the full rollup is never materialized or globally sorted."""
    return (
        subtree_totals(entries, root=root, max_depth=max_depth)
        .orderBy(F.desc(metric), "dir_path")
        .limit(n)
    )
