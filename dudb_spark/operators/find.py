"""``find <prefix> <expr>`` — streaming selection over the metadata tables.

Reference behaviour (find.go:55–99): walk records in key order starting at
the root prefix, stop at the first key outside the subtree; print directory
rows that match ``Matcher.Prefix`` and, for every matching directory, print
its non-directory entries that match ``Matcher.Entry``.  ``--l`` adds a long
listing (uid/gid/size/mtime, printer.go).

Spark shape (SURVEY.md §3.3): two pushed-down filters + a union + a sort.
The subtree restriction compiles to ``path BETWEEN root AND root+MAX_CHAR``
style prefix predicates that Parquet min/max row-group stats can prune; the
expression compiles to native Columns (no UDFs), so the whole WHERE clause
reaches the scan.  The reference's early-stop (badgerdb.go:312–315) is
subsumed by partition pruning — Spark never reads row groups whose path
range can't match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dudb_spark.functions.boolexpr import compile_expr


def subtree_pred(path_col, root: str, separator: str = "/"):
    """Key-prefix restriction (find.go:75–77): path == root or under it.
    ``separator`` follows the prefix config (config.go:22) for trees
    recorded with non-'/' separators."""
    if not root or root == separator:
        return F.lit(True)
    root = root.rstrip(separator)
    return (path_col == root) | path_col.startswith(root + separator)


def find(
    prefixes: DataFrame,
    entries: DataFrame,
    root: str = "",
    expr: str = "",
    long_listing: bool = False,
    separator: str = "/",
    **compile_opts,
) -> DataFrame:
    """Return matching rows as a DataFrame ordered by path.

    Columns: ``path, is_prefix`` plus ``size, uid, gid, mtime`` when
    ``long_listing`` (find.go:36–53 printPrefix/printEntry).
    """
    p_pred = compile_expr(
        expr, mode="prefix", empty_value=True, separator=separator,
        **compile_opts,
    )
    e_pred = compile_expr(
        expr, mode="entry", empty_value=True, separator=separator,
        **compile_opts,
    )

    cols = ["path", "is_prefix"] + (
        ["size", "uid", "gid", "mtime"] if long_listing else []
    )

    dirs = (
        prefixes.where(subtree_pred(F.col("path"), root, separator) & p_pred)
        .withColumn("is_prefix", F.lit(True))
        .select(*cols)
    )
    files = (
        entries.where(
            subtree_pred(F.col("parent"), root, separator)
            & (~F.col("is_dir"))
            & e_pred
        )
        .withColumn("is_prefix", F.lit(False))
        .select(*cols)
    )
    return dirs.unionByName(files).orderBy("path")
