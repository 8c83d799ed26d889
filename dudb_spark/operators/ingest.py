"""Incremental ingest: merge a fresh scan into the stored metadata DB.

Reference behaviour (analyze.go):

- J1 unchanged-skip: a directory whose (mtime, mode) both match the stored
  record is "unchanged" — its file entries are reused, not re-stat'ed
  (analyze.go:226–243; prefixinfo.T.Unchanged, prefixinfo.go:110–116).
  Counters: ``parent_unchanged`` / ``children_unchanged`` (progress.go:19–35).
- J2 deletion detection: children present in the stored record but absent
  from the fresh scan are purged recursively (analyze.go:383–424 →
  DeletePrefix, badgerdb.go:197–230).  Counter: ``prefixes_deleted``.
- Every run appends one summary row to the log bucket
  (summarizeAndLog, analyze.go:144–161).

Spark shape: the staged scan and the previous snapshot are joined once on
``path`` (full outer, subtree-restricted); the join classifies every
directory as added / changed / unchanged / deleted, and the new snapshot is
assembled from staged rows (added/changed), previous rows (unchanged — their
file entries are *reused*, which is exactly the re-stat skip), and previous
rows outside the scanned subtree.  On a real deployment this is a Delta/
Iceberg ``MERGE INTO`` with partition-level rewrite limited to the scanned
subtree; with plain Parquet we write a fresh versioned snapshot directory
(timestamped dirs + a ``latest`` pointer, mirroring the reference's report
layout, reports.go:128–176).  The join keys on ``path`` — with both sides
bucketed by path at scale this is a co-partitioned merge with no wide
shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dudb_spark.operators.find import subtree_pred


@dataclass
class MergeResult:
    prefixes: DataFrame
    entries: DataFrame
    summary: dict  # anaylzeSummary-compatible counters
    # paths classified added/changed/deleted by this merge (one 'path'
    # column) — the seed set for incremental stats maintenance
    # (operators/incremental.py); unchanged and out-of-root paths are
    # absent by construction.
    touched: DataFrame = None


def merge_scan(
    prev_prefixes: DataFrame,
    prev_entries: DataFrame,
    staged_prefixes: DataFrame,
    staged_entries: DataFrame,
    root: str = "",
    with_summary: bool = True,
    force: bool = False,
) -> MergeResult:
    """Merge a staged (fresh) scan of ``root`` into the previous snapshot.

    ``force=True`` bypasses the J1 unchanged-skip (the reference's
    ``analyze`` re-scan override): every alive directory classifies as
    changed, so its entries are rewritten from the staged scan instead
    of reused from the previous snapshot — the corrupted-snapshot
    recovery path.  Deletion detection and the summary counters still
    run (``parent_unchanged`` reports 0 by construction).

    Contract: ``staged_prefixes`` must contain a row for EVERY directory
    currently alive under ``root`` — the scanner may skip re-statting an
    unchanged directory's files, but it must still descend and list child
    directories (exactly what the reference does: analyze.go:313–331
    restats child dirs even when the parent is unchanged).  Otherwise
    deletion detection would misread a skipped subtree as deleted.
    ``staged_entries`` MAY omit entries of unchanged directories; the merge
    reuses the previous entries for every unchanged directory regardless.

    ``with_summary=False`` skips the two counter jobs (classification
    aggregate + post-merge file count) and returns ``summary=None`` —
    for callers that apply many merges in a loop (the streaming-upsert
    composition) and only read the final state, the per-merge counters
    are pure overhead.
    """
    in_root_prev = prev_prefixes.where(subtree_pred(F.col("path"), root))
    out_root_prev = prev_prefixes.where(~subtree_pred(F.col("path"), root))

    s = staged_prefixes.alias("s")
    p = in_root_prev.alias("p")
    j = s.join(p, F.col("s.path") == F.col("p.path"), "full_outer").select(
        F.coalesce(F.col("s.path"), F.col("p.path")).alias("path"),
        F.col("s.path").isNotNull().alias("in_new"),
        F.col("p.path").isNotNull().alias("in_old"),
        (
            F.lit(False) if force else (
                F.col("s.path").isNotNull()
                & F.col("p.path").isNotNull()
                & (F.col("s.mtime") == F.col("p.mtime"))
                & (F.col("s.mode") == F.col("p.mode"))
            )
        ).alias("unchanged"),
    )
    j = j.cache()

    if with_summary:
        # All four summary counters in ONE job over the classification
        # join (four separate .count() actions would recompute/rescan it
        # 4×; at ingest scale the classification is the expensive part).
        # count(when) rather than sum(when) so empty inputs yield 0, not
        # NULL.
        c = j.agg(
            F.count(F.when(F.expr("in_new AND NOT in_old"), 1)).alias("n_new"),
            F.count(F.when(F.col("unchanged"), 1)).alias("n_unchanged"),
            F.count(
                F.when(F.expr("in_new AND in_old AND NOT unchanged"), 1)
            ).alias("n_changed"),
            F.count(
                F.when(F.expr("in_old AND NOT in_new"), 1)
            ).alias("n_deleted"),
        ).first()
        n_new, n_unchanged, n_changed, n_deleted = (
            c["n_new"], c["n_unchanged"], c["n_changed"], c["n_deleted"],
        )

    unchanged_paths = j.where("unchanged").select("path")
    changed_or_new = j.where("in_new AND NOT unchanged").select("path")

    new_prefixes = (
        staged_prefixes.join(changed_or_new, "path", "left_semi")
        .unionByName(in_root_prev.join(unchanged_paths, "path", "left_semi"))
        .unionByName(out_root_prev)
    )

    in_root_prev_entries = prev_entries.where(subtree_pred(F.col("parent"), root))
    out_root_prev_entries = prev_entries.where(
        ~subtree_pred(F.col("parent"), root)
    )
    reused = in_root_prev_entries.join(
        unchanged_paths.withColumnRenamed("path", "parent"), "parent", "left_semi"
    )
    fresh = staged_entries.join(
        changed_or_new.withColumnRenamed("path", "parent"), "parent", "left_semi"
    )
    new_entries = fresh.unionByName(reused).unionByName(out_root_prev_entries)

    if with_summary:
        n_files = new_entries.where(~F.col("is_dir")).count()
        summary = {
            "operation": "analyze",
            "prefixes_started": n_new + n_changed + n_unchanged,
            "prefixes_finished": n_new + n_changed + n_unchanged,
            "files": n_files,
            "parent_unchanged": n_unchanged,
            "children_unchanged": n_unchanged,
            "prefixes_deleted": n_deleted,
            "prefixes_added": n_new,
            "prefixes_changed": n_changed,
        }
    else:
        summary = None
    touched = j.where(~F.col("unchanged")).select("path")
    return MergeResult(new_prefixes, new_entries, summary, touched)


def snapshot_diff(
    prev_prefixes: DataFrame,
    prev_entries: DataFrame,
    new_prefixes: DataFrame,
    new_entries: DataFrame,
) -> DataFrame:
    """Time-travel diff between two stored snapshot versions: one row per
    path that was added, removed, or changed, with the byte delta — the
    ``idu database`` analog of ``delta table history`` for the versioned
    snapshot directories written by :func:`write_snapshot`.

    "Changed" compares size, mtime, mode, uid, and gid: stats results
    depend on ownership and mode (per-user/group attribution, boolexpr
    predicates), so a chmod/chown — which bumps ctime, not mtime — must
    surface here or the CLI's incremental touched derivation would miss
    it and diverge from a full refold.

    Shape: a full-outer join per table keyed on path — with snapshots
    bucketed by path this is a co-partitioned merge, and the output is
    bounded by the change volume, not the tree size.  Unchanged rows are
    dropped before any downstream consumer sees them.
    """

    watched = ("size", "mtime", "mode", "uid", "gid")

    def diff(prev: DataFrame, new: DataFrame, kind: str) -> DataFrame:
        p = prev.select(
            F.col("path"),
            F.lit(True).alias("_pin"),
            *[F.col(c).alias(f"_p{c}") for c in watched],
        ).alias("p")
        n = new.select(
            F.col("path"),
            F.lit(True).alias("_nin"),
            *[F.col(c).alias(f"_n{c}") for c in watched],
        ).alias("n")
        j = p.join(n, "path", "full_outer")
        differs = None
        for c in watched:
            d = ~(F.col(f"_n{c}").eqNullSafe(F.col(f"_p{c}")))
            differs = d if differs is None else (differs | d)
        status = (
            F.when(F.col("_pin").isNull(), F.lit("added"))
            .when(F.col("_nin").isNull(), F.lit("removed"))
            .when(differs, F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        return j.select(
            F.lit(kind).alias("kind"),
            "path",
            status.alias("status"),
            (
                F.coalesce(F.col("_nsize"), F.lit(0))
                - F.coalesce(F.col("_psize"), F.lit(0))
            ).alias("bytes_delta"),
        ).where(F.col("status") != "unchanged")

    return diff(prev_prefixes, new_prefixes, "prefix").unionByName(
        diff(
            prev_entries.where(~F.col("is_dir")),
            new_entries.where(~F.col("is_dir")),
            "file",
        )
    )


def write_snapshot(result: MergeResult, db_root: str, version: str) -> None:
    """Persist a merged snapshot as a new versioned directory (Parquet
    stand-in for Delta MERGE; ``latest`` pointer = max version string)."""
    out = f"{db_root.rstrip('/')}/{version}"
    result.prefixes.write.mode("overwrite").parquet(f"{out}/prefixes.parquet")
    result.entries.write.mode("overwrite").parquet(f"{out}/entries.parquet")
