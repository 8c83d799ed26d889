"""Incremental stats maintenance: update a stored ``stats compute``
snapshot after a ``merge_scan`` without re-folding the whole tree.

The reference re-runs ``idu analyze`` incrementally (unchanged-skip,
analyze.go:226–243) but recomputes stats from scratch each time
(``idu stats compute`` walks the full stored DB, stats.go:150–209).  At
100 TB a 0.1 % nightly change makes the full refold the dominant cost —
this operator is the scale path: re-fold ONLY the directories a merge
touched, plus the closure needed to keep hardlink dedup exact, and stitch
the result onto the previous summary tables.

Exactness argument (why the closure suffices)
---------------------------------------------
The fold is per-directory-local EXCEPT for hardlink dedup: a row's
``_is_dup`` flag depends on the other members of its (device, inode)
group (lexicographically-first path wins, stats.py:105–110).  So:

1. Seed: the merge's added/changed/deleted paths (``MergeResult.touched``).
2. Support keys *I*: every (device, inode) appearing under a seed path in
   the previous OR merged snapshot — groups that gained, lost, or kept a
   member there.  Any group NOT in *I* has identical membership before
   and after the merge, so its flags are unchanged.
3a. First-round closure: seeds ∪ parents of merged rows whose key ∈ *I*.
3b. Flip-round closure: a *directory record* whose key ∈ *I* may flip its
   own dup flag (its record group gained or lost a member), and a flipped
   directory's ENTRIES enter or leave the file-dedup windows — which can
   flip file canonicals under directories nowhere near the seed.  So take
   *F* = paths of merged records with key ∈ *I* (the only records that
   can flip: record-group membership changes only under seeds), collect
   *I₂* = keys under *F* (prev OR new), and add parents of merged rows
   with key ∈ *I₂*.  No further rounds are needed: flips occur only in
   groups whose record membership changed (⊆ *I*), so after this round
   every group whose window membership changed (⊆ *I* ∪ *I₂*) has all its
   members' parents in *A*.
4. Flag support: folding *A* exactly needs the flags of every row under
   *A*; a flag is exact when the row's whole group is present.  Groups
   with a member under a seed lie entirely inside *A* (their parents are
   in *A* by step 3).  Other groups under *A* have unchanged membership —
   recomputing their flag over the full group (pulling members whose
   parents are outside *A* into the fold INPUT, discarding those parents'
   partial output rows) reproduces the stored flags.

The refold input is therefore: prefixes with path ∈ *A* plus record-key
group support, entries with key ∈ keys(entries under *A*).  Everything
else rides over from the previous summary unchanged.

Cost shape: three semi-joins on (device, inode) / path over the merged
snapshot — each a broadcast join at realistic change rates — plus a fold
over the touched slice.  Nothing scans proportional to tree size except
the narrow semi-join probes, which prune to (parent, device, inode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dudb_spark.operators.stats import StatsOptions, StatsResult, compute_stats

_KEY = ["device", "inode"]


def _keys_under(paths: DataFrame, prefixes: DataFrame, entries: DataFrame):
    """Distinct (device, inode) of records and entries under ``paths``."""
    pfx = prefixes.join(paths, "path", "left_semi").select(*_KEY)
    ent = entries.join(
        paths.withColumnRenamed("path", "parent"), "parent", "left_semi"
    ).select(*_KEY)
    return pfx.unionByName(ent).distinct()


def incremental_stats(
    prev: StatsResult,
    prev_prefixes: DataFrame,
    prev_entries: DataFrame,
    new_prefixes: DataFrame,
    new_entries: DataFrame,
    touched: DataFrame,
    opts: StatsOptions | None = None,
    pin_inputs: bool = True,
) -> StatsResult:
    """New summary tables after a merge, folding only the touched slice.

    ``opts`` must equal the options of the fold that produced ``prev``
    (same root/expr/calculator) — the rows carried over are reused
    verbatim.  ``touched`` is ``MergeResult.touched``.

    ``pin_inputs``: the merged snapshot feeds every later stage; when it
    is an unwritten merge DAG (the q77 gate shape) the lazy plan would
    re-execute the whole merge once per fold branch, so it is
    localCheckpoint'ed.  Pass ``False`` when ``new_prefixes``/
    ``new_entries`` are plain scans of a stored snapshot (the production
    path — the CLI does) — checkpointing would pointlessly materialize
    the full table.  The closure sets below are tiny by construction
    (change-rate × tree), so those pins are cheap at any scale.
    """
    opts = opts or StatsOptions()
    if pin_inputs:
        new_prefixes = new_prefixes.localCheckpoint()
        new_entries = new_entries.localCheckpoint()
    touched = touched.select("path").distinct().localCheckpoint()

    def _group_keys(paths: DataFrame) -> DataFrame:
        """Keys present under ``paths`` in the previous OR merged snapshot."""
        return (
            _keys_under(paths, prev_prefixes, prev_entries)
            .unionByName(_keys_under(paths, new_prefixes, new_entries))
            .distinct()
        )

    def _via(keys: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(parents of merged entries, paths of merged records) in ``keys``."""
        ent = (
            new_entries.join(keys, _KEY, "left_semi")
            .select(F.col("parent").alias("path"))
        )
        rec = new_prefixes.join(keys, _KEY, "left_semi").select("path")
        return ent, rec

    # 2. support keys: groups with a member under a seed, before or after
    seed_keys = _group_keys(touched).localCheckpoint()

    # 3a. first round: seeds ∪ parents of merged rows in seed groups
    via_entries, via_records = _via(seed_keys)
    via_records = via_records.localCheckpoint()

    # 3b. flip round: records in seed groups can flip their dir-level dup
    # flag, moving their entries in/out of the file-dedup windows — pull in
    # the parents of every merged row sharing a key with anything under a
    # potentially-flipping record.  One round closes the cascade (flips
    # happen only in groups whose record membership changed, i.e. seed
    # groups), restoring the exact-hardlink-closure contract for
    # dir-hardlink promotions/demotions (round-2 advice repro:
    # test_incremental.py::test_dir_hardlink_flip_cascade).
    flip_keys = _group_keys(via_records)
    via_entries2, via_records2 = _via(flip_keys)

    affected = (
        touched.unionByName(via_entries)
        .unionByName(via_records)
        .unionByName(via_entries2)
        .unionByName(via_records2)
        .distinct()
        .localCheckpoint()
    )

    # 4. fold input: full groups of every key present under *A*
    support_keys = _keys_under(affected, new_prefixes, new_entries)
    fold_entries = new_entries.join(
        support_keys, _KEY, "left_semi"
    ).localCheckpoint()
    fold_parents = fold_entries.select(
        F.col("parent").alias("path")
    ).unionByName(affected).distinct()
    fold_prefixes = new_prefixes.join(fold_parents, "path", "left_semi")
    # prefix-record dedup groups need the same completeness
    record_keys = fold_prefixes.select(*_KEY).distinct()
    fold_prefixes = new_prefixes.join(
        fold_prefixes.select("path")
        .unionByName(
            new_prefixes.join(record_keys, _KEY, "left_semi").select("path")
        )
        .distinct(),
        "path",
        "left_semi",
    ).localCheckpoint()

    res = compute_stats(fold_prefixes, fold_entries, opts)

    def stitch(prev_df: DataFrame, new_df: DataFrame, key: str) -> DataFrame:
        keep = prev_df.join(
            affected.withColumnRenamed("path", key), key, "left_anti"
        )
        fresh = new_df.join(
            affected.withColumnRenamed("path", key), key, "left_semi"
        )
        return keep.unionByName(fresh)

    return StatsResult(
        stitch(prev.per_prefix, res.per_prefix, "prefix"),
        stitch(prev.per_user, res.per_user, "prefix"),
        stitch(prev.per_group, res.per_group, "prefix"),
        dict(prev.meta, incremental=True),
    )
