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

Storage-layout note (the next rung at 100 TB): the probes are full
narrow scans here because localCheckpoint/plain-parquet stand-ins carry
no partition metadata.  Stored snapshots partitioned by an inode bucket
(``pmod(xxhash64(device, inode), N)``) would let the three KEY-side
probes (via/via2/support) dynamic-partition-prune to the churn's
buckets, and a path-bucket partitioning does the same for the two
path-side probes — turning probe cost from O(tree-narrow-scan) into
O(churn).  The closure algebra above is layout-independent, so this is
purely a writer-side choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dudb_spark.operators.stats import StatsOptions, StatsResult, compute_stats

_KEY = ["device", "inode"]


def incremental_stats(
    prev: StatsResult,
    prev_prefixes: DataFrame,
    prev_entries: DataFrame,
    new_prefixes: DataFrame,
    new_entries: DataFrame,
    touched: DataFrame,
    opts: StatsOptions | None = None,
    pin_inputs: bool = True,
    bounded_churn: bool = True,
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
    # touched/via stay lazy: their plans sit on the pinned inputs (or the
    # merge's cached classification join), so re-deriving them per
    # consumer is a narrow scan — a checkpoint here would cost a
    # synchronous job to save nothing (measured: each pin ≈ a full
    # job round-trip, the dominant cost of the certification fixture).
    # Every set below feeds ONLY semi/anti-join build sides, where
    # duplicates are harmless — so no intermediate .distinct() anywhere:
    # each one would add a whole AQE shuffle stage (measured ~0.2 s per
    # stage on the 29-dir gate) to shrink frames already bounded by the
    # change volume.
    touched = touched.select("path")

    def _bc(df: DataFrame) -> DataFrame:
        """Broadcast hint, gated: closure sets are churn-bounded only
        when the caller says so; otherwise AQE decides from real size."""
        return F.broadcast(df) if bounded_churn else df

    # ONE narrow membership view per snapshot side — (ppath, device,
    # inode) with ppath = the record's own path for prefixes and the
    # parent for entries — shared by every closure round below, instead
    # of re-deriving four projections per round.  ``mrows`` additionally
    # carries is_record so one semi-join answers both halves of the old
    # per-round "_via" pair.
    def _rows(prefixes: DataFrame, entries: DataFrame):
        return prefixes.select(
            F.col("path").alias("ppath"), *_KEY,
            F.lit(True).alias("is_record"),
        ).unionByName(
            entries.select(
                F.col("parent").alias("ppath"), *_KEY,
                F.lit(False).alias("is_record"),
            )
        )

    mrows = _rows(new_prefixes, new_entries)
    probe = _rows(prev_prefixes, prev_entries).unionByName(mrows)

    def _keys_of(paths: DataFrame) -> DataFrame:
        """Keys present under ``paths`` in the previous OR merged snapshot
        (as a multiset — only ever consumed as a semi-join build side)."""
        return probe.join(
            _bc(paths.withColumnRenamed("path", "ppath")),
            "ppath",
            "left_semi",
        ).select(*_KEY)

    # 2 + 3a. support keys of the seeds; merged rows in those groups
    # (entries contribute their parent, records their own path)
    seed_keys = _keys_of(touched)
    via = mrows.join(_bc(seed_keys), _KEY, "left_semi").select(
        F.col("ppath").alias("path"), "is_record"
    )
    via_records = via.where("is_record").select("path")

    # 3b. flip round: records in seed groups can flip their dir-level dup
    # flag, moving their entries in/out of the file-dedup windows — pull in
    # the parents of every merged row sharing a key with anything under a
    # potentially-flipping record.  One round closes the cascade (flips
    # happen only in groups whose record membership changed, i.e. seed
    # groups), restoring the exact-hardlink-closure contract for
    # dir-hardlink promotions/demotions (round-2 advice repro:
    # test_incremental.py::test_dir_hardlink_flip_cascade).
    flip_keys = _keys_of(via_records)
    via2 = (
        mrows.join(_bc(flip_keys), _KEY, "left_semi")
        .select(F.col("ppath").alias("path"))
    )

    # affected is a PATH set: members repeat once per row that matched a
    # group (a directory appears once per file in it), so dedup collapses
    # it by orders of magnitude before it is pinned and broadcast to the
    # stitches — the one distinct that pays for its shuffle stage.  The
    # KEY sets above stay multisets (inodes barely repeat; a distinct
    # there costs a stage to save nothing).
    affected = (
        touched.unionByName(via.select("path"))
        .unionByName(via2)
        .distinct()
        .localCheckpoint()
    )

    # 4. fold input: full groups of every key present under *A*
    # (mrows restricted to *A* IS "keys under affected" on the new side)
    support_keys = mrows.join(
        _bc(affected.withColumnRenamed("path", "ppath")),
        "ppath",
        "left_semi",
    ).select(*_KEY)
    fold_entries = new_entries.join(
        _bc(support_keys), _KEY, "left_semi"
    ).localCheckpoint()
    # same collapse argument: one path per folded entry -> distinct
    fold_parents = fold_entries.select(
        F.col("parent").alias("path")
    ).unionByName(affected).distinct()
    fold_prefixes = new_prefixes.join(
        _bc(fold_parents), "path", "left_semi"
    )
    # prefix-record dedup groups need the same completeness
    record_keys = fold_prefixes.select(*_KEY)
    fold_prefixes = new_prefixes.join(
        _bc(
            fold_prefixes.select("path").unionByName(
                new_prefixes.join(
                    _bc(record_keys), _KEY, "left_semi"
                ).select("path")
            )
        ),
        "path",
        "left_semi",
    ).localCheckpoint()

    res = compute_stats(fold_prefixes, fold_entries, opts)

    def stitch(prev_df: DataFrame, new_df: DataFrame, key: str) -> DataFrame:
        keep = prev_df.join(
            _bc(affected.withColumnRenamed("path", key)),
            key,
            "left_anti",
        )
        fresh = new_df.join(
            _bc(affected.withColumnRenamed("path", key)),
            key,
            "left_semi",
        )
        return keep.unionByName(fresh)

    return StatsResult(
        stitch(prev.per_prefix, res.per_prefix, "prefix"),
        stitch(prev.per_user, res.per_user, "prefix"),
        stitch(prev.per_group, res.per_group, "prefix"),
        dict(prev.meta, incremental=True),
    )
