"""Filesystem-metadata crawler (the ingest source, reference S1).

Reference shape (analyze.go:104–123, 246–381): a concurrent tree walk with
``concurrent_scans`` directories in flight and ``concurrent_stats`` parallel
lstats per large directory, producing one record per directory.

Spark-native design — the crawl is *ingest*, not query, and it is I/O-bound
metadata work, so the right tool is a breadth-first **distributed listing**:

- ``crawl_distributed``: each BFS level is an RDD of directory paths;
  ``mapPartitions`` lists + lstats each directory's children on executors
  (this is where a 1000-executor cluster issues the reference's "1000s of
  simultaneous stat requests", README.md:12–14, against a parallel
  filesystem or object store).  Levels iterate to a fixpoint; each level
  repartitions so fan-out spreads across the cluster.  Rows feed the
  ``prefixes``/``entries`` writers.
- ``crawl_local``: a plain single-process scandir walk with a thread pool —
  the developer-scale path, and the row-shape oracle for tests.

Both produce exactly the model.py schemas.  Exclusions (S3) and symlink
no-descend (S2) are applied at scan time like the reference
(analyze.go:201–210, 260–265).
"""

from __future__ import annotations

import os
import re
import stat as stat_mod
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

from dudb_spark.model import (
    ENTRIES_SCHEMA,
    ERRORS_SCHEMA,
    PREFIXES_SCHEMA,
)


def _entry_row(parent: str, name: str, st, is_dir: bool) -> dict:
    return {
        "parent": parent,
        "name": name,
        "path": f"{parent.rstrip('/')}/{name}",
        "is_dir": is_dir,
        "size": int(st.st_size),
        "blocks": int(getattr(st, "st_blocks", 0)),
        "mode": int(st.st_mode),
        "mtime": datetime.fromtimestamp(st.st_mtime, tz=timezone.utc),
        "uid": int(st.st_uid),
        "gid": int(st.st_gid),
        "device": int(st.st_dev),
        "inode": int(st.st_ino),
    }


def _scan_one(path: str, exclusions: list[re.Pattern]):
    """List one directory: returns (prefix_row, entry_rows, error_rows,
    child_dirs).  Symlinked dirs are recorded but never descended."""
    errors: list[dict] = []
    entries: list[dict] = []
    children: list[str] = []
    try:
        dst = os.lstat(path)
    except OSError as e:
        return None, [], [{"path": path, "at": _now(), "detail": str(e)}], []
    try:
        with os.scandir(path) as it:
            names = sorted(it, key=lambda d: d.name)
    except OSError as e:
        return None, [], [{"path": path, "at": _now(), "detail": str(e)}], []

    for d in names:
        child = f"{path.rstrip('/')}/{d.name}"
        if any(x.search(child) for x in exclusions):
            continue
        try:
            st = d.stat(follow_symlinks=False)
        except OSError as e:
            errors.append({"path": child, "at": _now(), "detail": str(e)})
            continue
        is_dir = stat_mod.S_ISDIR(st.st_mode)
        entries.append(_entry_row(path, d.name, st, is_dir))
        if is_dir and not stat_mod.S_ISLNK(st.st_mode):
            children.append(child)

    prefix_row = {
        "path": path,
        "parent": os.path.dirname(path) or None,
        "depth": 0,  # filled relative to root by the caller
        "size": int(dst.st_size),
        "blocks": int(getattr(dst, "st_blocks", 0)),
        "mode": int(dst.st_mode),
        "is_symlink": stat_mod.S_ISLNK(dst.st_mode),
        "mtime": datetime.fromtimestamp(dst.st_mtime, tz=timezone.utc),
        "uid": int(dst.st_uid),
        "gid": int(dst.st_gid),
        "device": int(dst.st_dev),
        "inode": int(dst.st_ino),
        "n_entries": len(entries),
    }
    return prefix_row, entries, errors, children


def _now():
    return datetime.now(tz=timezone.utc)


def crawl_local(
    root: str,
    exclusions: list[str] | None = None,
    concurrent_scans: int = 32,
):
    """Thread-pool walk of a local tree.  Returns (prefix_rows, entry_rows,
    error_rows) with depth filled in relative to ``root``."""
    pats = [re.compile(x) for x in (exclusions or [])]
    prefix_rows: list[dict] = []
    entry_rows: list[dict] = []
    error_rows: list[dict] = []

    level = [root.rstrip("/") or "/"]
    with ThreadPoolExecutor(max_workers=concurrent_scans) as pool:
        while level:
            results = list(pool.map(lambda p: _scan_one(p, pats), level))
            nxt: list[str] = []
            for pr, ents, errs, children in results:
                if pr is not None:
                    prefix_rows.append(pr)
                    entry_rows.extend(ents)
                nxt.extend(children)
                error_rows.extend(errs)
            level = nxt

    rootdepth = root.rstrip("/").count("/")
    for r in prefix_rows:
        r["depth"] = r["path"].count("/") - rootdepth
    return prefix_rows, entry_rows, error_rows


def crawl_distributed(
    spark,
    root: str,
    exclusions: list[str] | None = None,
    fanout_partitions: int = 64,
    staging_dir: str | None = None,
):
    """BFS distributed crawl: one Spark job per tree level; directories are
    listed/stat'ed inside ``mapPartitions`` on executors.  Returns
    (prefixes_df, entries_df, errors_df) backed by staging Parquet.

    Scale contract — NOTHING row-shaped touches the driver:

    - scan results append to staging Parquet *from the executors*;
    - the next-level frontier stays an RDD (``flatMap`` of children), so a
      billion-directory tree never materializes a Python list of paths;
    - the only per-level driver value is the frontier count (the loop
      condition).

    The per-level cache is recomputation avoidance across the level's
    actions, released before the next level; the frontier is CHECKPOINTED
    to staging each level (truncating the RDD lineage — otherwise level N's
    recompute chain would re-scan levels 1..N-1 after the caches are
    dropped).
    """
    import tempfile

    from pyspark.storagelevel import StorageLevel

    excl = list(exclusions or [])
    rootdepth = root.rstrip("/").count("/")

    # Error presence and frontier size are tallied by accumulators inside
    # the scan pass — the alternatives (errs.isEmpty(), frontier.count())
    # cost two to three extra jobs per BFS level even on clean trees.
    # Task retries can over-count an accumulator, but only the
    # zero/nonzero signal gates behavior, which retries preserve (the
    # child tally additionally sizes the next level's partitioning, where
    # rare over-count is harmless).
    err_acc = spark.sparkContext.accumulator(0)
    child_acc = spark.sparkContext.accumulator(0)

    def scan_partition(paths):
        pats = [re.compile(x) for x in excl]
        for p in paths:
            pr, ents, errs, children = _scan_one(p, pats)
            if pr is not None:
                pr["depth"] = pr["path"].count("/") - rootdepth
            if errs:
                err_acc.add(len(errs))
            if children:
                child_acc.add(len(children))
            yield pr, ents, errs, children

    # staging MUST be on a filesystem all executors share (HDFS/S3/NFS) in
    # cluster mode — the driver-local tempdir default only works on
    # local[N].  A unique run subdir prevents append-merging rows from a
    # previous crawl into this one.
    base = staging_dir or tempfile.mkdtemp(prefix="dudb_crawl_")
    staging = tempfile.mkdtemp(prefix="run_", dir=base)
    sc = spark.sparkContext

    level_rdd = sc.parallelize([root.rstrip("/") or "/"], 1)
    n_level = 1
    depth_i = 0
    wrote_errors = False
    while n_level:
        nparts = max(1, min(fanout_partitions, n_level))
        err_base = err_acc.value
        child_base = child_acc.value
        scanned = (
            level_rdd.repartition(nparts)
            .mapPartitions(scan_partition)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        spark.createDataFrame(
            scanned.map(lambda r: r[0]).filter(lambda p: p is not None),
            PREFIXES_SCHEMA,
        ).write.mode("append").parquet(f"{staging}/prefixes")
        spark.createDataFrame(
            scanned.flatMap(lambda r: r[1]), ENTRIES_SCHEMA
        ).write.mode("append").parquet(f"{staging}/entries")
        # the prefixes write materialized `scanned`, so the accumulators
        # already carry this level's tallies — no isEmpty()/count() jobs
        if err_acc.value > err_base:
            spark.createDataFrame(
                scanned.flatMap(lambda r: r[2]), ERRORS_SCHEMA
            ).write.mode("append").parquet(f"{staging}/errors")
            wrote_errors = True
        n_level = child_acc.value - child_base
        if n_level:
            # checkpoint the frontier: breaks the lineage chain back
            # through the (about-to-be-dropped) cache of this level's scan
            fdir = f"{staging}/frontier/L{depth_i}"
            spark.createDataFrame(
                scanned.flatMap(lambda r: r[3]).map(lambda p: (p,)),
                "path: string",
            ).write.parquet(fdir)
            level_rdd = spark.read.parquet(fdir).rdd.map(lambda r: r.path)
        scanned.unpersist()
        depth_i += 1

    prefixes = spark.read.parquet(f"{staging}/prefixes")
    entries = spark.read.parquet(f"{staging}/entries")
    errors = (
        spark.read.parquet(f"{staging}/errors")
        if wrote_errors
        else spark.createDataFrame([], ERRORS_SCHEMA)
    )
    return prefixes, entries, errors
