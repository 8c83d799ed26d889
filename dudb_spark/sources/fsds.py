"""Filesystem walk as a native Spark Python DataSource (``fswalk``).

The reference's walk is an ingest-only pipeline (S1, analyze.go:104–123);
this module additionally exposes the SAME walk through Spark's DataSource
API (pyspark 4, SPARK-44076) so the live filesystem is directly queryable
without an ingest step::

    from dudb_spark.sources.fsds import register
    register(spark)
    df = spark.read.format("fswalk").load("/data")          # entries rows
    df.where("NOT is_dir AND size > 1024").groupBy("uid").count()

Rows carry the exact ``entries`` table schema (model.py ENTRIES_SCHEMA),
so every operator downstream of ingest — find expressions, stats folds,
calculators — runs unchanged over the live tree.

Scale shape: ``partitions()`` shards the walk at the root's first level
(one InputPartition per top-level subtree plus one for the root's own
listing), and each executor walks its subtree breadth-first with the
shared ``crawler._scan_one`` (symlinks recorded but never descended, the
S2 contract).  On a 1000-executor cluster that is the reference's
"thousands of simultaneous stat requests" issued from executors, with
Spark handling scheduling/retries — the same property
``crawler.crawl_distributed`` provides for ingest, here behind the
engine's native source API (predicates/column pruning arrive via the
normal DataFrame planner; pushdown into the walk itself is not needed
because the walk IS the scan).

Error channel: unreadable paths are emitted IN-BAND as rows with a
non-null ``error`` column (path/parent/name filled, stat fields null) —
mirroring the ingest path's error bucket (S9, analyze.go:141–150) so the
live route drops nothing silently.  ``live_tables`` filters them out of
the entries frame and hands back a lazy errors frame; the CLI's
``--live`` commands print the unreadable count.  Plain
``spark.read.format("fswalk")`` consumers see ``error IS NULL`` rows as
the walk result and can select the error rows explicitly.

Caveat (documented, deliberate): sharding splits at the shallowest
levels only (see ``partitions()``) — a tree that is one deep chain
still serializes into a single partition (matching the reference's own
concurrency limit on such trees).
"""

from __future__ import annotations

import os as _os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_FIELDS = (
    "parent", "name", "path", "is_dir", "size", "blocks", "mode",
    "mtime", "uid", "gid", "device", "inode",
)

_DDL = (
    "parent string, name string, path string, is_dir boolean, "
    "size long, blocks long, mode long, mtime timestamp, "
    "uid long, gid long, device long, inode long, error string"
)


class _Subtree(InputPartition):
    def __init__(self, root: str, recurse: bool):
        self.root = root
        self.recurse = recurse


class FsWalkReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fswalk: .load(path) is required")
        self.exclude = options.get("exclude")  # single regex, or absent
        # expand listing levels until at least this many partitions exist
        # (skewed trees: one huge top-level subtree must not serialize
        # the walk into one task)
        self.min_partitions = int(options.get("min_partitions", "16"))

    def partitions(self):
        from dudb_spark.sources.crawler import _scan_one

        pats = [re.compile(self.exclude)] if self.exclude else []
        root = self.path.rstrip("/") or "/"
        _, _, _, children = _scan_one(root, pats)
        # the root's own listing is one (non-recursive) partition; each
        # frontier subtree walks independently on an executor.  When the
        # fan-out so far is below min_partitions (a skewed or narrow
        # tree), peel another level: each frontier dir becomes a
        # listing-only partition and its children join the frontier —
        # driver cost is one extra listdir level, bounded to 3 levels.
        parts = [_Subtree(root, False)]
        frontier = children
        for _level in range(3):
            if len(parts) + len(frontier) >= self.min_partitions:
                break
            nxt = []
            for c in frontier:
                _, _, _, ch = _scan_one(c, pats)
                parts.append(_Subtree(c, False))
                nxt.extend(ch)
            if not nxt:
                frontier = []
                break
            frontier = nxt
        return parts + [_Subtree(c, True) for c in frontier]

    def read(self, partition):
        from dudb_spark.sources.crawler import _scan_one

        pats = [re.compile(self.exclude)] if self.exclude else []
        nf = len(_FIELDS)
        level = [partition.root]
        while level:
            nxt = []
            for p in level:
                _, entries, errors, children = _scan_one(p, pats)
                for e in entries:
                    yield tuple(e[f] for f in _FIELDS) + (None,)
                # unreadable paths: in-band error rows (see module doc)
                for err in errors:
                    ep = err["path"]
                    row = [None] * nf
                    row[_FIELDS.index("parent")] = _os.path.dirname(ep) or None
                    row[_FIELDS.index("name")] = _os.path.basename(ep)
                    row[_FIELDS.index("path")] = ep
                    yield tuple(row) + (err["detail"],)
                if partition.recurse:
                    nxt.extend(children)
            level = nxt


class FsWalkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fswalk"

    def schema(self):
        return _DDL

    def reader(self, schema):
        return FsWalkReader(self.options)


def register(spark) -> None:
    """Register the ``fswalk`` format on a session (idempotent)."""
    spark.dataSource.register(FsWalkDataSource)


def live_tables(
    spark, root: str, exclude: str | None = None, cache: bool = True,
    with_errors: bool = False,
):
    """(prefixes, entries) frames over the LIVE filesystem — the ingest
    tables' shapes derived from one fswalk scan, so ``find``/``stats``
    run against the tree with no database (the CLI's ``find --live``).

    The prefixes frame is the dir rows of the scan plus the root's own
    record (stat'ed driver-side — one lstat), with ``depth`` computed
    from the path and ``n_entries`` joined back from a per-parent count
    of the same scan.  Everything else stays lazy: predicates the
    caller pushes (find expressions) filter the walk's output rows the
    moment they leave the executors.

    ``with_errors=True`` returns a third frame — the scan's unreadable
    paths (path, error), the same rows the ingest path lands in the
    error bucket — so ``--live`` consumers can report what the walk
    could not see instead of silently skipping it."""
    from pyspark.sql import functions as F

    from dudb_spark.model import PREFIXES_SCHEMA
    from dudb_spark.sources.crawler import _scan_one

    register(spark)
    reader = spark.read.format("fswalk")
    if exclude:
        reader = reader.option("exclude", exclude)
    scan = reader.load(root)
    if cache:
        # the scan's consumers (n_entries join, the prefixes projection,
        # the caller's query) would each RE-WALK the live tree — stat
        # calls dominate, so one cached walk beats three cheaper than
        # any plan trick.  MEMORY_AND_DISK: a huge tree spills instead
        # of re-walking.  Callers doing exactly one pass can opt out.
        from pyspark.storagelevel import StorageLevel

        scan = scan.persist(StorageLevel.MEMORY_AND_DISK)
    errors = scan.where(F.col("error").isNotNull()).select("path", "error")
    entries = scan.where(F.col("error").isNull()).drop("error")

    rootp = root.rstrip("/") or "/"
    # match the crawler's depth base (crawler.crawl_local): for root "/"
    # this is 0, so top-level dirs get depth 1, not the root's own 0
    rootdepth = rootp.rstrip("/").count("/")
    pats = [re.compile(exclude)] if exclude else []
    root_row, _, _, _ = _scan_one(rootp, pats)
    if root_row is None:
        raise FileNotFoundError(rootp)
    root_row["depth"] = 0

    n_by_parent = entries.groupBy(F.col("parent").alias("path")).agg(
        F.count(F.lit(1)).alias("n_entries")
    )
    # S_IFLNK check on the raw mode; scans never descend symlinks, so a
    # symlinked dir has no child rows and n_entries coalesces to 0
    dir_pfx = (
        entries.where("is_dir")
        .select(
            "path", "parent",
            (F.length(F.regexp_replace("path", "[^/]", ""))
             - F.lit(rootdepth)).cast("int").alias("depth"),
            "size", "blocks", "mode",
            (F.col("mode").bitwiseAND(0o170000) == 0o120000)
            .alias("is_symlink"),
            "mtime", "uid", "gid", "device", "inode",
        )
        .join(n_by_parent, "path", "left")
        .withColumn("n_entries", F.coalesce("n_entries", F.lit(0)))
    )
    prefixes = spark.createDataFrame(
        [root_row], PREFIXES_SCHEMA
    ).unionByName(dir_pfx.select(*[f.name for f in PREFIXES_SCHEMA.fields]))
    if with_errors:
        return prefixes, entries, errors
    return prefixes, entries


# --------------------------------------------------------------------------
# fswatch: the walk as a STREAMING source (change stream)
# --------------------------------------------------------------------------

_WATCH_DDL = "op string, " + _DDL + ", gen long"


class FsWatchReader(SimpleDataSourceStreamReader):
    """Streaming change feed over a live tree (``fswatch``) — the
    streaming analogue of the reference's rescan loop (analyze.go:104:
    users re-run ``idu analyze`` on a schedule; here each micro-batch IS
    the rescan, emitting only what changed).  Batch 0 is a full resync
    (every object as ``op='added'``); every later batch re-walks and
    diffs against the previous walk on (is_dir, size, mode, mtime, uid,
    gid), yielding ``added`` / ``changed`` / ``deleted`` rows (deleted
    rows carry the last-known stat).  Unreadable paths ride the SAME
    diff with null stats and the ``error`` column set, so a path
    flipping readable↔unreadable surfaces as ``changed``.

    Scale/semantics notes (deliberate, documented):
    - the walk runs driver-side per micro-batch (the change stream is
      churn-sized; the partitioned-executor walk is the batch ``fswalk``
      route) and Spark's simple-reader checkpoint persists each batch's
      DATA, so a replayed batch never re-walks;
    - reader state is the in-memory previous walk: after a query
      restart the first batch is a fresh full resync (at-least-once
      change delivery across restarts, exactly-once within a run);
    - a no-change walk returns the same offset (no empty batch spam).
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fswatch: .load(path) is required")
        self.exclude = options.get("exclude")
        self._prev: dict | None = None

    def initialOffset(self):
        return {"gen": 0}

    # sig positions within _FIELDS: everything that marks a real change
    _SIG = tuple(
        _FIELDS.index(f) for f in
        ("is_dir", "size", "mode", "mtime", "uid", "gid")
    )

    def _walk(self) -> dict:
        from dudb_spark.sources.crawler import crawl_local

        _, erows, errrows = crawl_local(
            self.path, [self.exclude] if self.exclude else []
        )
        cur = {
            e["path"]: tuple(e[f] for f in _FIELDS) + (None,)
            for e in erows
        }
        nf = len(_FIELDS)
        for err in errrows:
            row = [None] * nf
            row[_FIELDS.index("parent")] = (
                _os.path.dirname(err["path"]) or None
            )
            row[_FIELDS.index("name")] = _os.path.basename(err["path"])
            row[_FIELDS.index("path")] = err["path"]
            cur[err["path"]] = tuple(row) + (err["detail"],)
        return cur

    def read(self, start: dict):
        gen = int(start.get("gen", 0))
        cur = self._walk()
        sig = self._SIG
        err_i = len(_FIELDS)  # error string rides last before gen
        out = []
        if self._prev is None:
            for p in sorted(cur):
                out.append(("added",) + cur[p] + (gen,))
        else:
            prev = self._prev
            for p in sorted(cur):
                c = cur[p]
                pv = prev.get(p)
                if pv is None:
                    out.append(("added",) + c + (gen,))
                elif (
                    tuple(c[i] for i in sig) != tuple(pv[i] for i in sig)
                    or c[err_i] != pv[err_i]
                ):
                    out.append(("changed",) + c + (gen,))
            for p in sorted(prev):
                if p not in cur:
                    out.append(("deleted",) + prev[p] + (gen,))
            if not out:
                # nothing changed: hold the offset, no empty batch
                self._prev = cur
                return iter(()), start
        self._prev = cur
        return iter(out), {"gen": gen + 1}

    def commit(self, end):
        pass


class FsWatchDataSource(DataSource):
    @classmethod
    def name(cls):
        return "fswatch"

    def schema(self):
        return _WATCH_DDL

    def simpleStreamReader(self, schema):
        return FsWatchReader(self.options)


def register_watch(spark) -> None:
    """Register the ``fswatch`` streaming format on a session."""
    spark.dataSource.register(FsWatchDataSource)
