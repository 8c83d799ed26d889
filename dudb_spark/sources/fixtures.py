"""Deterministic synthetic filesystem-metadata fixtures.

Re-creates, as plain row data, the synthetic trees the reference builds on a
real filesystem for its tests (reference: testdata_test.go:16–90 — a
``depth × breadth × nfiles`` tree with per-level symlinks and inaccessible
entries; internal/testutil/testdata.go:23–53 — the five canonical uid/gid
ownership combinations; internal/boolexpr/ops_test.go:65–103 — hardlink
sets spanning parents).

Everything is a pure function of the constructor arguments — same arguments,
identical rows — so golden tests and the DuckDB oracle see stable data.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from dudb_spark.model import (
    ENTRIES_SCHEMA,
    ERRORS_SCHEMA,
    GROUPS_SCHEMA,
    MODE_DIR,
    MODE_SYMLINK,
    PREFIXES_SCHEMA,
    USERS_SCHEMA,
)

BASE_TIME = datetime(2025, 1, 1, tzinfo=timezone.utc)

# The five ownership mixes from the reference's testutil (testdata.go:23–53).
# Each describes how a directory's children deviate from the base (uid, gid).
UG_COMBOS = ("ug00", "ug10", "ug01", "ug11", "ugOther")


def _combo_ids(combo: str, idx: int, uid: int, gid: int) -> tuple[int, int]:
    """uid/gid for child at position ``idx`` under the given combo."""
    if combo == "ug00":
        return uid, gid
    if combo == "ug10":
        return (uid + 1, gid) if idx == 1 else (uid, gid)
    if combo == "ug01":
        return (uid, gid + 1) if idx == 1 else (uid, gid)
    if combo == "ug11":
        return (uid + 1, gid + 1) if idx == 1 else (uid, gid)
    if combo == "ugOther":
        return uid + 1, gid + 1
    raise ValueError(f"unknown combo {combo!r}")


def _blocks(size: int) -> int:
    return math.ceil(size / 512) if size > 0 else 0


@dataclass
class SyntheticTree:
    """Build prefixes/entries/errors/users/groups rows for a synthetic tree.

    Layout per directory at ``level`` (< depth): ``breadth`` subdirs named
    ``d<level>-<i>``, ``nfiles`` files named ``f<level>-<i>`` with
    ``size = i+1`` bytes, one symlink ``s<level>-ok`` (to the first file),
    one dangling symlink ``s<level>-dangling``, and one inaccessible dir
    ``x<level>-denied`` that yields an ``errors`` row and no descent.
    """

    root: str = "/tree"
    depth: int = 3
    breadth: int = 5
    nfiles: int = 5
    uid: int = 100
    gid: int = 2
    device: int = 1
    with_symlinks: bool = True
    with_errors: bool = True
    # list of hardlink sets; each set is a list of (parent_rel, name) that
    # will share one inode.  Defaults add one 3-file set + one 2-dir set.
    hardlink_sets: list[list[tuple[str, str]]] = field(default_factory=list)

    def __post_init__(self):
        self.prefix_rows: list[dict] = []
        self.entry_rows: list[dict] = []
        self.error_rows: list[dict] = []
        self._inode = 1000
        self._combo_cursor = 0
        self._built = False

    # -- public API -----------------------------------------------------

    def build(self) -> "SyntheticTree":
        if self._built:
            return self
        self._build_dir(self.root, level=0, parent=None)
        self._apply_hardlinks()
        self._built = True
        return self

    def users_rows(self) -> list[dict]:
        return [
            {"uid": self.uid, "name": "alice"},
            {"uid": self.uid + 1, "name": "bob"},
        ]

    def groups_rows(self) -> list[dict]:
        return [
            {"gid": self.gid, "name": "staff"},
            {"gid": self.gid + 1, "name": "admin"},
        ]

    def write(self, spark, outdir: str) -> None:
        """Materialize all tables as Parquet under ``outdir``."""
        self.build()
        outdir = outdir.rstrip("/")
        for name, rows, schema in (
            ("prefixes", self.prefix_rows, PREFIXES_SCHEMA),
            ("entries", self.entry_rows, ENTRIES_SCHEMA),
            ("errors", self.error_rows, ERRORS_SCHEMA),
            ("users", self.users_rows(), USERS_SCHEMA),
            ("groups", self.groups_rows(), GROUPS_SCHEMA),
        ):
            df = spark.createDataFrame(rows, schema=schema)  # type: ignore[arg-type]
            df.coalesce(1).write.mode("overwrite").parquet(f"{outdir}/{name}.parquet")

    # -- internals ------------------------------------------------------

    def _next_inode(self) -> int:
        self._inode += 1
        return self._inode

    def _next_combo(self) -> str:
        combo = UG_COMBOS[self._combo_cursor % len(UG_COMBOS)]
        self._combo_cursor += 1
        return combo

    def _mtime(self, level: int, idx: int) -> datetime:
        return BASE_TIME + timedelta(hours=level, minutes=idx)

    def _build_dir(self, path: str, level: int, parent: str | None) -> dict:
        """Emit the prefix row for ``path`` plus entry rows for its children,
        then recurse into child dirs.  Returns the prefix row."""
        combo = self._next_combo()
        dir_inode = self._next_inode()
        children: list[dict] = []

        child_idx = 0

        def add_child(name, is_dir, size, mode, mtime, inode):
            nonlocal child_idx
            cuid, cgid = _combo_ids(combo, child_idx, self.uid, self.gid)
            row = {
                "parent": path,
                "name": name,
                "path": f"{path}/{name}",
                "is_dir": is_dir,
                "size": size,
                "blocks": _blocks(size),
                "mode": mode,
                "mtime": mtime,
                "uid": cuid,
                "gid": cgid,
                "device": self.device,
                "inode": inode,
            }
            children.append(row)
            child_idx += 1
            return row

        if level < self.depth:
            # files first (ownership combos index files; testdata.go applies
            # the uid/gid variation to the *second file*)
            for i in range(self.nfiles):
                add_child(
                    f"f{level}-{i}",
                    False,
                    i + 1,
                    0o644,
                    self._mtime(level, i),
                    self._next_inode(),
                )
            subdir_specs = []
            for i in range(self.breadth):
                name = f"d{level}-{i}"
                inode = self._next_inode()
                add_child(
                    name,
                    True,
                    64,
                    MODE_DIR | 0o755,
                    self._mtime(level + 1, i),
                    inode,
                )
                subdir_specs.append((name, inode))
            if self.with_symlinks:
                target = f"{path}/f{level}-0"
                add_child(
                    f"s{level}-ok",
                    False,
                    len(target),
                    MODE_SYMLINK | 0o777,
                    self._mtime(level, 50),
                    self._next_inode(),
                )
                dangling = f"{path}/does-not-exist"
                add_child(
                    f"s{level}-dangling",
                    False,
                    len(dangling),
                    MODE_SYMLINK | 0o777,
                    self._mtime(level, 51),
                    self._next_inode(),
                )
            if self.with_errors:
                # inaccessible dir: appears as an entry of its parent but has
                # no prefix row; scan error recorded (analyze_test.go:74–82)
                name = f"x{level}-denied"
                add_child(
                    name,
                    True,
                    64,
                    MODE_DIR | 0o000,
                    self._mtime(level + 1, 60),
                    self._next_inode(),
                )
                self.error_rows.append(
                    {
                        "path": f"{path}/{name}",
                        "at": BASE_TIME + timedelta(days=1),
                        "detail": "permission denied",
                    }
                )
        else:
            subdir_specs = []

        depth = 0 if parent is None else path[len(self.root) :].count("/")
        prefix_row = {
            "path": path,
            "parent": parent,
            "depth": depth,
            "size": 64,
            "blocks": _blocks(64),
            "mode": MODE_DIR | 0o755,
            "is_symlink": False,
            "mtime": self._mtime(level, 0),
            "uid": self.uid,
            "gid": self.gid,
            "device": self.device,
            "inode": dir_inode,
            "n_entries": len(children),
        }
        self.prefix_rows.append(prefix_row)
        self.entry_rows.extend(children)

        for name, inode in subdir_specs:
            sub = self._build_dir(f"{path}/{name}", level + 1, path)
            # child dir prefix rows share the inode assigned in the parent
            sub["inode"] = inode

        return prefix_row

    def _default_hardlink_sets(self) -> list[list[tuple[str, str]]]:
        if self.depth < 1 or self.breadth < 2 or self.nfiles < 3:
            return []
        return [
            # 3 files sharing one inode across different parents
            [("", "f0-2"), ("d0-0", "f1-2"), ("d0-1", "f1-2")],
            # 2 dirs sharing one inode → HardlinkDirs (totals.go:156–159)
            [("", "d0-0"), ("", "d0-1")],
        ]

    def _apply_hardlinks(self) -> None:
        sets = self.hardlink_sets or self._default_hardlink_sets()
        by_key = {(r["parent"], r["name"]): r for r in self.entry_rows}
        pfx_by_path = {r["path"]: r for r in self.prefix_rows}
        for link_set in sets:
            rows = []
            for parent_rel, name in link_set:
                parent = self.root if parent_rel == "" else f"{self.root}/{parent_rel}"
                row = by_key.get((parent, name))
                if row is None:
                    raise KeyError(f"hardlink target not found: {parent}/{name}")
                rows.append(row)
            canonical = rows[0]
            for row in rows:
                row["inode"] = canonical["inode"]
                row["device"] = canonical["device"]
                row["size"] = canonical["size"]
                row["blocks"] = canonical["blocks"]
                # keep the prefix-row inode for hardlinked dirs in sync
                p = pfx_by_path.get(row["path"])
                if p is not None:
                    p["inode"] = canonical["inode"]
                    p["device"] = canonical["device"]
