"""A pure-Python re-statement of the reference's stats fold, used as the
golden oracle in tests (mirrors stats/totals.go:150–209 ComputeTotals and
report_stats.go:197–245 accumulation, with the engine's documented
lexicographic-canonical hardlink rule instead of walk order)."""

from __future__ import annotations

import fnmatch
import math
import re
from collections import defaultdict

from dudb_spark.functions.boolexpr import And, Not, Or, Term, parse
from dudb_spark.model import MODE_SYMLINK


def _basename(path: str) -> str:
    return path.rsplit("/", 1)[-1]


def eval_term(t: Term, row: dict, is_prefix: bool) -> bool:
    v = t.value
    if t.operand == "user":
        return row["uid"] == int(v)
    if t.operand == "group":
        return row["gid"] == int(v)
    if t.operand == "name":
        name = _basename(row["path"]) if is_prefix else row["name"]
        return fnmatch.fnmatchcase(name, v) or fnmatch.fnmatchcase(row["path"], v)
    if t.operand == "iname":
        name = (_basename(row["path"]) if is_prefix else row["name"]).lower()
        return fnmatch.fnmatchcase(name, v.lower())
    if t.operand == "re":
        return re.search(v, row["path"]) is not None
    if t.operand == "type":
        if v == "d":
            return True if is_prefix else row["is_dir"]
        if v == "l":
            return bool(row["mode"] & MODE_SYMLINK)
        if v == "f":
            return (not is_prefix) and not row["is_dir"] and not (
                row["mode"] & MODE_SYMLINK
            )
        if v == "x":
            return bool(row["mode"] & 0o111)
    if t.operand == "newer":
        from dudb_spark.functions.boolexpr import _parse_time

        mtime = row["mtime"]
        if mtime.tzinfo is None:
            from datetime import timezone

            mtime = mtime.replace(tzinfo=timezone.utc)
        return mtime > _parse_time(v)
    if t.operand == "dir-larger":
        return is_prefix and row["n_entries"] > int(v)
    if t.operand == "dir-smaller":
        return is_prefix and row["n_entries"] < int(v)
    raise ValueError(f"oracle does not model operand {t.operand}")


def eval_expr(node, row: dict, is_prefix: bool) -> bool:
    if node is None:
        return True
    if isinstance(node, Term):
        return eval_term(node, row, is_prefix)
    if isinstance(node, Not):
        return not eval_expr(node.child, row, is_prefix)
    if isinstance(node, And):
        return eval_expr(node.left, row, is_prefix) and eval_expr(
            node.right, row, is_prefix
        )
    if isinstance(node, Or):
        return eval_expr(node.left, row, is_prefix) or eval_expr(
            node.right, row, is_prefix
        )
    raise TypeError(node)


CALCS = {
    "identity": lambda size, blocks: size,
    "block4096": lambda size, blocks: math.ceil(size / 4096) * 4096,
    "sum_size_blocks": lambda size, blocks: size + blocks,
}

COUNTERS = (
    "files",
    "prefixes",
    "sub_prefixes",
    "bytes",
    "storage_bytes",
    "prefix_bytes",
    "hardlinks",
    "hardlink_dirs",
)


def _zero():
    return dict.fromkeys(COUNTERS, 0)


def _dups(rows, key=lambda r: (r["device"], r["inode"])):
    """Paths that are NOT the lexicographically-first of their link set."""
    groups = defaultdict(list)
    for r in rows:
        groups[key(r)].append(r["path"])
    dup = set()
    for paths in groups.values():
        dup.update(sorted(paths)[1:])
    return dup


def oracle_stats(tree, expr="", calc="identity", dedup=True, root=""):
    """Returns (per_prefix, per_user, per_group) dicts of counter dicts,
    keyed by prefix path / (prefix, id)."""
    node = parse(expr)
    c = CALCS[calc]

    def under(p):
        r = (root or "").rstrip("/")
        return not r or p == r or p.startswith(r + "/")

    p_rows = [
        r for r in tree.prefix_rows if under(r["path"]) and eval_expr(node, r, True)
    ]
    dup_dirs = _dups(p_rows) if dedup else set()

    per_prefix = defaultdict(_zero)
    per_user = defaultdict(_zero)
    per_group = defaultdict(_zero)

    ok_paths = set()
    for r in p_rows:
        t = per_prefix[r["path"]]
        t["prefixes"] += 1
        if r["path"] in dup_dirs:
            t["hardlink_dirs"] += 1  # early return: no size, no entries,
            continue  # no per-id attribution (totals.go:157–160)
        ok_paths.add(r["path"])
        sb = c(r["size"], r["blocks"])
        for tgt in (t, per_user[(r["path"], r["uid"])], per_group[(r["path"], r["gid"])]):
            tgt["bytes"] += r["size"]
            tgt["prefix_bytes"] += r["size"]
            tgt["storage_bytes"] += sb
        per_user[(r["path"], r["uid"])]["prefixes"] += 1
        per_group[(r["path"], r["gid"])]["prefixes"] += 1

    pfx_by_path = {r["path"]: r for r in tree.prefix_rows}
    ents = [
        e
        for e in tree.entry_rows
        if e["parent"] in ok_paths and eval_expr(node, e, False)
    ]
    dup_files = _dups([e for e in ents if not e["is_dir"]]) if dedup else set()

    for e in ents:
        parent = e["parent"]
        t = per_prefix[parent]
        if e["is_dir"]:
            # attributed to the PARENT dir's owner (totals.go:173–177)
            p = pfx_by_path[parent]
            t["sub_prefixes"] += 1
            per_user[(parent, p["uid"])]["sub_prefixes"] += 1
            per_group[(parent, p["gid"])]["sub_prefixes"] += 1
            continue
        if e["path"] in dup_files:
            t["hardlinks"] += 1
            per_user[(parent, e["uid"])]["hardlinks"] += 1
            per_group[(parent, e["gid"])]["hardlinks"] += 1
            continue
        sb = c(e["size"], e["blocks"])
        for tgt in (t, per_user[(parent, e["uid"])], per_group[(parent, e["gid"])]):
            tgt["files"] += 1
            tgt["bytes"] += e["size"]
            tgt["storage_bytes"] += sb

    return dict(per_prefix), dict(per_user), dict(per_group)
