"""Recursive subtree rollup vs a brute-force Python oracle.

The operator's contract (rollup.py): a directory's totals cover all entry
rows strictly below it, at every depth; the directory's own entry row
counts toward its ancestors.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dudb_spark.model import FsTables
from dudb_spark.operators.rollup import ancestors, subtree_totals, top_subtrees


def _brute_force(entry_rows, root="/", block_size=512):
    """O(n * depth) reference fold over raw entry dicts."""
    acc = {}
    for e in entry_rows:
        if root != "/" and not e["path"].startswith(root):
            continue
        parts = e["parent"].split("/")
        for i in range(2, len(parts) + 1):
            d = "/".join(parts[:i])
            if root != "/" and not (d == root or d.startswith(root.rstrip("/") + "/")):
                continue
            a = acc.setdefault(
                d,
                {"n_files": 0, "n_dirs": 0, "file_bytes": 0, "total_bytes": 0,
                 "storage_bytes": 0},
            )
            a["total_bytes"] += e["size"]
            if e["is_dir"]:
                a["n_dirs"] += 1
            else:
                a["n_files"] += 1
                a["file_bytes"] += e["size"]
                a["storage_bytes"] += math.ceil(e["size"] / block_size) * block_size
    return acc


def test_ancestors_expression(spark):
    got = spark.range(1).select(
        ancestors(F.lit("/a/b/c/file")).alias("a")
    ).first()["a"]
    assert got == ["/a", "/a/b", "/a/b/c", "/a/b/c/file"]


def test_subtree_totals_match_brute_force(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    got = {r["dir_path"]: r.asDict() for r in subtree_totals(t.entries).collect()}
    want = _brute_force(tree.entry_rows)
    assert set(got) == set(want)
    for d, w in want.items():
        g = got[d]
        for k, v in w.items():
            assert g[k] == v, f"{d}.{k}: got {g[k]} want {v}"


def test_subtree_totals_root_restriction(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    root = "/tree/d0-0"
    got = {r["dir_path"]: r.asDict() for r in subtree_totals(t.entries, root=root).collect()}
    want = _brute_force(tree.entry_rows, root=root)
    assert set(got) == set(want)
    assert all(d == root or d.startswith(root + "/") for d in got)
    for d, w in want.items():
        g = got[d]
        for k, v in w.items():
            assert g[k] == v


def test_subtree_totals_trailing_slash_root(spark, fs_dir):
    t = FsTables(spark, fs_dir)
    a = {r["dir_path"] for r in subtree_totals(t.entries, root="/tree/d0-0").collect()}
    b = {r["dir_path"] for r in subtree_totals(t.entries, root="/tree/d0-0/").collect()}
    assert a == b and "/tree/d0-0" in b


def test_subtree_totals_max_depth(spark, fs_dir, tree):
    t = FsTables(spark, fs_dir)
    got = subtree_totals(t.entries, max_depth=2).collect()
    # depth relative to "/" — only /tree (depth 1) and its direct children
    assert {r["dir_path"] for r in got} == {
        d for d in _brute_force(tree.entry_rows) if d.count("/") <= 2
    }
    # pruning must not change the values of surviving rows
    full = {r["dir_path"]: r.asDict() for r in subtree_totals(t.entries).collect()}
    for r in got:
        assert r.asDict() == full[r["dir_path"]]


def test_rollup_fuzz_random_trees(spark):
    """Seeded fuzz: random trees (uneven depth ≤ 6, random fanout, files
    and dir-entry rows mixed) rolled up in one job vs the Python fold."""
    import random

    rnd = random.Random(20260813)
    rows = []
    dirs = ["/r"]
    for _ in range(400):
        parent = rnd.choice(dirs)
        depth = parent.count("/")
        is_dir = depth < 6 and rnd.random() < 0.3
        name = f"{'d' if is_dir else 'f'}{len(rows)}"
        path = f"{parent}/{name}"
        rows.append(
            {
                "parent": parent,
                "path": path,
                "is_dir": is_dir,
                "size": rnd.randrange(0, 10_000),
            }
        )
        if is_dir:
            dirs.append(path)
    df = spark.createDataFrame(rows)

    got = {r["dir_path"]: r.asDict() for r in subtree_totals(df).collect()}
    want = _brute_force(rows)
    assert got.keys() == want.keys()
    for d, w in want.items():
        for k, v in w.items():
            assert got[d][k] == v, f"{d}.{k}"

    # root restriction on a random subtree agrees too
    root = rnd.choice([r["path"] for r in rows if r["is_dir"]])
    got_r = {r["dir_path"]: r.asDict() for r in subtree_totals(df, root=root).collect()}
    want_r = _brute_force(rows, root=root)
    assert got_r.keys() == want_r.keys()
    for d, w in want_r.items():
        for k, v in w.items():
            assert got_r[d][k] == v, f"{d}.{k}"


def test_top_subtrees_order_and_plan(spark, fs_dir):
    t = FsTables(spark, fs_dir)
    top = top_subtrees(t.entries, n=3)
    rows = top.collect()
    assert len(rows) == 3
    vals = [r["file_bytes"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    # the root of the tree has the largest subtree by construction
    assert rows[0]["dir_path"] == "/tree"
    # orderBy+limit must compile to TakeOrderedAndProject, not a global sort
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
