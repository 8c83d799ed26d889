"""Incremental stats maintenance == full refold, including the hardlink
closure cases where an UNTOUCHED directory's counters change because a
touched directory stole or released an inode group's canonical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dudb_spark.operators.incremental import incremental_stats
from dudb_spark.operators.stats import StatsOptions, compute_stats

P_COLS = "path string, parent string, size long, blocks long, mode long, " \
    "mtime timestamp, uid long, gid long, device long, inode long"
E_COLS = "parent string, name string, path string, is_dir boolean, " \
    "size long, blocks long, mode long, uid long, gid long, " \
    "device long, inode long"


def _pfx(spark, rows):
    return spark.createDataFrame(
        [(p, p.rsplit("/", 1)[0] or "/", sz, sz // 512, 0o755, None,
          100, 10, 1, ino) for p, sz, ino in rows],
        P_COLS,
    )


def _ent(spark, rows):
    return spark.createDataFrame(
        [(p.rsplit("/", 1)[0], p.rsplit("/", 1)[1], p, d, sz, sz // 512,
          0o644, 100, 10, 1, ino) for p, d, sz, ino in rows],
        E_COLS,
    )


def _summaries(res):
    key = lambda df, k: {  # noqa: E731
        tuple(r[c] for c in k): tuple(r[c] for c in df.columns if c not in k)
        for r in df.collect()
    }
    return (
        key(res.per_prefix, ["prefix"]),
        key(res.per_user, ["prefix", "id"]),
        key(res.per_group, ["prefix", "id"]),
    )


def test_canonical_moves_into_untouched_dir(spark):
    """Deleting /t/a releases inode 100's canonical to untouched /t/b."""
    prev_p = _pfx(spark, [("/t", 10, 1), ("/t/a", 20, 2), ("/t/b", 30, 3)])
    prev_e = _ent(spark, [
        ("/t/a", True, 20, 2), ("/t/b", True, 30, 3),
        ("/t/a/f1", False, 7, 100),   # canonical of inode 100
        ("/t/b/f2", False, 7, 100),   # currently a hardlink dup
        ("/t/b/f3", False, 5, 200),
    ])
    new_p = prev_p.where(F.col("path") != "/t/a")
    new_e = prev_e.where(~F.col("path").startswith("/t/a"))
    touched = spark.createDataFrame([("/t",), ("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    # the untouched dir now owns the file: both entries real, 0 hardlinks
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/b"]
    assert row["files"] == 2 and row["hardlinks"] == 0


def test_canonical_stolen_from_untouched_dir(spark):
    """Adding /t/a/f0 (lex-first link of inode 100) demotes untouched
    /t/b's file to a hardlink dup."""
    prev_p = _pfx(spark, [("/t", 10, 1), ("/t/a", 20, 2), ("/t/b", 30, 3)])
    prev_e = _ent(spark, [
        ("/t/a", True, 20, 2), ("/t/b", True, 30, 3),
        ("/t/b/f2", False, 7, 100),
    ])
    add = _ent(spark, [("/t/a/f0", False, 7, 100)])
    new_p = prev_p
    new_e = prev_e.unionByName(add)
    touched = spark.createDataFrame([("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/b"]
    assert row["hardlinks"] == 1


def test_dir_hardlink_flip_cascade(spark):
    """Round-2 advice repro: adding /t/a hardlinked with the DIRECTORY
    /t/x/m demotes /t/x/m's record to a dup, which pulls its file entries
    out of the file-dedup window and promotes untouched /t/x/q's file.
    The one-round closure stitched /t/x/q's stale prev row."""
    prev_p = _pfx(spark, [
        ("/t", 10, 1), ("/t/x", 20, 2), ("/t/x/m", 30, 3), ("/t/x/q", 40, 4),
    ])
    prev_e = _ent(spark, [
        ("/t/x", True, 20, 2),
        ("/t/x/m", True, 30, 3), ("/t/x/q", True, 40, 4),
        ("/t/x/m/f1", False, 7, 100),   # canonical of inode 100
        ("/t/x/q/f2", False, 7, 100),   # currently a hardlink dup
        ("/t/x/q/f3", False, 45, 200),
    ])
    # /t/a shares (device, inode) with the /t/x/m directory record
    new_p = prev_p.unionByName(_pfx(spark, [("/t/a", 30, 3)]))
    new_e = prev_e.unionByName(_ent(spark, [("/t/a", True, 30, 3)]))
    touched = spark.createDataFrame([("/t",), ("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    # untouched /t/x/q's file was promoted when /t/x/m's entries left
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/x/q"]
    assert row["files"] == 2 and row["hardlinks"] == 0
    assert row["bytes"] == 40 + 7 + 45
    # and the demoted dir record contributes hardlink_dirs only
    row_m = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/x/m"]
    assert row_m["hardlink_dirs"] == 1 and row_m["files"] == 0


def test_dir_hardlink_release_cascade(spark):
    """Inverse flip: deleting /t/a (canonical of the dir group) promotes
    /t/x/m's record, whose entries re-enter the window and demote
    untouched /t/x/q's file back to a hardlink dup."""
    prev_p = _pfx(spark, [
        ("/t", 10, 1), ("/t/a", 30, 3), ("/t/x", 20, 2),
        ("/t/x/m", 30, 3), ("/t/x/q", 40, 4),
    ])
    prev_e = _ent(spark, [
        ("/t/a", True, 30, 3), ("/t/x", True, 20, 2),
        ("/t/x/m", True, 30, 3), ("/t/x/q", True, 40, 4),
        ("/t/x/m/f1", False, 7, 100),
        ("/t/x/q/f2", False, 7, 100),
    ])
    new_p = prev_p.where(F.col("path") != "/t/a")
    new_e = prev_e.where(F.col("path") != "/t/a")
    touched = spark.createDataFrame([("/t",), ("/t/a",)], ["path"])

    prev = compute_stats(prev_p, prev_e, StatsOptions())
    inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
    full = compute_stats(new_p, new_e, StatsOptions())
    assert _summaries(inc) == _summaries(full)
    row = {r["prefix"]: r for r in inc.per_prefix.collect()}["/t/x/q"]
    assert row["files"] == 0 and row["hardlinks"] == 1


def test_merge_fixture_equivalence(spark):
    """End-to-end over the staged merge fixture (hardlinks included)."""
    import __spark_entry__ as em
    from dudb_spark.operators.ingest import merge_scan

    prev_p, prev_e, staged_p, staged_e = em._merge_fixture(spark)
    prev = compute_stats(prev_p, prev_e, StatsOptions())
    merge = merge_scan(prev_p, prev_e, staged_p, staged_e, root="/tree")
    inc = incremental_stats(
        prev, prev_p, prev_e, merge.prefixes, merge.entries, merge.touched
    )
    full = compute_stats(merge.prefixes, merge.entries, StatsOptions())
    assert _summaries(inc) == _summaries(full)


def test_bucketed_layout_equivalence(spark, tmp_path):
    """The bucketed snapshot layout (catalog write → pb-pruned closure
    probes) produces byte-identical summaries to the plain path AND to a
    full refold, over the staged merge fixture with hardlinks and a
    dir-hardlink flip in play."""
    import __spark_entry__ as em
    from dudb_spark.operators.ingest import merge_scan
    from dudb_spark.sources.catalog import SnapshotCatalog

    prev_p, prev_e, staged_p, staged_e = em._merge_fixture(spark)
    cat = SnapshotCatalog(spark, str(tmp_path / "db"))
    cat.write_snapshot(prev_p, prev_e, layout="bucketed", path_buckets=8)
    lay = cat.layout()
    assert lay["layout"] == "bucketed" and lay["path_buckets"] == 8
    # spill row count recorded at write time (skips the reader's
    # is-it-empty probe job)
    assert lay["spill_rows"] == cat.spill_index().count()
    pt = cat.tables()
    # logical view hides the layout column; raw view exposes it
    assert "pb" not in pt.prefixes.columns
    assert "pb" in pt.read_raw("prefixes").columns

    merge = merge_scan(
        pt.prefixes, pt.entries, staged_p, staged_e, root="/tree"
    )
    cat.write_snapshot(
        merge.prefixes, merge.entries, layout="bucketed", path_buckets=8
    )
    nt = cat.tables()
    prev = compute_stats(pt.prefixes, pt.entries, StatsOptions())
    inc_b = incremental_stats(
        prev,
        pt.read_raw("prefixes"), pt.read_raw("entries"),
        nt.read_raw("prefixes"), nt.read_raw("entries"),
        merge.touched, pin_inputs=False, path_buckets=8,
    )
    # the fixture has real hardlink groups -> the spill index is
    # non-trivial and the fully-pruned closure must still be exact
    assert cat.spill_index("v0001").count() > 0
    inc_s = incremental_stats(
        prev,
        pt.read_raw("prefixes"), pt.read_raw("entries"),
        nt.read_raw("prefixes"), nt.read_raw("entries"),
        merge.touched, pin_inputs=False, path_buckets=8,
        prev_spill=cat.spill_index("v0001"),
        new_spill=cat.spill_index("v0002"),
    )
    inc_plain = incremental_stats(
        prev, pt.prefixes, pt.entries,
        nt.prefixes, nt.entries, merge.touched, pin_inputs=False,
    )
    full = compute_stats(nt.prefixes, nt.entries, StatsOptions())
    assert _summaries(inc_b) == _summaries(full)
    assert _summaries(inc_s) == _summaries(full)
    assert _summaries(inc_b) == _summaries(inc_plain)


def test_bucketed_layout_requires_pb(spark):
    import pytest

    import __spark_entry__ as em
    from dudb_spark.operators.ingest import merge_scan

    prev_p, prev_e, staged_p, staged_e = em._merge_fixture(spark)
    prev = compute_stats(prev_p, prev_e, StatsOptions())
    merge = merge_scan(prev_p, prev_e, staged_p, staged_e, root="/tree")
    with pytest.raises(ValueError, match="pb"):
        incremental_stats(
            prev, prev_p, prev_e, merge.prefixes, merge.entries,
            merge.touched, path_buckets=8,
        )


def _fuzz_scenario(rng, root, device):
    """One random tree + random churn, namespaced under ``root`` with its
    own ``device`` — (device, inode) keys cannot cross scenarios, so many
    scenarios batch into ONE snapshot pair and one incremental-vs-full
    comparison certifies them all independently.

    Returns (prev_p_rows, prev_e_rows, new_p_rows, new_e_rows, touched).
    Row shape: prefixes (path, size, inode); entries
    (path, is_dir, size, inode) — device is appended by the caller.
    """
    n_dirs = rng.randint(3, 9)
    dirs = [root] + [f"{root}/d{i}" for i in range(n_dirs)]
    prev_p_rows = []
    for i, d in enumerate(dirs):
        # ~25% of non-root dirs share a record inode with an earlier dir,
        # so churn can flip dir-level canonicals (the advice repro)
        if i > 1 and rng.random() < 0.25:
            share_from = rng.choice(prev_p_rows[1:])
            prev_p_rows.append((d, share_from[1], share_from[2]))
        else:
            prev_p_rows.append((d, 4096 + 8 * i, 1000 + i))
    files = []
    ino = 5000
    for d in dirs[1:]:
        for j in range(rng.randint(0, 4)):
            if rng.random() < 0.25 and files:
                share = rng.choice(files)[3]  # join a hardlink group
            else:
                ino += 1
                share = ino
            files.append((f"{d}/f{j}", False, rng.randint(1, 9000), share))
    by_path = dict((r[0], r) for r in prev_p_rows)
    dir_entries = [(d, True, by_path[d][1], by_path[d][2]) for d in dirs[1:]]
    prev_e_rows = dir_entries + files

    new_p_rows = list(prev_p_rows)
    new_e_rows = list(prev_e_rows)
    touched = {root}

    # 1-3 random mutations; each keeps the merge invariant (an entry only
    # changes under a touched dir)
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["delete", "modify", "hardlink", "dir_share",
                           "add_dir"])
        live = [r[0] for r in new_p_rows if r[0] != root]
        if kind == "delete" and live:
            victim = rng.choice(live)
            new_p_rows = [r for r in new_p_rows if r[0] != victim]
            new_e_rows = [
                r for r in new_e_rows
                if not r[0].startswith(victim + "/") and r[0] != victim
            ]
            touched.add(victim)
        elif kind == "modify" and live:
            target = rng.choice(live)
            new_e_rows = [
                (r[0], r[1], r[2] + 11, r[3])
                if r[0].startswith(target + "/") and not r[1] else r
                for r in new_e_rows
            ]
            touched.add(target)
        elif kind == "hardlink" and live:
            target = rng.choice(live)
            pool = [r for r in new_e_rows if not r[1]]
            if pool:
                src = rng.choice(pool)
                new_path = f"{target}/zz_link{rng.randint(0, 99)}"
                if all(r[0] != new_path for r in new_e_rows):
                    new_e_rows.append((new_path, False, src[2], src[3]))
                    touched.add(target)
        elif kind == "dir_share" and len(new_p_rows) > 1:
            # new top-level dir whose RECORD shares an existing dir's
            # (device, inode) — the flip-cascade shape
            src = rng.choice(new_p_rows[1:])
            new_path = f"{root}/zs{rng.randint(0, 99)}"
            if all(r[0] != new_path for r in new_p_rows):
                new_p_rows.append((new_path, src[1], src[2]))
                new_e_rows.append((new_path, True, src[1], src[2]))
                touched.add(new_path)
        else:  # add_dir with fresh files
            new_path = f"{root}/za{rng.randint(0, 99)}"
            if all(r[0] != new_path for r in new_p_rows):
                ino += 1
                new_p_rows.append((new_path, 4096, ino))
                new_e_rows.append((new_path, True, 4096, ino))
                for j in range(rng.randint(0, 2)):
                    ino += 1
                    new_e_rows.append(
                        (f"{new_path}/g{j}", False, rng.randint(1, 500), ino)
                    )
                touched.add(new_path)
    return prev_p_rows, prev_e_rows, new_p_rows, new_e_rows, touched


def test_incremental_fuzz_random_mutations(spark, tmp_path):
    """Machine-check of the closure proof (module docstring of
    incremental.py): 200 random trees with cross-directory hardlink
    groups and random add/delete/modify/dir-share churn — incremental ==
    full refold on every seed.  Scenarios are device-isolated and
    batched 25-per-snapshot, so the whole sweep costs 8 comparison
    rounds instead of 200.  Every fourth batch ALSO runs through the
    bucketed layout + spill-index path (write → pruned closure), fuzzing
    the spill completeness argument against the same oracles."""
    import random

    from dudb_spark.sources.catalog import SnapshotCatalog

    BATCH = 25
    for batch in range(8):
        pp, pe, np_, ne, tp = [], [], [], [], []
        for s in range(BATCH):
            seed = batch * BATCH + s
            rng = random.Random(20260814 + seed)
            root, dev = f"/t{seed}", seed + 1
            a, b, c, d, t = _fuzz_scenario(rng, root, dev)
            pp += [r + (dev,) for r in a]
            pe += [r + (dev,) for r in b]
            np_ += [r + (dev,) for r in c]
            ne += [r + (dev,) for r in d]
            tp += [(p,) for p in t]

        def pfx(rows):
            return spark.createDataFrame(
                [(p, p.rsplit("/", 1)[0] or "/", sz, sz // 512, 0o755,
                  None, 100, 10, dev, ino) for p, sz, ino, dev in rows],
                P_COLS,
            )

        def ent(rows):
            return spark.createDataFrame(
                [(p.rsplit("/", 1)[0], p.rsplit("/", 1)[1], p, isd, sz,
                  sz // 512, 0o644, 100, 10, dev, ino)
                 for p, isd, sz, ino, dev in rows],
                E_COLS,
            )

        prev_p, prev_e = pfx(pp), ent(pe)
        new_p, new_e = pfx(np_), ent(ne)
        touched = spark.createDataFrame(tp, ["path"])
        prev = compute_stats(prev_p, prev_e, StatsOptions())
        inc = incremental_stats(prev, prev_p, prev_e, new_p, new_e, touched)
        full = compute_stats(new_p, new_e, StatsOptions())
        assert _summaries(inc) == _summaries(full), f"batch {batch}"

        if batch % 4 == 0:
            cat = SnapshotCatalog(spark, str(tmp_path / f"db{batch}"))
            cat.write_snapshot(
                prev_p, prev_e, layout="bucketed", path_buckets=8
            )
            pv, pt = cat.latest_version(), cat.tables()
            cat.write_snapshot(
                new_p, new_e, layout="bucketed", path_buckets=8
            )
            nv, nt = cat.latest_version(), cat.tables()
            inc_b = incremental_stats(
                prev,
                pt.read_raw("prefixes"), pt.read_raw("entries"),
                nt.read_raw("prefixes"), nt.read_raw("entries"),
                touched, pin_inputs=False, path_buckets=8,
                prev_spill=cat.spill_index(pv),
                new_spill=cat.spill_index(nv),
            )
            assert _summaries(inc_b) == _summaries(full), (
                f"bucketed batch {batch}"
            )


def test_at_scale_staging_fuzz(spark):
    """The q118 production shape (lineitem→_scale_fs staging, merge_scan,
    pin_inputs=False) fuzzed over random churn classes: changed/deleted
    dir bands and hardlink-copied dirs picked per seed, incremental ==
    full refold each time.  This runs the exact staging pipeline the
    certified gate uses — not the synthetic fuzz trees — so regressions
    in the staging/merge/closure composition itself get caught."""
    import random

    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from dudb_spark.operators.ingest import merge_scan

    li = em._t(spark, "/root/testdata/sf0.001", "lineitem").withColumn(
        "l_partkey",
        F.when(
            F.col("l_partkey") % 199 == 0, F.col("l_partkey") + 1
        ).otherwise(F.col("l_partkey")),
    )
    d500 = F.col("l_orderkey") % 500
    prev_p, prev_e = em._scale_fs(li)
    for seed in range(3):
        rng = random.Random(20260814 + seed)
        ch_mod = rng.choice([50, 100, 125])
        del_mod = rng.choice([50, 100, 250])
        n_add = rng.randint(1, 4)
        ch_p, ch_e = em._scale_fs(
            li.where(d500 % ch_mod == 3), size_plus=seed + 5,
            prefix_mtime="2025-03-01 00:00:00",
        )
        add_p, add_e = em._scale_fs(
            li.where(d500.between(495 - n_add, 494)), dir_prefix="a",
            dir_index=d500 - (495 - n_add), pinode_plus=50_000_000,
        )
        pdir = F.substring("path", 9, 10).cast("long")
        staged_p = (
            prev_p.where((pdir % del_mod != 7) & (pdir % ch_mod != 3))
            .unionByName(ch_p)
            .unionByName(add_p)
        )
        staged_e = ch_e.unionByName(add_e)

        prev = compute_stats(prev_p, prev_e, StatsOptions())
        merge = merge_scan(
            prev_p, prev_e, staged_p, staged_e, root="/scale",
            with_summary=False,
        )
        new_p = merge.prefixes.localCheckpoint()
        new_e = merge.entries.localCheckpoint()
        touched = merge.touched.localCheckpoint()
        inc = incremental_stats(
            prev, prev_p, prev_e, new_p, new_e, touched,
            pin_inputs=False,
        )
        full = compute_stats(new_p, new_e, StatsOptions())
        assert _summaries(inc) == _summaries(full), f"seed {seed}"


def test_spill_index_drops_single_bucket_keys(spark, tmp_path):
    """Round-8 index shrink: a hardlink group confined to ONE bucket
    (e.g. same-directory file hardlinks — their entry rows all hash by
    the same parent) is excluded from hlinks.parquet; cross-bucket
    groups stay; rec-multi keys (hardlinked DIRECTORIES) stay even when
    single-bucket, because the flip-round gate reads them from the
    index."""
    from dudb_spark.sources.catalog import SnapshotCatalog

    prev_p = _pfx(spark, [
        ("/t", 10, 1), ("/t/a", 20, 2), ("/t/b", 30, 3),
        # hardlinked dir pair: same (device, inode) on two records
        ("/t/h1", 40, 900), ("/t/h2", 40, 900),
    ])
    prev_e = _ent(spark, [
        ("/t/a", True, 20, 2), ("/t/b", True, 30, 3),
        ("/t/h1", True, 40, 900), ("/t/h2", True, 40, 900),
        # same-dir hardlink pair: both entry rows bucket by "/t/a"
        ("/t/a/s1", False, 7, 100), ("/t/a/s2", False, 7, 100),
        # cross-dir hardlink pair: buckets by "/t/a" vs "/t/b"
        ("/t/a/x1", False, 9, 200), ("/t/b/x2", False, 9, 200),
    ])
    cat = SnapshotCatalog(spark, str(tmp_path / "db"))
    cat.write_snapshot(prev_p, prev_e, layout="bucketed", path_buckets=64)
    # precondition: the two parents really hash to distinct buckets
    pbs = {
        r[0]: r[1] for r in spark.sql(
            "SELECT p, pmod(xxhash64(p), 64) FROM "
            "VALUES ('/t/a'), ('/t/b') AS t(p)"
        ).collect()
    }
    assert pbs["/t/a"] != pbs["/t/b"]

    idx = {
        (r["inode"], r["rec"])
        for r in cat.spill_index().select("inode", "rec").collect()
    }
    inodes = {i for i, _ in idx}
    assert 100 not in inodes          # single-bucket group: dropped
    assert 200 in inodes              # cross-bucket group: kept
    assert (900, True) in idx         # hardlinked dirs: kept, rec=True
    # plain dirs (two rows, two buckets) stay spill keys with rec=False
    assert (2, False) in idx and (3, False) in idx
