"""Dump .explain('formatted') for declared queries to plans/r12/.

Usage: python tools/dump_plan.py <before|after> q166 q167 ... [--sf DIR]

Captures the physical plan of each requested query's returned DataFrame
at the given suffix, e.g. plans/r12/q166_before.txt.  Eager pins
(localCheckpoint) inside query construction execute as usual — the dump
reflects the plan of the final frame exactly as the bench times it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from dudb_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    suffix = argv[0]
    wanted = set(argv[1:])
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dudb_spark-plans")
    sf_label = os.path.basename(sf_dir.rstrip("/"))
    for name, fn in entry_mod.queries().items():
        qid = name.split("_", 1)[0]
        if wanted and qid not in wanted and name not in wanted:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} — .explain('formatted') at {sf_label} "
                f"({suffix})\n\n"
            )
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_scan = plan.count("Scan parquet")
        print(f"{qid}: {len(plan.splitlines())} lines, {n_ex} Exchange, "
              f"{n_scan} parquet scans -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
