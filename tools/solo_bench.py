"""Solo-time individual bench queries on a quiet box, with both calib
anchors, so cross-round regressions can be separated from host drift
(BENCH_NOTES.md round-7 finding: suite numbers drift 30-40% with
byte-identical code; the JVM anchor is blind to Python-worker drift).

Usage: python tools/solo_bench.py q86 q124 q127 [--sf /root/testdata/sf0.1]
Prints one JSON line: {"calib_scan_agg_sec": ..., "calib_pandas_udf_sec":
..., "queries": {"q86_real_codecs": [t1, t2], ...}} — two timed reps per
query (cold-in-process, then warm) after the same JVM warm-up bench.py
uses.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _calib_pandas, _calib_scan, get_spark  # noqa: E402


def main():
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    wanted = set(argv)

    spark = get_spark("dudb_spark-solo")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().orderBy("r_name").collect()
    spark.catalog.clearCache()

    out = {"queries": {}}
    out["calib_scan_agg_sec"] = _calib_scan(spark, sf_dir)
    out["calib_pandas_udf_sec"] = _calib_pandas(spark)

    for name, fn in entry_mod.queries().items():
        qid = name.split("_", 1)[0]
        if wanted and qid not in wanted and name not in wanted:
            continue
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = len(df.collect())
            reps.append(round(time.perf_counter() - t0, 3))
            for tbl in spark.catalog.listTables():
                if tbl.name.startswith("dudb_q"):
                    spark.catalog.dropTempView(tbl.name)
            spark.catalog.clearCache()
            try:
                spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
            except Exception:
                pass
        out["queries"][name] = reps
        print(f"  {name}: {reps} ({n} rows)", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
