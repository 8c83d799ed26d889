"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count + column names + order-insensitive values.

Usage: python tools/verify_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entry_mod
from dudb_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


# The driver's value hash is TYPE-sensitive: a DuckDB HUGEINT (what DuckDB
# widens every integer SUM to) or DECIMAL materializes as float/Decimal on
# its comparison path and hashes differently from Spark's int64 even when
# the values are equal (round-1 root cause for 9 hash_match failures).
# Map both schemas to type families and require them to agree per column.
def spark_type_family(dt: str) -> str:
    dt = dt.lower()
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "integer"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt == "boolean":
        return "bool"
    if dt in ("timestamp", "timestamp_ntz", "date"):
        return "time"
    if dt == "string":
        return "str"
    return dt


def duckdb_type_family(dt: str) -> str:
    dt = str(dt).upper()
    if dt in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if dt in ("HUGEINT", "UHUGEINT"):
        return "hugeint"  # never matches Spark — outer-cast the SUM to BIGINT
    if dt in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt == "BOOLEAN":
        return "bool"
    if dt.startswith("TIMESTAMP") or dt == "DATE":
        return "time"
    if dt == "VARCHAR":
        return "str"
    return dt.lower()


def type_problems(s_schema, d_cols, d_types):
    """Compare per-column type families between Spark and DuckDB results."""
    s_fam = {name: spark_type_family(dt) for name, dt in s_schema}
    probs = []
    for name, dt in zip(d_cols, d_types):
        fam = duckdb_type_family(dt)
        if name in s_fam and s_fam[name] != fam:
            probs.append(
                f"type mismatch on {name!r}: spark={s_fam[name]} "
                f"duckdb={fam} ({dt})"
            )
    return probs


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("verify_entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_schema = sdf.dtypes
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(s_rows)} rows, "
                  f"{time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            rel = con.sql(oracles[name])
            d_cols = list(rel.columns)
            d_types = list(rel.types)
            d_rows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={s_cols} duckdb={d_cols}")
        problems.extend(type_problems(s_schema, d_cols, d_types))
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if not problems:
            a, b = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
