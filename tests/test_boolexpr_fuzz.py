"""Seeded fuzz: random expressions over the full grammar, compiled to
Columns and batch-evaluated in ONE Spark job, each compared against the
pure-Python oracle evaluator.  Catches compiler/oracle divergence on
operator precedence, negation, and operand edge cases beyond the golden
expression list."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dudb_spark.functions.boolexpr import compile_expr, parse
from dudb_spark.model import FsTables
from tests.oracle_fold import eval_expr

TERMS = [
    "user=100",
    "user=101",
    "user=999",
    "group=2",
    "group=3",
    "name=f0-*",
    "name=*-1",
    "name=f?-2",
    "iname=F1-*",
    "re=d0-0",
    "re='f[01]-'",
    "type=f",
    "type=d",
    "type=l",
    "type=x",
    "newer=2025-01-01T00:30:00",
    "dir-larger=3",
    "dir-smaller=9",
]


def gen_expr(rnd: random.Random, depth: int = 0) -> str:
    r = rnd.random()
    if depth >= 3 or r < 0.35:
        return rnd.choice(TERMS)
    if r < 0.5:
        return f"!({gen_expr(rnd, depth + 1)})"
    op = "&&" if rnd.random() < 0.5 else "||"
    left, right = gen_expr(rnd, depth + 1), gen_expr(rnd, depth + 1)
    if rnd.random() < 0.5:
        return f"({left}) {op} ({right})"
    return f"{left} {op} {right}"


def _check(df, rows, mode: str, exprs: list[str]):
    cols = [
        compile_expr(e, mode=mode).alias(f"e{i}") for i, e in enumerate(exprs)
    ]
    got = df.select("path", *cols).collect()
    asts = [parse(e) for e in exprs]
    is_prefix = mode == "prefix"
    by_path = {r["path"]: r for r in rows}
    for row in got:
        oracle_row = by_path[row["path"]]
        for i, ast in enumerate(asts):
            want = eval_expr(ast, oracle_row, is_prefix)
            assert bool(row[f"e{i}"]) == want, (
                exprs[i],
                mode,
                row["path"],
            )


def test_fuzz_expressions_match_oracle(spark, fs_dir, tree):
    rnd = random.Random(20260813)
    exprs = [gen_expr(rnd) for _ in range(40)]
    t = FsTables(spark, fs_dir)
    _check(t.entries, tree.entry_rows, "entry", exprs)
    _check(t.prefixes, tree.prefix_rows, "prefix", exprs)
