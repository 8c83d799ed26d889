"""F3 — config path expansion (reference config.go:22-47), column form.

The CLI's :func:`dudb_spark.cli.expand_path` (``os.path.expandvars`` +
``expanduser``) runs driver-side on config strings.  This module is the
same expansion as a **Spark Column expression**, so a path column stored
IN data (a config table, a crawl manifest, report templates) expands
distributed and — the point for certification — the exact computation
restates in ANSI SQL for the DuckDB oracle (q130).

Envelope (documented, fuzz-pinned against ``expand_path`` in
tests/test_units.py): the braced ``${VAR}`` form with values that do not
themselves contain ``$`` (sequential ``replace`` re-scans inserted text;
``os.path.expandvars`` does not), plus leading ``~`` / ``~/``.  The bare
``$VAR`` form needs a word-boundary lookahead that RE2 (DuckDB) lacks,
so the column twin deliberately leaves it to the driver-side function.
Expansion order mirrors ``expand_path``: variables first, then ``~`` on
the RESULT (so a value of ``~/x`` gains the home prefix, exactly like
``expanduser(expandvars(p))``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def expand_path_col(col: Column, env: dict[str, str], home: str) -> Column:
    """``${VAR}`` + leading-tilde expansion of a string column against a
    literal environment map.  Unknown ``${...}`` references stay as-is
    (``os.path.expandvars`` semantics).  Replacement order is sorted by
    name so the SQL restatement below stays in lockstep."""
    out = col
    for name in sorted(env):
        out = F.replace(out, F.lit("${" + name + "}"), F.lit(env[name]))
    return (
        F.when(out == "~", F.lit(home))
        .when(out.startswith("~/"), F.concat(F.lit(home), F.substring(out, 2, 2147483647)))
        .otherwise(out)
    )


def expand_path_sql(expr: str, env: dict[str, str], home: str) -> str:
    """The identical expansion as ANSI SQL (oracle restatement): the same
    sorted ``replace`` chain, then the same leading-tilde CASE."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    e = expr
    for name in sorted(env):
        e = f"replace({e}, {q('${' + name + '}')}, {q(env[name])})"
    return (
        f"CASE WHEN ({e}) = '~' THEN {q(home)} "
        f"WHEN ({e}) LIKE '~/%' THEN {q(home)} || substr({e}, 2) "
        f"ELSE ({e}) END"
    )
