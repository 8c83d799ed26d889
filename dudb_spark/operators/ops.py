"""Operational queries: ``errors``, ``logs``, ``database locate``, and the
uid/gid→name resolution used by ``stats view --user/--group``.

Reference: ls.go:30–87 (errors/logs listing with ``--since/--from/--to``
time-range semantics, parsed in internal/util.go:20–43), badgerdb.go:401–452
(log bucket keyed by RFC3339 start time; LastLog = newest), and
internal/usernames/usergroups.go:26–60 + reports.go:164–172 (id→name dim).

Spark shape: plain filters over the append-only ``errors``/``scan_logs``
tables — the time-range predicate pushes down to the Parquet scan — and a
**broadcast join** against the tiny ``users``/``groups`` dims (J3).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dudb_spark.operators.find import subtree_pred


def parse_time_range(
    since: str | None = None,
    from_t: str | None = None,
    to_t: str | None = None,
    now: datetime | None = None,
) -> tuple[datetime | None, datetime | None]:
    """--since takes a duration (e.g. '24h', '30m'); --from/--to absolute
    times (util.go:20–43: RFC3339 or date).  since and from are exclusive."""
    if since and from_t:
        raise ValueError("--since and --from are mutually exclusive")
    if since:
        now = now or datetime.now(timezone.utc)
        units = {"h": 3600, "m": 60, "s": 1, "d": 86400}
        unit = since[-1]
        if unit not in units:
            raise ValueError(f"bad duration {since!r}")
        delta = timedelta(seconds=float(since[:-1]) * units[unit])
        return now - delta, None
    parse = lambda s: _parse_abs(s) if s else None  # noqa: E731
    return parse(from_t), parse(to_t)


def _parse_abs(value: str) -> datetime:
    for fmt in ("%Y-%m-%dT%H:%M:%S%z", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d"):
        try:
            dt = datetime.strptime(value, fmt)
            return dt if dt.tzinfo else dt.replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    raise ValueError(f"cannot parse time {value!r}")


def _time_filter(df: DataFrame, col: str, start, stop) -> DataFrame:
    if start is not None:
        df = df.where(F.col(col) >= F.lit(start))
    if stop is not None:
        df = df.where(F.col(col) < F.lit(stop))
    return df


def list_errors(
    errors: DataFrame,
    root: str = "",
    since: str | None = None,
    from_t: str | None = None,
    to_t: str | None = None,
) -> DataFrame:
    """``idu errors <prefix>``: scan errors under a subtree, optionally
    time-bounded, in path order (ls.go:56–66)."""
    start, stop = parse_time_range(since, from_t, to_t)
    df = errors.where(subtree_pred(F.col("path"), root))
    return _time_filter(df, "at", start, stop).orderBy("path")


def list_logs(
    scan_logs: DataFrame,
    since: str | None = None,
    from_t: str | None = None,
    to_t: str | None = None,
    newest_only: bool = False,
) -> DataFrame:
    """``idu logs``: analyze-run summaries in reverse start-time order;
    ``newest_only`` = LastLog (badgerdb.go:418–431)."""
    start, stop = parse_time_range(since, from_t, to_t)
    df = _time_filter(scan_logs, "start", start, stop).orderBy(F.desc("start"))
    return df.limit(1) if newest_only else df


def with_names(
    df: DataFrame,
    users: DataFrame | None = None,
    groups: DataFrame | None = None,
    id_col: str = "id",
    dim: str = "user",
) -> DataFrame:
    """Resolve numeric ids to names via a broadcast join against the tiny
    dim table; unknown ids keep their numeric form (usergroups.go:40–58
    falls back to the id string)."""
    dim_df = users if dim == "user" else groups
    if dim_df is None:
        return df.withColumn("name", F.col(id_col).cast("string"))
    key = "uid" if dim == "user" else "gid"
    joined = df.join(
        F.broadcast(dim_df.withColumnRenamed(key, id_col)), id_col, "left"
    )
    return joined.withColumn(
        "name", F.coalesce(F.col("name"), F.col(id_col).cast("string"))
    )
