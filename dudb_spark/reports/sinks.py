"""Report sinks (reference S11–S14).

The reference renders a computed stats snapshot to tab-separated files
(tsv.go:22–57), JSON-lines (json.go:20–39) and a templated Markdown summary
(markdown.go:32–179), into timestamped report directories with a ``latest``
pointer, plus ``reports locate`` returning the newest N dirs
(reports.go:128–176, 257–304).

Spark shape: TSV/JSON are distributed DataFrame writes (S11/S12) — at scale
these are the real output path and parallelize across executors.  Markdown
is presentation over *post-aggregation* data (top-N rows, already tiny), so
it renders driver-side from a bounded ``toPandas()`` — the one place where
driver-side processing is correct by construction because the top-N operator
bounded the row count first.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from dudb_spark.operators.stats import METRICS, StatsResult

TS_FORMAT = "%Y-%m-%d-%H%M%S"  # mirrors the reference's dir naming


def write_tsv_report(df: DataFrame, out_dir: str) -> None:
    """S11: header + tab-separated rows."""
    df.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(
        out_dir
    )


def write_json_report(df: DataFrame, out_dir: str) -> None:
    """S12: one JSON object per row."""
    df.write.mode("overwrite").json(out_dir)


def write_markdown_report(
    stats: StatsResult,
    path: str,
    display_n: int = 20,
    users: DataFrame | None = None,
    groups: DataFrame | None = None,
) -> str:
    """S13: Markdown summary — TOC, global totals, per-metric top-N tables,
    per-user/per-group sections (markdown.go:32–179 template structure).
    ``users``/``groups`` are the tiny id→name dims (J3): joined broadcast-
    style via a collected dict since they are bounded by the id space."""
    uid_names = (
        {r["uid"]: r["name"] for r in users.collect()} if users is not None else {}
    )
    gid_names = (
        {r["gid"]: r["name"] for r in groups.collect()} if groups is not None else {}
    )

    lines: list[str] = []
    meta = stats.meta
    lines += [
        f"# Usage report for `{meta.get('root') or '/'}`",
        "",
        f"- expression: `{meta.get('expression') or '(all)'}`",
        f"- generated: {datetime.now(timezone.utc).isoformat()}",
        "",
        "## Contents",
        "",
        "- [Totals](#totals)",
        "- [Top prefixes](#top-prefixes)",
        "- [Per user](#per-user)",
        "- [Per group](#per-group)",
        "",
        "## Totals",
        "",
    ]
    tot = stats.totals().collect()[0].asDict()
    lines += ["| metric | value |", "|---|---|"]
    lines += [f"| {k} | {v} |" for k, v in tot.items()]
    lines += ["", "## Top prefixes", ""]

    for metric in METRICS:
        rows = stats.top_prefixes(metric, display_n).collect()
        lines += [f"### Top {display_n} by {metric}", ""]
        lines += [f"| prefix | {metric} |", "|---|---|"]
        lines += [f"| {r['prefix']} | {r[metric]} |" for r in rows]
        lines += [""]

    for title, dim, names in (
        ("Per user", "user", uid_names),
        ("Per group", "group", gid_names),
    ):
        lines += [f"## {title}", ""]
        rows = stats.top_ids("bytes", display_n, dim).collect()
        lines += ["| id | name | bytes |", "|---|---|---|"]
        lines += [
            f"| {r['id']} | {names.get(r['id'], str(r['id']))} | {r['bytes']} |"
            for r in rows
        ]
        lines += [""]

    content = "\n".join(lines)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(content)
    return content


def write_reports(
    stats: StatsResult,
    reports_root: str,
    display_n: int = 20,
    when: datetime | None = None,
    users: DataFrame | None = None,
    groups: DataFrame | None = None,
) -> str:
    """S14: write tsv/ json/ markdown into a fresh timestamped dir and
    refresh the ``latest`` marker.  Returns the report dir path."""
    when = when or datetime.now(timezone.utc)
    out = f"{reports_root.rstrip('/')}/{when.strftime(TS_FORMAT)}"
    # The sinks below fire ~10 actions (two merged writes, totals, five
    # top-prefix tables, two top-id tables).  Without pinning the summary
    # frames, every action re-runs the full grouping-sets fold from the
    # source tables — the reference never does that either: it reports off
    # the materialized .idustats snapshot (reports.go:57–58).  The frames
    # are post-aggregation (one row per directory / (id, directory)), so
    # MEMORY_AND_DISK is safe at any corpus size that produced them.
    pinned = [stats.per_prefix, stats.per_user, stats.per_group]
    for df in pinned:
        df.persist()
    try:
        merged = stats.merged_top(display_n)
        write_tsv_report(merged, f"{out}/tsv")
        write_json_report(merged, f"{out}/json")
        write_markdown_report(
            stats, f"{out}/markdown/report.md", display_n, users, groups
        )
    finally:
        for df in pinned:
            df.unpersist()
    with open(f"{reports_root.rstrip('/')}/latest", "w") as f:
        f.write(os.path.basename(out))
    return out


def locate_reports(reports_root: str, n: int = 1) -> list[dict]:
    """``reports locate``: newest N report dirs as JSON-able dicts
    (reports.go:257–304)."""
    try:
        names = [
            d
            for d in os.listdir(reports_root)
            if os.path.isdir(os.path.join(reports_root, d))
        ]
    except FileNotFoundError:
        return []
    names.sort(reverse=True)
    out = []
    for name in names[:n]:
        out.append(
            {
                "report": name,
                "path": os.path.join(reports_root, name),
                "when": datetime.strptime(name, TS_FORMAT)
                .replace(tzinfo=timezone.utc)
                .isoformat(),
            }
        )
    return out


def to_json_lines(df: DataFrame, limit: int = 10000) -> str:
    """Small-result JSON-lines string (driver-side, bounded)."""
    return "\n".join(json.dumps(r.asDict(), default=str) for r in df.limit(limit).collect())
