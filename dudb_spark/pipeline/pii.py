"""PII detection/redaction signals — regex-class scans over a text
column (LLM-pipeline extension; the reference has no counterpart).

All patterns are deliberately RE2-compatible (no backrefs, no lookahead)
so an oracle engine can restate them verbatim, and every function is a
narrow whole-stage-codegen projection: no shuffle, no UDF, fuses into
the parquet scan.  At 100 TB this runs at scan speed with the text
column as the only wide column read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_CLASSES = (("email", EMAIL_RE), ("phone", PHONE_RE), ("ipv4", IPV4_RE))


def pii_counts(text: Column) -> list[Column]:
    """One count column per PII class (n_email, n_phone, n_ipv4)."""
    return [
        F.regexp_count(text, F.lit(pat)).alias(f"n_{name}")
        for name, pat in _CLASSES
    ]


def redact(text: Column) -> Column:
    """Replace every PII match with its class tag ([EMAIL], ...)."""
    out = text
    for name, pat in _CLASSES:
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII class counts + redacted text; docs with no PII
    pass through with zero counts (filter on total>0 to quarantine)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(text),
        sum(
            (F.regexp_count(text, F.lit(p)) for _, p in _CLASSES),
            F.lit(0),
        ).alias("n_pii"),
        redact(text).alias("redacted"),
    )
