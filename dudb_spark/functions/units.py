"""Byte-size presentation: decimal (KB) vs binary (KiB) units.

Reference F4 (main.go:175–188, 241–250): a global ``--units`` flag picks
decimal or binary multiples for every size printed.  Pure presentation —
applied driver-side on already-aggregated rows.
"""

from __future__ import annotations

_DECIMAL = ["B", "KB", "MB", "GB", "TB", "PB", "EB"]
_BINARY = ["B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB"]


def format_bytes(n: int, binary: bool = False, precision: int = 2) -> str:
    """Format a byte count with decimal (1000) or binary (1024) multiples."""
    base = 1024 if binary else 1000
    units = _BINARY if binary else _DECIMAL
    val = float(n)
    neg = val < 0
    val = abs(val)
    for unit in units:
        if val < base or unit == units[-1]:
            s = f"{val:.{precision}f}".rstrip("0").rstrip(".")
            return f"{'-' if neg else ''}{s} {unit}"
        val /= base
    raise AssertionError("unreachable")
