"""Storage-size calculators as pure column expressions.

The reference makes "how many bytes does this file really occupy" pluggable
(reference: config.go:42–44 Calculator interface; config.go:139–208 the
identity/block/raid0 implementations, applied per entry in the totals fold,
stats/totals.go:162,192).  Here each calculator is a factory returning a
native Column expression over ``(size, blocks)`` — Catalyst folds it into the
aggregation, no UDF.

- ``identity``: storage = size (``bytes`` layout, internal/config/config.go:153–155)
- ``block``:    round size up to a multiple of block_size
  (internal/config/config.go:161–167 → diskusage.NewBlock)
- ``raid0``:    full-stripe rounding (internal/config/config.go:177–183 →
  diskusage.NewRAID0(stripe_size, num_stripes); the implementation lives in
  the external public ``cloudeng.io/file/diskusage`` module, not vendored in
  the reference repo — this engine models the standard RAID0 full-stripe
  write: usage = ceil(size / stripe_size) * stripe_size)
- ``sum_size_blocks``: the synthetic size+blocks calculator the reference's
  tests use (stats/totals_test.go:22–28) — kept for golden-test parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def identity(size: Column, blocks: Column) -> Column:
    return size


def block(block_size: int = 4096):
    bs = int(block_size)

    def calc(size: Column, blocks: Column) -> Column:
        return (F.ceil(size / F.lit(bs)) * bs).cast("long")

    return calc


def raid0(stripe_size: int = 65536, num_stripes: int = 2):
    ss = int(stripe_size)

    def calc(size: Column, blocks: Column) -> Column:
        # bytes written = full stripes, rounded up, striped across devices;
        # parity with config.go:183–189 (whole stripes only)
        return (F.ceil(size / F.lit(ss)) * ss).cast("long")

    return calc


def sum_size_blocks(size: Column, blocks: Column) -> Column:
    return (size + blocks).cast("long")


_REGISTRY = {
    "identity": lambda **kw: identity,
    "block": lambda **kw: block(**kw),
    "raid0": lambda **kw: raid0(**kw),
    "sum_size_blocks": lambda **kw: sum_size_blocks,
}


def calculator(name: str = "identity", **kwargs):
    """Look up a calculator factory by config name (config.go:139–156)."""
    try:
        return _REGISTRY[name](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown calculator {name!r}; known: {sorted(_REGISTRY)}"
        ) from None
