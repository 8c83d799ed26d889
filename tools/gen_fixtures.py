"""Generate the committed filesystem-metadata parity fixtures.

Writes a deterministic SyntheticTree (same generator the unit tests use) to
``fixtures/fs/`` as single-part Parquet directories.  These are read by BOTH
sides of the driver's correctness gate — the Spark queries and the DuckDB
oracle SQL (via read_parquet over the same absolute path) — so the engine's
reference-parity operators (find, stats totals, per-user grouping, hardlink
counters) get value-exact oracle checks, not just rows-only ones.

Regenerate with: python tools/gen_fixtures.py   (output is deterministic)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dudb_spark.session import get_spark
from dudb_spark.sources.fixtures import SyntheticTree

OUT = "/root/repo/fixtures/fs"


def main():
    spark = get_spark("gen_fixtures", master="local[4]", shuffle_partitions=4)
    tree = SyntheticTree(depth=3, breadth=3, nfiles=4)
    tree.write(spark, OUT)
    print(f"wrote {len(tree.prefix_rows)} prefixes, "
          f"{len(tree.entry_rows)} entries to {OUT}")


if __name__ == "__main__":
    main()
