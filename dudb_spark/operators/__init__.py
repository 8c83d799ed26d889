"""Query operators: find, stats, incremental merge, operational queries."""

from dudb_spark.operators.find import find  # noqa: F401
from dudb_spark.operators.stats import StatsOptions, compute_stats  # noqa: F401
