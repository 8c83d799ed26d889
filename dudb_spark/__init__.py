"""dudb_spark — a PySpark-native filesystem-metadata analytics engine.

A from-scratch re-expression of the capabilities of the reference engine
``cloudengio/dudb`` (the Go CLI ``idu``) on Apache Spark.  The reference is a
single-node, BadgerDB-backed incremental ``du``; this engine keeps the same
*semantics* (per-directory records, a boolean predicate language evaluated at
two granularities, grouped totals with top-N rankings, hardlink-aware dedup
counting, pluggable storage calculators, multi-format report sinks) but maps
every operator onto declarative DataFrame/SQL plans so Catalyst/Tungsten pick
the physical strategy and the whole thing scales out on a cluster.

Package layout
--------------
- :mod:`dudb_spark.session`   — tuned SparkSession builder
- :mod:`dudb_spark.model`     — table schemas (prefixes/entries/errors/...)
- :mod:`dudb_spark.functions` — expression language compiler, calculators
- :mod:`dudb_spark.sources`   — synthetic fixture generator, fs crawler,
  parquet catalog helpers
- :mod:`dudb_spark.operators` — find, stats (totals/top-N/hardlinks),
  incremental merge, operational queries
- :mod:`dudb_spark.reports`   — TSV / JSON-lines / Markdown sinks
- :mod:`dudb_spark.pipeline`  — LLM-training-data operators (dedup,
  similarity search, text analysis, multimodal plumbing)
- :mod:`dudb_spark.streaming` — Structured Streaming extensions
"""

__version__ = "0.1.0"
