"""LLM-training-data pipeline operators (beyond reference parity).

These are the operations a 100 TB training-data pipeline needs, built
Spark-first on the driver's ``documents``/``embeddings``/``events`` tables:

- :mod:`dudb_spark.pipeline.text`       — language-ID, quality scoring,
  token counting, document fingerprinting (all native Column expressions)
- :mod:`dudb_spark.pipeline.dedup`      — exact, MinHash+LSH, SimHash,
  n-gram Jaccard, embedding-cosine near-dup
- :mod:`dudb_spark.pipeline.similarity` — brute-force and LSH-bucketed
  approximate nearest neighbours over embedding columns
- :mod:`dudb_spark.pipeline.multimodal` — binary media columns with typed
  metadata; decode/feature plumbing via Arrow-batched mapInPandas
"""
