"""Multimodal columns: opaque binary media + typed metadata, with the
Spark-side plumbing (schema, batching, partition sizing) real and tested.

Design: media travel as ``binary`` columns next to typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the JVM↔Python boundary moves columnar batches,
never rows.  The actual codec work needs imaging/audio libraries that are
not in this container, so the decode kernel is stubbed: ``fake_decode``
produces a deterministic feature vector from the bytes (so tests exercise
the full distributed path), and ``strict=True`` raises NotImplementedError
where a real decoder would plug in.

At 100 TB: media tables should be written with a small
``spark.sql.files.maxPartitionBytes`` relative to row size (few thousand
rows per task), and decode stages sized by ``arrow.maxRecordsPerBatch`` to
bound per-batch memory (bytes column × batch rows).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def synthetic_media(spark, n: int = 64, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table for testing the plumbing."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * (
            payload_bytes // 32 + 1
        )
        payload = payload[:payload_bytes]
        rows.append(
            (
                i,
                bytearray(payload),
                ("image", "png", 64, 64, None, len(payload)),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: derives a
    ``dim``-float feature from the byte content.  Replace with a real codec
    (PIL/librosa/ffmpeg) when available."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame, dim: int = 8, strict: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``strict=True`` marks where a real decoder is required and raises
    NotImplementedError (the container has no imaging/audio libraries).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real media decoding requires imaging/audio libraries "
                "not present in this environment"
            )
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [fake_decode(bytes(p), dim) for p in pdf["payload"]],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Column metadata rollup (no Python): bytes/type histograms."""
    return (
        media.groupBy(F.col("meta.media_type").alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("meta.n_bytes").alias("total_bytes"),
            F.avg("meta.n_bytes").alias("avg_bytes"),
        )
        .orderBy("media_type")
    )
