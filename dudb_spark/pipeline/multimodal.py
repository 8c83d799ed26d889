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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_images(
    media: DataFrame, width: int = 32, height: int = 32, strict: bool = False
) -> DataFrame:
    """Arrow-batched image resize: same schema out as in, with the payload
    replaced and ``meta.width/height`` updated.  The pixel work is stubbed
    (deterministic digest of (payload, target size) sized ~w*h/8) —
    ``strict=True`` raises where PIL/libvips would plug in.  Metadata is
    rewritten JVM-side (withField), so only the payload crosses into
    Python."""

    from pyspark.sql.functions import pandas_udf

    n_out = max(width * height // 8, 32)

    @pandas_udf(T.BinaryType())
    def _resize(payloads: pd.Series) -> pd.Series:
        if strict:
            raise NotImplementedError(
                "real image resizing requires imaging libraries "
                "not present in this environment"
            )
        out = []
        for p in payloads:
            seed = hashlib.sha256(bytes(p) + f"{width}x{height}".encode()).digest()
            out.append(bytes((seed * (n_out // 32 + 1))[:n_out]))
        return pd.Series(out)

    # one pass: only the payload crosses the Arrow boundary (scalar pandas
    # UDF); meta is rewritten JVM-side in the same projection — no second
    # evaluation of the source and no re-attach join
    return media.select(
        "media_id",
        _resize("payload").alias("payload"),
        F.col("meta")
        .withField("width", F.lit(width))
        .withField("height", F.lit(height))
        .alias("meta"),
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (a 1→N
    ``mapInPandas`` — the iterator contract allows the kernel to yield more
    rows than it consumes, so no explode of a pre-built array is needed and
    per-batch memory stays bounded by frames-per-batch).  Frame count
    derives from ``meta.duration_ms``; the frame decode is stubbed with a
    deterministic digest of (payload, frame index)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "real frame extraction requires ffmpeg/av libraries "
                "not present in this environment"
            )
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, p, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # nullable long arrives as float NaN through Arrow/pandas
                if dur is None or pd.isna(dur):
                    n = 1
                else:
                    n = min(int(dur) // every_ms + 1, max_frames)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(
                        bytearray(hashlib.sha256(bytes(p) + str(i).encode()).digest())
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "payload": payloads}
            )

    return media.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(kernel, FRAME_SCHEMA)


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
