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


# ---------------------------------------------------------------------------
# Real codecs: BMP (24-bit uncompressed) and WAV (16-bit PCM) decode in
# pure Python, so at least two genuine decoders exercise the Arrow decode
# path end-to-end without imaging/audio libraries.  Every other format
# stays behind the declared sha256 stubs above.
# ---------------------------------------------------------------------------

import struct


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP: dimensions + per-channel means
    over the real pixel array (bottom-up rows, BGR order, rows padded to
    4 bytes — the actual layout, not a digest)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    n_rows = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    sums = [0, 0, 0]  # B, G, R
    for r in range(n_rows):
        base = data_off + r * row_bytes
        row = payload[base: base + width * 3]
        sums[0] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[2::3])
    n_px = max(width * n_rows, 1)
    return {
        "format": "bmp",
        "width": width,
        "height": n_rows,
        "n_channels": 3,
        "sample_rate": None,
        "n_frames": n_px,
        # RGB order
        "mean": [sums[2] / n_px, sums[1] / n_px, sums[0] / n_px],
        "rms": None,
    }


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE 16-bit PCM payload: fmt chunk + interleaved
    samples, per-channel means and overall RMS computed from the real
    sample values."""
    import array
    import math

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos: pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt_code}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if channels is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = array.array("h")
    samples.frombytes(data[: len(data) // 2 * 2])
    n_frames = len(samples) // channels
    ch_sums = [0] * channels
    sq = 0
    for i, s in enumerate(samples):
        ch_sums[i % channels] += s
        sq += s * s
    n = max(len(samples), 1)
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "n_channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "mean": [c / max(n_frames, 1) for c in ch_sums],
        "rms": math.sqrt(sq / n),
    }


def decode_png(payload: bytes) -> dict:
    """Decode a non-interlaced 8-bit PNG (grayscale or RGB): chunk walk,
    zlib inflate, and full scanline unfiltering (None/Sub/Up/Average/
    Paeth) — per-channel means computed over the real pixel array.
    Pure stdlib (zlib), like the BMP/WAV codecs."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, w = 8, b"", None
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace})"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + body + CRC
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    ch = 3 if color == 2 else 1
    raw = zlib.decompress(idat)
    stride = w * ch
    prev = bytearray(stride)
    sums = [0] * ch
    for r in range(h):
        base = r * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1: base + 1 + stride])
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0          # left
            b = prev[i]                                  # up
            c = prev[i - ch] if i >= ch else 0           # up-left
            if ftype == 1:
                line[i] = (line[i] + a) & 0xFF
            elif ftype == 2:
                line[i] = (line[i] + b) & 0xFF
            elif ftype == 3:
                line[i] = (line[i] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        for i in range(stride):
            sums[i % ch] += line[i]
        prev = line
    n_px = max(w * h, 1)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": ch,
        "sample_rate": None,
        "n_frames": n_px,
        "mean": [s / n_px for s in sums],
        "rms": None,
    }


_DECODERS = {"bmp": decode_bmp, "wav": decode_wav, "png": decode_png}

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("mean", T.ArrayType(T.DoubleType()), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched real decode: BMP and WAV payloads are parsed with the
    pure-Python codecs above; other formats yield a null-typed row (or
    raise under ``strict=True``, marking where PIL/ffmpeg would plug in).
    Same plumbing contract as :func:`extract_features` — only
    (media_id, payload, format) cross the JVM↔Python boundary."""

    # missing keys must be None (not pandas NaN): NaN is a float and the
    # Arrow writer rejects it for array-typed columns
    blank = {f.name: None for f in DECODED_SCHEMA.fields}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, p, fmt in zip(pdf["media_id"], pdf["payload"], pdf["fmt"]):
                dec = _DECODERS.get((fmt or "").lower())
                if dec is None:
                    if strict:
                        raise NotImplementedError(
                            f"no real decoder for format {fmt!r}; BMP/WAV "
                            "are built in, others need imaging/audio libs"
                        )
                    out.append(dict(blank, media_id=mid, format=fmt))
                    continue
                try:
                    out.append(dict(blank, **dec(bytes(p)), media_id=mid))
                except ValueError:
                    # corrupt/unsupported payload for a known format:
                    # null-fill instead of failing the whole batch job
                    if strict:
                        raise
                    out.append(dict(blank, media_id=mid, format=fmt))
            yield pd.DataFrame(
                out, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.select(
        "media_id", "payload", F.col("meta.format").alias("fmt")
    ).mapInPandas(kernel, DECODED_SCHEMA)


def synthetic_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Build a real uncompressed 24-bit BMP filled with one color."""
    row_bytes = (width * 3 + 3) & ~3
    img_size = row_bytes * height
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    r, g, b = rgb
    row = (bytes((b, g, r)) * width).ljust(row_bytes, b"\x00")
    return header + row * height


def synthetic_png(
    width: int, height: int, rgb: tuple[int, int, int], filt: int = 0
) -> bytes:
    """Build a real 8-bit RGB PNG filled with one color.  ``filt``
    selects the per-row filter type (0–4) so tests can exercise every
    unfilter path — the filtered bytes are computed by inverting the
    decoder's arithmetic on the constant image."""
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    px = bytes(rgb)
    stride = width * 3
    raw = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        plain = bytearray(px * width)
        line = bytearray(plain)
        for i in range(stride):
            a = plain[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if filt == 1:
                line[i] = (plain[i] - a) & 0xFF
            elif filt == 2:
                line[i] = (plain[i] - b) & 0xFF
            elif filt == 3:
                line[i] = (plain[i] - (a + b) // 2) & 0xFF
            elif filt == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (plain[i] - pr) & 0xFF
        raw += bytes([filt]) + line
        prev = plain
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def synthetic_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    """Build a real RIFF/WAVE 16-bit PCM payload from raw sample values."""
    import array

    data = array.array("h", samples).tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


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
