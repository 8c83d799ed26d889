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
# Real codecs: BMP (24-bit uncompressed), WAV (16-bit PCM), PNG
# (8-bit gray/RGB) and baseline JPEG decode with dependency-free
# kernels, so four genuine decoders exercise the Arrow decode path
# end-to-end without imaging/audio libraries.  PNG unfiltering (the
# only sequentially-dependent part) lives in pipeline/unfilter.py:
# run-grouped modular accumulates for None/Sub/Up rows, a batched
# anti-diagonal wavefront for Average/Paeth rows — bit-identical to the
# per-pixel kernel, which is kept below as *_py for fuzz oracles and
# the bench baseline.  JPEG lives in pipeline/jpeg.py (table-driven
# Huffman decode + batched numpy IDCT, libjpeg-cross-checked in tests).
# When Pillow is installed, exotic PNGs (16-bit, palette, interlaced)
# and out-of-envelope JPEGs (12-bit, arithmetic, CMYK; progressive is
# decoded natively since round 8) fall back to it; without it those
# stay behind the declared boundary.
# ---------------------------------------------------------------------------

import math
import struct
import zlib

import numpy as np

from dudb_spark.pipeline.unfilter import unfilter_batch, unfilter_rows_py

try:  # optional real-codec dependency (not in the test container)
    from PIL import Image as _PILImage
except ImportError:  # pragma: no cover - exercised only without Pillow
    _PILImage = None


def decode_bmp(payload: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP: dimensions + per-channel means
    over the real pixel array (bottom-up rows, BGR order, rows padded to
    4 bytes — the actual layout, not a digest).  The pixel fold is one
    numpy pass."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    if width < 0:
        raise ValueError("negative BMP width")
    n_rows = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    n_px = max(width * n_rows, 1)
    if width == 0 or n_rows == 0:
        sums = np.zeros(3, np.int64)
    else:
        need = n_rows * row_bytes
        region = payload[data_off: data_off + need]
        if len(region) < need:
            # tolerate only a missing final-row pad; anything shorter is
            # a truncated pixel array (null-fill path in decode_media)
            if len(region) < (n_rows - 1) * row_bytes + width * 3:
                raise ValueError("truncated BMP pixel array")
            region = region + b"\x00" * (need - len(region))
        px = np.frombuffer(region, np.uint8).reshape(n_rows, row_bytes)
        sums = _channel_sums(np.ascontiguousarray(px[:, : width * 3]), 3)
    return {
        "format": "bmp",
        "width": width,
        "height": n_rows,
        "n_channels": 3,
        "sample_rate": None,
        "n_frames": n_px,
        # stored BGR; report RGB
        "mean": [int(sums[2]) / n_px, int(sums[1]) / n_px, int(sums[0]) / n_px],
        "rms": None,
    }


def _parse_wav(payload: bytes):
    """(channels, rate, data bytes) from the RIFF chunk walk."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, data = 12, None, None, None
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
    return channels, rate, data


def decode_wav(payload: bytes) -> dict:
    """Decode a RIFF/WAVE 16-bit PCM payload: fmt chunk + interleaved
    samples, per-channel means and overall RMS from the real sample
    values — exact int64 numpy folds (bit-identical to the Python
    accumulation, both are exact integer sums)."""
    channels, rate, data = _parse_wav(payload)
    samples = np.frombuffer(data[: len(data) // 2 * 2], "<i2").astype(np.int64)
    n_samp = samples.shape[0]
    n_frames = n_samp // channels
    ch_sums = np.zeros(channels, np.int64)
    full = samples[: n_frames * channels].reshape(n_frames, channels)
    ch_sums += full.sum(axis=0, dtype=np.int64)
    rem = samples[n_frames * channels:]
    ch_sums[: rem.shape[0]] += rem  # trailing partial frame -> channels 0..k
    sq = int(samples @ samples)
    return {
        "format": "wav",
        "width": None,
        "height": None,
        "n_channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "mean": [int(c) / max(n_frames, 1) for c in ch_sums],
        "rms": math.sqrt(sq / max(n_samp, 1)),
    }


def _parse_png(payload: bytes):
    """(inflated scanline stream, h, w, ch) from the chunk walk — shared
    by the single and batched decode paths.  Raises ValueError for
    non-PNG, unsupported, corrupt, or truncated payloads."""
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
                if _PILImage is not None:
                    return None  # caller falls back to Pillow
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
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError(
            f"truncated PNG: {len(raw)} inflated bytes < {h * (stride + 1)}"
        )
    return raw, h, w, ch


def _channel_sums(px: "np.ndarray", ch: int) -> "np.ndarray":
    """Per-channel int64 sums of a (n, ch)-shaped uint8 pixel view.
    One strided .sum() per channel: numpy's axis=0 reduction over a
    long-by-ch array is ~7× slower than ch independent column sums."""
    if not px.size:
        return np.zeros(ch, np.int64)
    flat = px.reshape(-1, ch)
    return np.array(
        [flat[:, i].sum(dtype=np.int64) for i in range(ch)], np.int64
    )


def _png_result(recon: "np.ndarray", h: int, w: int, ch: int) -> dict:
    n_px = max(w * h, 1)
    sums = _channel_sums(recon, ch)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "n_channels": ch,
        "sample_rate": None,
        "n_frames": w * h,
        "mean": [int(s) / n_px for s in sums],
        "rms": None,
    }


def decode_png(payload: bytes) -> dict:
    """Decode a non-interlaced 8-bit PNG (grayscale or RGB): chunk walk,
    zlib inflate, vectorized scanline unfiltering (pipeline/unfilter.py)
    — per-channel means computed over the real pixel array.  With Pillow
    installed, PNG variants outside that envelope fall back to it."""
    parsed = _parse_png(payload)
    if parsed is None:  # unsupported variant, Pillow available
        return _decode_image_pil(payload, "png")
    raw, h, w, ch = parsed
    recon = unfilter_batch([(raw, h, w, ch)])[0]
    return _png_result(recon, h, w, ch)


def _decode_image_pil(payload: bytes, fmt: str) -> dict:
    """Pillow-backed decode (JPEG, exotic PNGs): C-speed pixel work, same
    result contract as the pure decoders."""
    import io

    im = _PILImage.open(io.BytesIO(payload))
    im.load()
    if im.mode not in ("RGB", "L"):
        im = im.convert("RGB")
    a = np.asarray(im)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    n_px = max(w * h, 1)
    sums = _channel_sums(np.ascontiguousarray(a), ch)
    return {
        "format": fmt,
        "width": w,
        "height": h,
        "n_channels": ch,
        "sample_rate": None,
        "n_frames": w * h,
        "mean": [int(s) / n_px for s in sums],
        "rms": None,
    }


def decode_jpeg(payload: bytes) -> dict:
    """Decode a sequential (SOF0/SOF1) or progressive (SOF2) Huffman
    JPEG with the dependency-free codec (pipeline/jpeg.py: table-driven
    entropy decode + batched numpy IDCT, coefficient-exact against
    libjpeg in tests for both coding processes).  Variants outside that
    envelope (12-bit, arithmetic, CMYK) fall back to Pillow when
    installed; otherwise the ValueError propagates and non-strict
    decode_media null-fills the row."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    from dudb_spark.pipeline.jpeg import decode_jpeg_pixels

    try:
        a = decode_jpeg_pixels(payload)
    except ValueError:
        if _PILImage is None:
            raise
        return _decode_image_pil(payload, "jpeg")
    h, w, ch = a.shape
    n_px = max(w * h, 1)
    sums = _channel_sums(np.ascontiguousarray(a), ch)
    return {
        "format": "jpeg",
        "width": w,
        "height": h,
        "n_channels": ch,
        "sample_rate": None,
        "n_frames": w * h,
        "mean": [int(s) / n_px for s in sums],
        "rms": None,
    }


# --- round-4 per-pixel kernels: kept as bit-exactness oracles for the
# vectorized paths (fuzz-pinned in tests) and as the bench's r4
# throughput baseline.  Not used in the decode hot path. ---


def decode_png_py(payload: bytes) -> dict:
    parsed = _parse_png(payload)
    if parsed is None:
        raise ValueError("unsupported PNG for the pure-Python kernel")
    raw, h, w, ch = parsed
    stride = w * ch
    sums = [0] * ch
    for line in unfilter_rows_py(raw, h, w, ch):
        for i in range(stride):
            sums[i % ch] += line[i]
    n_px = max(w * h, 1)
    out = _png_result(np.zeros((0, max(stride, 1)), np.uint8), h, w, ch)
    out["mean"] = [s / n_px for s in sums]
    return out


def decode_bmp_py(payload: bytes) -> dict:
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
    sums = [0, 0, 0]
    for r in range(n_rows):
        base = data_off + r * row_bytes
        row = payload[base: base + width * 3]
        sums[0] += sum(row[0::3])
        sums[1] += sum(row[1::3])
        sums[2] += sum(row[2::3])
    n_px = max(width * n_rows, 1)
    return {
        "format": "bmp", "width": width, "height": n_rows, "n_channels": 3,
        "sample_rate": None, "n_frames": n_px,
        "mean": [sums[2] / n_px, sums[1] / n_px, sums[0] / n_px], "rms": None,
    }


def decode_wav_py(payload: bytes) -> dict:
    import array

    channels, rate, data = _parse_wav(payload)
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
        "format": "wav", "width": None, "height": None,
        "n_channels": channels, "sample_rate": rate, "n_frames": n_frames,
        "mean": [c / max(n_frames, 1) for c in ch_sums],
        "rms": math.sqrt(sq / n),
    }


_DECODERS = {
    "bmp": decode_bmp,
    "wav": decode_wav,
    "png": decode_png,
    "jpeg": decode_jpeg,
    "jpg": decode_jpeg,
}

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


# OSError covers Pillow's decode failures (UnidentifiedImageError
# subclasses it): payloads are in-memory bytes, so an OSError here can
# only come from the image decoder, never from real file I/O.
_DECODE_ERRORS = (ValueError, IndexError, struct.error, zlib.error, OSError)

_BLANK_DECODED = {
    "media_id": None, "format": None, "width": None, "height": None,
    "n_channels": None, "sample_rate": None, "n_frames": None,
    "mean": None, "rms": None,
}


def decode_payloads(
    items: list[tuple[bytes, str]], strict: bool = False
) -> list[dict]:
    """Decode a batch of (payload, format) pairs — the exact per-batch
    logic of :func:`decode_media`, callable outside Spark (bench, CLI).
    All PNGs in the batch share one wavefront unfilter; corrupt or
    unknown payloads null-fill (or raise under ``strict``)."""
    out: list[dict] = []
    png_slots: list[int] = []
    png_parsed: list[tuple] = []
    for p, fmt in items:
        fmtl = (fmt or "").lower()
        dec = _DECODERS.get(fmtl)
        if dec is None:
            if strict:
                raise NotImplementedError(
                    f"no real decoder for format {fmt!r}; BMP/WAV/PNG/"
                    "JPEG are built in, others need imaging/audio libs"
                )
            out.append(dict(_BLANK_DECODED, format=fmt))
            continue
        if fmtl == "png":
            try:
                parsed = _parse_png(bytes(p))
            except _DECODE_ERRORS:
                # corrupt/truncated container: null-fill, don't fail the
                # batch (zlib.error/IndexError/struct.error cover garbage
                # past the signature check)
                if strict:
                    raise
                out.append(dict(_BLANK_DECODED, format=fmt))
                continue
            if parsed is None:  # exotic variant -> Pillow
                try:
                    out.append(
                        dict(
                            _BLANK_DECODED,
                            **_decode_image_pil(bytes(p), "png"),
                        )
                    )
                except _DECODE_ERRORS:
                    # Pillow rejected it (corrupt interlace/palette data
                    # past the signature): same null-fill contract as the
                    # built-in path
                    if strict:
                        raise
                    out.append(dict(_BLANK_DECODED, format=fmt))
                continue
            png_slots.append(len(out))
            png_parsed.append(parsed)
            out.append(dict(_BLANK_DECODED, format=fmt))
            continue
        try:
            out.append(dict(_BLANK_DECODED, **dec(bytes(p))))
        except _DECODE_ERRORS:
            if strict:
                raise
            out.append(dict(_BLANK_DECODED, format=fmt))
    if png_parsed:
        try:
            recons = unfilter_batch(png_parsed)
        except _DECODE_ERRORS:
            if strict:
                raise
            # a bad filter byte poisons the shared batch: redo one-by-one
            # so only the bad payloads null-fill
            recons = []
            for item in png_parsed:
                try:
                    recons.append(unfilter_batch([item])[0])
                except _DECODE_ERRORS:
                    recons.append(None)
        for slot, item, rec in zip(png_slots, png_parsed, recons):
            if rec is not None:
                _, h, w, ch = item
                out[slot].update(_png_result(rec, h, w, ch))
    return out


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched real decode: BMP/WAV/PNG/JPEG payloads are parsed
    with the vectorized codecs above;
    other formats yield a null-typed row (or raise under ``strict=True``,
    marking where PIL/ffmpeg would plug in).  Same plumbing contract as
    :func:`extract_features` — only (media_id, payload, format) cross
    the JVM↔Python boundary.

    All PNG payloads in an Arrow batch share ONE batched wavefront
    unfilter (pipeline/unfilter.py), so the sequential-filter work is
    amortized across the whole batch — per-batch columnar decode, the
    shape that holds at 100 TB."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = decode_payloads(
                list(zip(pdf["payload"], pdf["fmt"])), strict=strict
            )
            for row, mid in zip(rows, pdf["media_id"]):
                row["media_id"] = mid
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
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


def synthetic_png_content(
    width: int, height: int, pixels, heuristic: bool = True
) -> bytes:
    """Build a real 8-bit RGB PNG from explicit pixel content
    (``pixels``: (height, width*3) uint8 array-like), with the per-row
    filter chosen by the libpng minimum-sum-of-absolute-differences
    heuristic — so tests and the decode bench see the filter mix a real
    encoder emits (mostly Sub/Up on smooth content, Average/Paeth on
    photographic content).  ``heuristic=False`` emits filter None rows.

    Unlike decoding, ENCODING has no sequential dependency (residuals
    are computed from plain values), so all five candidate filters
    vectorize directly."""

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ch = 3
    stride = width * ch
    plain = np.ascontiguousarray(pixels, dtype=np.uint8).reshape(height, stride)
    raw = bytearray()
    if not heuristic:
        for r in range(height):
            raw += b"\x00" + plain[r].tobytes()
    else:
        p16 = plain.astype(np.int16)
        left = np.zeros_like(p16)
        left[:, ch:] = p16[:, :-ch]
        up = np.zeros_like(p16)
        up[1:] = p16[:-1]
        ul = np.zeros_like(p16)
        ul[1:, ch:] = p16[:-1, :-ch]
        pp = left + up - ul
        pa = np.abs(pp - left)
        pb = np.abs(pp - up)
        pc = np.abs(pp - ul)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        cands = [
            p16,
            (p16 - left) & 0xFF,
            (p16 - up) & 0xFF,
            (p16 - ((left + up) >> 1)) & 0xFF,
            (p16 - paeth) & 0xFF,
        ]
        # MSAD cost treats residual bytes as signed magnitudes
        costs = np.stack(
            [np.minimum(c, 256 - c).sum(axis=1, dtype=np.int64) for c in cands]
        )  # (5, height); argmin ties -> lower filter id, like libpng
        pick = np.argmin(costs, axis=0)
        for r in range(height):
            f = int(pick[r])
            raw += bytes([f]) + cands[f][r].astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
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


FRAME_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_id", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sumsq", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("silent", T.BooleanType()),
    ]
)


def frame_energy(
    media: DataFrame,
    frame: int = 160,
    silence_sumsq: int = 0,
) -> DataFrame:
    """Frame-level audio energy over REAL WAV payloads — the
    voice-activity / silence-detection primitive of an audio curation
    pipeline (trim silence, drop dead segments, window speech for an
    ASR tokenizer): the interleaved 16-bit PCM stream splits into
    ``frame``-sample windows, each scored by its exact int64 sum of
    squares; ``silent`` is the INTEGER comparison
    ``sumsq <= silence_sumsq``, so the flag is engine-exact by
    construction and rms (sqrt(sumsq/n), rounded 6) is the only
    floating step — formed in the same op order as the SQL
    restatement.

    Same Arrow plumbing contract as :func:`decode_media`: only
    (media_id, payload) cross the JVM↔Python boundary, numpy does the
    windowed integer folds per batch.  Non-WAV or malformed payloads
    yield no frames (the decode family's null-row convention, here
    row-less because output is per-frame).  Trailing partial windows
    keep their true ``n_samples``."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, ns, sq = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    _ch, _rate, data = _parse_wav(bytes(payload))
                except Exception:
                    continue
                samples = np.frombuffer(
                    data[: len(data) // 2 * 2], "<i2"
                ).astype(np.int64)
                for w in range(0, max(len(samples), 1), frame):
                    win = samples[w:w + frame]
                    if win.size == 0:
                        continue
                    ids.append(int(mid))
                    fids.append(w // frame)
                    ns.append(int(win.size))
                    sq.append(int(win @ win))
            ids_a = np.asarray(ids, np.int64)
            ns_a = np.asarray(ns, np.int64)
            sq_a = np.asarray(sq, np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids_a,
                    "frame_id": np.asarray(fids, np.int32),
                    "n_samples": ns_a.astype(np.int32),
                    "sumsq": sq_a,
                    "rms": np.round(
                        np.sqrt(sq_a / np.maximum(ns_a, 1)), 6
                    ),
                    "silent": sq_a <= silence_sumsq,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=FRAME_ENERGY_SCHEMA
    )
