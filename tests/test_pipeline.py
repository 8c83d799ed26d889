"""Tests for the LLM-pipeline operators (dedup, similarity, text,
multimodal plumbing)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dudb_spark.pipeline import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river shore"),
        (2, "a completely different document about spark query engines and scale"),
        (3, "the quick brown fox jumps over the lazy dog near the river bank"),
        (4, "der schnelle braune fuchs springt und die hunde sind nicht da"),
        (5, "el rapido zorro marron salta y los perros no estan en la casa"),
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_duplicates(docs):
    res = {
        r["canonical_id"]: r["n_copies"]
        for r in dedup.exact_duplicates(docs).collect()
    }
    assert res[0] == 2  # docs 0 and 3 identical
    assert res[1] == 1


def test_minhash_finds_near_dups(docs):
    cand = dedup.minhash_candidates(docs, num_perm=64, bands=32)
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand.collect()}
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # identical docs
    assert (0, 1) in pairs  # one-token difference
    ver = dedup.ngram_jaccard(docs, cand)
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ver.collect()}
    assert j[(0, 3)] == 1.0
    assert 0.5 < j[(0, 1)] < 1.0
    # unrelated docs should not be candidate-paired with high estimate
    assert pairs.get((0, 2), 0.0) < 0.3


def test_minhash_poly_hash_variant(docs):
    # the oracle-reproducible Horner-hash variant finds the same planted
    # structure as the xxhash64 sketch (hash values differ; semantics don't)
    cand = dedup.minhash_candidates(docs, num_perm=64, bands=32, hash_fn="poly")
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in cand.collect()}
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs
    assert pairs.get((0, 2), 0.0) < 0.3


def test_minhash_verified_pairs_matches_two_step(docs):
    # the fused candidates→verify pipeline (shingle once, Jaccard over the
    # hashed-shingle sets) returns the same pairs and values as the
    # two-step minhash_candidates + ngram_jaccard path — hashed-set
    # Jaccard equals string-shingle Jaccard absent 31-bit collisions
    fused = dedup.minhash_verified_pairs(
        docs, num_perm=64, bands=32, min_est=0.5, min_jaccard=0.0
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in fused.collect()}
    cand = dedup.minhash_candidates(
        docs, num_perm=64, bands=32, hash_fn="poly"
    ).where(F.col("est_jaccard") >= 0.5)
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard(docs, cand).collect()
    }
    assert got == want
    assert got[(0, 3)] == 1.0


def test_simhash_near_dups(docs):
    pairs = dedup.simhash_near_duplicates(docs, max_hamming=8)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get((0, 3)) == 0  # identical → distance 0
    assert (0, 1) in got  # near-identical → small distance
    assert (0, 2) not in got and (2, 4) not in got


def test_simhash_column_deterministic(docs):
    a = docs.select(dedup.simhash(F.col("text")).alias("s")).collect()
    b = docs.select(dedup.simhash(F.col("text")).alias("s")).collect()
    assert [r["s"] for r in a] == [r["s"] for r in b]


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]

    got = similarity.brute_force_topk(emb.where("vec_id != 0"), q, k=5).collect()

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    want = sorted(
        ((vid, round(cos(v, q), 6)) for vid, v in vecs.items() if vid != 0),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [(r["vec_id"], round(r["cosine"], 6)) for r in got] == [
        (v, pytest.approx(c, abs=2e-6)) for v, c in want
    ]


def test_lsh_topk_is_subset_with_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where("vec_id = 0").collect()[0]["embedding"]
    brute = [r["vec_id"] for r in similarity.brute_force_topk(
        emb.where("vec_id != 0"), q, k=10).collect()]
    approx = similarity.lsh_bucketed_topk(
        emb.where("vec_id != 0"), q, k=10, bits=8, max_hamming=2
    ).collect()
    ids = [r["vec_id"] for r in approx]
    assert len(ids) > 0
    # SRP with hamming-2 expansion should recover a decent chunk of top-10
    assert len(set(ids) & set(brute)) >= 3


def test_cosine_near_dup_pairs(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # construct one exact duplicate pair: copy vec 0 as id 9999
    dup = emb.where("vec_id = 0").select(
        F.lit(9999).cast("long").alias("vec_id"), "embedding", "label"
    )
    pairs = similarity.cosine_near_dup_pairs(
        emb.unionByName(dup), threshold=0.999
    ).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 9999 for r in pairs)


def test_text_annotate(spark, docs):
    ann = text.annotate(docs).collect()
    by_id = {r["doc_id"]: r for r in ann}
    assert by_id[0]["n_tokens"] == 13
    assert by_id[0]["lang_pred"] == "en"
    assert by_id[4]["lang_pred"] == "de"
    assert by_id[5]["lang_pred"] == "es"
    assert by_id[0]["fingerprint"] == by_id[3]["fingerprint"]
    assert 0 < by_id[0]["quality"] <= 1.0
    # ttr: doc 0 has 13 tokens, 'the' appears 3x → 11 distinct
    assert by_id[0]["ttr"] == round(11 / 13, 6)


def test_multimodal_plumbing(spark):
    media = multimodal.synthetic_media(spark, n=32)
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 32
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["feature"])
    # deterministic: same payload → same feature
    again = multimodal.extract_features(media, dim=8).collect()
    assert sorted(map(tuple, (r["feature"] for r in feats))) == sorted(
        map(tuple, (r["feature"] for r in again))
    )

    stats = multimodal.media_stats(media).collect()
    assert stats[0]["media_type"] == "image" and stats[0]["n_items"] == 32

    with pytest.raises(Exception, match="NotImplementedError|real media"):
        multimodal.extract_features(media, strict=True).collect()


def test_real_bmp_decode_roundtrip():
    """decode_bmp parses the actual pixel layout (BGR, bottom-up, padded
    rows) of a BMP built by synthetic_bmp — exact channel means back."""
    bmp = multimodal.synthetic_bmp(5, 3, (200, 100, 50))  # width 5: padded
    d = multimodal.decode_bmp(bmp)
    assert (d["width"], d["height"], d["n_channels"]) == (5, 3, 3)
    assert d["mean"] == [200.0, 100.0, 50.0]
    assert d["n_frames"] == 15


def test_real_wav_decode_roundtrip():
    import math

    samples = [0, 100, -100, 300, -300, 500]
    wav = multimodal.synthetic_wav(samples, rate=8000, channels=1)
    d = multimodal.decode_wav(wav)
    assert (d["sample_rate"], d["n_channels"], d["n_frames"]) == (8000, 1, 6)
    assert d["mean"] == [sum(samples) / 6]
    assert d["rms"] == math.sqrt(sum(s * s for s in samples) / 6)
    # stereo interleave: per-channel means split correctly
    st = multimodal.synthetic_wav([10, -20, 30, -40], rate=4000, channels=2)
    d2 = multimodal.decode_wav(st)
    assert d2["n_channels"] == 2 and d2["n_frames"] == 2
    assert d2["mean"] == [20.0, -30.0]


def test_decode_media_arrow_path(spark):
    """The real codecs through the distributed Arrow decode stage: BMP and
    WAV rows decode, unknown formats null-fill (or raise under strict)."""
    rows = [
        (0, bytearray(multimodal.synthetic_bmp(4, 2, (10, 20, 30))),
         ("image", "bmp", 4, 2, None, 0)),
        (1, bytearray(multimodal.synthetic_wav([1000, -1000] * 8)),
         ("audio", "wav", None, None, None, 0)),
        (2, bytearray(b"\x89PNG fake"), ("image", "png", None, None, None, 0)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert got[0]["width"] == 4 and got[0]["mean"] == [10.0, 20.0, 30.0]
    assert got[1]["sample_rate"] == 8000 and got[1]["n_frames"] == 16
    assert got[1]["rms"] == 1000.0
    # the fake PNG payload is corrupt: the real PNG decoder null-fills
    # it in non-strict mode rather than failing the batch
    assert got[2]["width"] is None and got[2]["format"] == "png"
    with pytest.raises(Exception, match="not a PNG|no real decoder"):
        multimodal.decode_media(media, strict=True).collect()


def test_real_png_decode_roundtrip():
    """decode_png inflates and unfilters a real PNG built by
    synthetic_png — every filter type (None/Sub/Up/Average/Paeth)
    reconstructs the exact channel means."""
    for filt in range(5):
        d = multimodal.decode_png(
            multimodal.synthetic_png(7, 5, (200, 30, 90), filt=filt)
        )
        assert (d["width"], d["height"], d["n_channels"]) == (7, 5, 3)
        assert d["mean"] == [200.0, 30.0, 90.0], filt
        assert d["n_frames"] == 35
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_png(b"nope")


def test_png_through_arrow_decode(spark):
    rows = [
        (0, bytearray(multimodal.synthetic_png(4, 2, (10, 20, 30), filt=4)),
         ("image", "png", 4, 2, None, 0)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = multimodal.decode_media(media).collect()[0]
    assert got["width"] == 4 and got["mean"] == [10.0, 20.0, 30.0]


def test_unfilter_vectorized_matches_python_kernel(monkeypatch):
    """The numpy unfilter paths (run-grouped accumulates + batched
    anti-diagonal wavefront) are bit-identical to the round-4 per-pixel
    kernel over random images: random sizes, channels, per-row filter
    types (all five), random pixel data, batched and single.  The
    compiled kernel is disabled so this keeps pinning the NUMPY paths
    (the dependency-free floor) even where gcc exists; the native
    kernel has its own pin below."""
    import random

    from dudb_spark.pipeline import png_native, unfilter as uf

    monkeypatch.setattr(png_native, "get_lib", lambda: None)
    rng = random.Random(20260814)
    for trial in range(80):
        n_img = rng.randint(1, 6)
        items = []
        for _ in range(n_img):
            w = rng.randint(1, 28)
            h = rng.randint(1, 18)
            ch = rng.choice([1, 3])
            stride = w * ch
            raw = bytearray()
            for _r in range(h):
                raw.append(rng.choice([0, 1, 2, 3, 4]))
                raw += bytes(rng.randint(0, 255) for _ in range(stride))
            items.append((bytes(raw), h, w, ch))
        got = uf.unfilter_batch(items)
        for (raw, h, w, ch), g in zip(items, got):
            ref = uf.unfilter_rows_py(raw, h, w, ch)
            for r in range(h):
                assert g[r].tobytes() == ref[r], (trial, r, h, w, ch)


def test_unfilter_wavefront_matches_python_kernel_above_threshold(
    monkeypatch,
):
    """Same pin, but with images LARGE enough to take the batched
    wavefront (unfilter_batch routes images below ~4k cells through the
    per-pixel kernel, so the small-image fuzz above never reaches it —
    this hid a round-6 bug where the uint8 diagonal pads made numpy pick
    wrapping uint8 loops for the Average sum and Paeth differences
    despite the int16 out= scratch).  Covers all-Paeth, all-Average,
    every-mix, multi-image shape groups, and degenerate 1-wide/1-tall
    shapes.  Native kernel disabled: this pins the numpy wavefront."""
    import random

    import numpy as np

    from dudb_spark.pipeline import png_native, unfilter as uf

    monkeypatch.setattr(png_native, "get_lib", lambda: None)

    def img(rng, h, w, ch, fchoices):
        stride = w * ch
        raw = bytearray()
        for _r in range(h):
            raw.append(rng.choice(fchoices))
            raw += bytes(rng.randint(0, 255) for _ in range(stride))
        return (bytes(raw), h, w, ch)

    rng = random.Random(20260815)
    batches = [
        # one large image per filter regime
        [img(rng, 80, 70, 1, [4])],
        [img(rng, 80, 70, 1, [3])],
        [img(rng, 64, 80, 3, [0, 1, 2, 3, 4])],
        # same-shape group (lockstep batch) + a second shape group
        [img(rng, 72, 60, 1, [3, 4]) for _ in range(3)]
        + [img(rng, 60, 72, 1, [0, 4]) for _ in range(2)],
        # degenerate extents
        [img(rng, 5000, 1, 1, [4]), img(rng, 1, 5000, 1, [4]),
         img(rng, 4200, 1, 3, [2, 3])],
    ]
    for bi, items in enumerate(batches):
        assert sum(h * w for _, h, w, _ in items) >= 4096  # wavefront path
        got = uf.unfilter_batch(items)
        for (raw, h, w, ch), g in zip(items, got):
            ref = uf.unfilter_rows_py(raw, h, w, ch)
            ref_arr = np.frombuffer(b"".join(ref), np.uint8).reshape(
                h, w * ch
            )
            assert np.array_equal(np.asarray(g), ref_arr), (bi, h, w, ch)


def test_png_native_matches_python_bit_exact():
    """The compiled unfilter kernel (png_native.py) is bit-identical to
    the per-pixel Python reference over the same fuzz matrix as the
    numpy pins: all five filters, mixed per-row, 1/3 channels, degenerate
    1-wide/1-tall shapes — exact integer work, so identity is by
    construction; this pin guards the transcription."""
    import random

    import numpy as np
    import pytest

    from dudb_spark.pipeline import png_native, unfilter as uf

    lib = png_native.get_lib()
    if lib is None:
        pytest.skip("no gcc / native kernel unavailable")
    rng = random.Random(20260816)
    shapes = [(rng.randint(1, 40), rng.randint(1, 40), rng.choice([1, 3]))
              for _ in range(60)]
    shapes += [(5000, 1, 1), (1, 5000, 1), (80, 70, 3)]
    for h, w, ch in shapes:
        stride = w * ch
        raw = bytearray()
        for _r in range(h):
            raw.append(rng.choice([0, 1, 2, 3, 4]))
            raw += bytes(rng.randint(0, 255) for _ in range(stride))
        got = png_native.unfilter_image(lib, bytes(raw), h, w, ch)
        ref = uf.unfilter_rows_py(bytes(raw), h, w, ch)
        ref_arr = np.frombuffer(b"".join(ref), np.uint8).reshape(h, stride)
        assert np.array_equal(got, ref_arr), (h, w, ch)
    # error taxonomy parity: a bad filter type raises the same ValueError
    bad = bytes([7]) + bytes(3)
    with pytest.raises(ValueError, match="bad PNG filter type 7"):
        png_native.unfilter_image(lib, bad, 1, 1, 3)


def test_decoders_match_python_kernels():
    """Full vectorized decoders == the round-4 Python kernels on random
    real payloads (exact integer folds on both sides)."""
    import random

    rng = random.Random(99)
    for _ in range(20):
        w, h = rng.randint(1, 20), rng.randint(1, 12)
        rgb = tuple(rng.randint(0, 255) for _ in range(3))
        png = multimodal.synthetic_png(w, h, rgb, filt=rng.randint(0, 4))
        assert multimodal.decode_png(png) == multimodal.decode_png_py(png)
        bmp = multimodal.synthetic_bmp(w, h, rgb)
        assert multimodal.decode_bmp(bmp) == multimodal.decode_bmp_py(bmp)
        n = rng.randint(1, 64)
        chn = rng.choice([1, 2, 3])
        wav = multimodal.synthetic_wav(
            [rng.randint(-32768, 32767) for _ in range(n)], channels=chn
        )
        assert multimodal.decode_wav(wav) == multimodal.decode_wav_py(wav)


def test_decode_jpeg_corrupt_raises():
    # JPEG decode is dependency-free (pipeline/jpeg.py); a truncated
    # bitstream must raise ValueError so non-strict decode_media
    # null-fills the row (the known-format corrupt path).
    with pytest.raises(ValueError):
        multimodal.decode_jpeg(b"\xff\xd8\xff\xe0fake")
    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal.decode_jpeg(b"nonsense")


def test_real_jpeg_decode_with_pillow():
    """Real JPEG round-trip through decode_payloads — runs only where
    Pillow is installed (the decode_media production route for JPEG);
    elsewhere it is SKIPPED, making the dependency boundary visible in
    the test report rather than silently untested."""
    if multimodal._PILImage is None:
        pytest.skip("Pillow not installed — JPEG decode unavailable")
    import io

    import numpy as np

    px = np.zeros((8, 8, 3), np.uint8)
    px[:, :, 0] = 200
    im = multimodal._PILImage.fromarray(px, "RGB")
    buf = io.BytesIO()
    im.save(buf, "JPEG", quality=95)
    out = multimodal.decode_payloads([(buf.getvalue(), "jpeg")])
    assert out[0]["format"] == "jpeg"
    assert (out[0]["width"], out[0]["height"]) == (8, 8)
    assert abs(out[0]["mean"][0] - 200) < 10  # lossy, near the fill


def test_pillow_decode_errors_null_fill(monkeypatch):
    """With Pillow present, a corrupt payload that reaches the Pillow
    decoders (valid JPEG magic, or an exotic PNG variant) must follow the
    same non-strict null-fill contract as the built-in codecs —
    UnidentifiedImageError subclasses OSError, which is in
    _DECODE_ERRORS, and the exotic-PNG fallback is wrapped."""

    class _Rejecting:
        @staticmethod
        def open(_buf):
            raise OSError("cannot identify image file")

    monkeypatch.setattr(multimodal, "_PILImage", _Rejecting)

    corrupt_jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    exotic_png = bytearray(multimodal.synthetic_png(4, 3, (9, 8, 7)))
    exotic_png[28] = 1  # IHDR interlace flag -> outside the built-in envelope

    out = multimodal.decode_payloads(
        [(corrupt_jpeg, "jpeg"), (bytes(exotic_png), "png")], strict=False
    )
    assert [r["format"] for r in out] == ["jpeg", "png"]
    assert all(r["width"] is None and r["mean"] is None for r in out)

    with pytest.raises(OSError):
        multimodal.decode_payloads([(bytes(exotic_png), "png")], strict=True)
    with pytest.raises(OSError):
        multimodal.decode_payloads([(corrupt_jpeg, "jpeg")], strict=True)


def test_corrupt_png_null_fills_not_fails(spark):
    """A valid-signature PNG with a corrupt IDAT stream (zlib.error) or a
    truncated inflate (short pixel data) must null-fill in non-strict
    mode — the documented contract — not fail the whole Arrow batch."""
    import struct as _struct
    import zlib as _zlib

    good = multimodal.synthetic_png(4, 3, (9, 8, 7), filt=2)

    # corrupt the IDAT body in place: find the chunk, flip bytes mid-stream
    pos = 8
    corrupt = bytearray(good)
    while pos + 8 <= len(good):
        (size,) = _struct.unpack_from(">I", good, pos)
        if good[pos + 4: pos + 8] == b"IDAT":
            for i in range(pos + 12, pos + 8 + size):
                corrupt[i] ^= 0xFF
            break
        pos += 12 + size
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        multimodal.decode_png(bytes(corrupt))

    # valid zlib stream but fewer inflated bytes than h*(stride+1)
    def chunk(ctype, body):
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    short = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(b"\x00" * 5))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated PNG"):
        multimodal.decode_png(short)

    # both payloads through the distributed path: null-fill, batch survives
    rows = [
        (0, bytearray(good), ("image", "png", 4, 3, None, 0)),
        (1, corrupt, ("image", "png", 4, 3, None, 0)),
        (2, bytearray(short), ("image", "png", 4, 3, None, 0)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.decode_media(media).collect()}
    assert got[0]["mean"] == [9.0, 8.0, 7.0]
    assert got[1]["width"] is None and got[1]["format"] == "png"
    assert got[2]["width"] is None and got[2]["format"] == "png"


def test_multimodal_resize_and_frames(spark):
    media = multimodal.synthetic_media(spark, n=8)
    resized = multimodal.resize_images(media, width=16, height=16).collect()
    assert len(resized) == 8
    assert all(r["meta"]["width"] == 16 and r["meta"]["height"] == 16 for r in resized)
    assert all(len(bytes(r["payload"])) == 32 for r in resized)  # 16*16/8
    # schema survives a round-trip through the same operator
    assert multimodal.resize_images(
        spark.createDataFrame(resized, multimodal.MEDIA_SCHEMA), 8, 8
    ).count() == 8

    # frame sampling: images have duration NULL -> exactly 1 frame each
    frames = multimodal.sample_frames(media, every_ms=40).collect()
    assert len(frames) == 8 and all(f["frame_idx"] == 0 for f in frames)
    # videos: duration 100ms / every 40ms -> 3 frames (t=0,40,80)
    vid = media.withColumn(
        "meta", F.col("meta").withField("duration_ms", F.lit(100).cast("long"))
    )
    vframes = multimodal.sample_frames(vid, every_ms=40).collect()
    assert len(vframes) == 24
    one = sorted(
        (f["frame_idx"], f["ts_ms"]) for f in vframes if f["media_id"] == 0
    )
    assert one == [(0, 0), (1, 40), (2, 80)]
    # deterministic, and distinct frames get distinct payloads
    p0 = {bytes(f["payload"]) for f in vframes if f["media_id"] == 0}
    assert len(p0) == 3


def _py_winnow(s: str, k: int = 5, window: int = 4):
    """Pure-Python restatement of the winnowing pipeline (oracle)."""
    norm = "".join(c for c in s.lower() if c.isascii() and (c.isalnum()))
    M, B = (1 << 31) - 1, 257
    if len(norm) < k:
        return []
    hashes = [
        sum(ord(norm[i + j]) * pow(B, k - 1 - j, M) for j in range(k)) % M
        for i in range(len(norm) - k + 1)
    ]
    end = max(len(hashes) - window + 1, 1)
    mins = [min(hashes[i : i + window]) for i in range(end)]
    return sorted(set(mins))


def test_winnow_matches_python_oracle(docs):
    rows = docs.select(
        "doc_id", text.winnow_fingerprints(F.col("text")).alias("fps")
    ).collect()
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows:
        assert r["fps"] == _py_winnow(raw[r["doc_id"]]), r["doc_id"]


def test_winnow_shared_substring_guarantee(spark):
    # winnowing theorem: a shared run of >= k + window - 1 normalized chars
    # must produce at least one shared fingerprint
    common = "identical stretch of text carried over verbatim"
    df = spark.createDataFrame(
        [(0, "prefix one " + common), (1, common + " suffix two")],
        ["doc_id", "text"],
    )
    fps = {
        r["doc_id"]: set(r["f"])
        for r in df.select(
            "doc_id", text.winnow_fingerprints(F.col("text")).alias("f")
        ).collect()
    }
    assert fps[0] & fps[1]


def test_fingerprint_overlap_pairs(docs):
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in dedup.fingerprint_overlap_pairs(docs, min_shared=2).collect()
    }
    # exact copies 0/3 share every fingerprint; near-dup 0/1 share most
    assert (0, 3) in got
    assert (0, 1) in got and (1, 3) in got
    n_fp0 = len(_py_winnow("the quick brown fox jumps over the lazy dog near the river bank"))
    assert got[(0, 3)] == n_fp0
    # unrelated docs don't pair
    assert not any(2 in p or 4 in p or 5 in p for p in got)


def test_language_id_ngram(spark, docs):
    got = {
        r["id"]: r["lang_pred"]
        for r in text.language_id_ngram_df(docs).collect()
    }
    assert got[0] == "en" and got[3] == "en"
    assert got[4] == "de"
    assert got[5] == "es"


def test_tfidf_top_terms_golden(spark):
    import math

    from dudb_spark.pipeline.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.rank): (r.term, r.tf, r.tfidf)
        for r in tfidf_top_terms(docs, top_k=2).collect()
    }
    idf = lambda df: math.log(4 / (1 + df)) + 1  # N=3, smoothed
    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert rows[(1, 1)] == ("apple", 2, round(2 * idf(1), 6))
    assert rows[(1, 2)] == ("banana", 1, round(1 * idf(2), 6))
    # doc 3: cherry tf=2 df=2 vs durian tf=1 df=1
    assert rows[(3, 1)][0] == (
        "cherry" if 2 * idf(2) > idf(1) else "durian"
    )


def test_incremental_dedup_matches_cross_shard_self_dedup(docs, tmp_path):
    """Incremental new-vs-history dedup must find EXACTLY the
    cross-shard subset of full self-dedup (same params, data below the
    bucket cap), and a band index persisted to parquet and reloaded
    must give the identical answer — the artifact contract."""
    new = docs.where("doc_id % 3 = 0")   # 0, 3
    old = docs.where("doc_id % 3 != 0")  # 1, 2, 4, 5
    inc = dedup.incremental_verified_pairs(
        new, old, num_perm=32, bands=16, min_est=0.3, min_jaccard=0.3
    )
    got = {(r["new_id"], r["old_id"]): (r["est_jaccard"], r["jaccard"])
           for r in inc.collect()}

    full = dedup.minhash_verified_pairs(
        docs, num_perm=32, bands=16, min_est=0.3, min_jaccard=0.3
    )
    want = {}
    for r in full.collect():
        a, b = r["id_a"], r["id_b"]
        if (a % 3 == 0) != (b % 3 == 0):  # straddles the shard split
            nid, oid = (a, b) if a % 3 == 0 else (b, a)
            want[(nid, oid)] = r["jaccard"]
    assert set(got) == set(want)
    for k, (_, jac) in got.items():
        assert jac == want[k]
    # 0↔1 near-dup and 0↔3 exact dup straddle this split via doc 3/0
    assert (0, 1) in got and (3, 1) in got

    # persisted index round-trip
    idx_dir = str(tmp_path / "band_index")
    dedup.minhash_band_index(
        old, num_perm=32, bands=16, hash_fn="poly"
    ).write.parquet(idx_dir)
    loaded = new.sparkSession.read.parquet(idx_dir)
    inc2 = dedup.incremental_verified_pairs(
        new, old, num_perm=32, bands=16, min_est=0.3, min_jaccard=0.3,
        index=loaded,
    )
    got2 = {(r["new_id"], r["old_id"]): (r["est_jaccard"], r["jaccard"])
            for r in inc2.collect()}
    assert got2 == got


def test_similarity_join_exact_equals_brute_force(spark):
    """The exact-recall contract: prefix-filtered output == all-pairs
    brute force at the same threshold, including boundary pairs — the
    guarantee LSH can't give.  Also pins the integer threshold
    arithmetic (a float ceil(0.7*10)=8 would shorten the prefix and
    drop a boundary pair)."""
    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i k"),   # high overlap with 0
        (2, "a b c d e f z y x w"),   # moderate overlap with 0/1
        (3, "q r s t u v w x y z"),
        (4, "a b c d e f g h i j"),   # exact dup of 0
        (5, "m n o p"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for t in (0.3, 0.5, 0.7, 1.0):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.similarity_join_exact(
                docs, threshold=t, shingle_k=2
            ).collect()
        }
        base = dedup.poly_shingle_base(docs, shingle_k=2)
        bf = {}
        rowsb = {r["id"]: set(r["base"]) for r in base.collect()}
        for a in rowsb:
            for b in rowsb:
                if a < b and rowsb[a] and rowsb[b]:
                    j = len(rowsb[a] & rowsb[b]) / len(rowsb[a] | rowsb[b])
                    # same rational comparison as the operator
                    if len(rowsb[a] & rowsb[b]) * 1_000_000 >= \
                            int(-(-t * 1_000_000 // 1)) * \
                            len(rowsb[a] | rowsb[b]):
                        bf[(a, b)] = round(j, 6)
        assert got == bf, (t, got, bf)
    # exact dup pair survives t=1.0
    assert (0, 4) in {
        (r["id_a"], r["id_b"])
        for r in dedup.similarity_join_exact(
            docs, threshold=1.0, shingle_k=2
        ).collect()
    }


def test_exact_join_length_filter_boundary(spark):
    """The r11 length filter (min·1e6 ≥ tn·max for Jaccard; nb·1e6 ≥
    tn·na for containment) is provably redundant with the verify —
    pin the EXACT boundary where the size ratio equals the threshold,
    the case an off-by-one (> instead of ≥, or a float threshold)
    would silently drop."""
    # A ⊂ B with |A| = 2 shingles, |B| = 4: J = 2/4 = 0.5 exactly,
    # and the length filter's min/max ratio is also exactly 0.5
    rows = [(0, "a b c"), (1, "a b c d e")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dedup.similarity_join_exact(
        docs, threshold=0.5, shingle_k=2
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [
        (0, 1, 0.5)
    ]
    # containment boundary: |B| = t·|A| exactly (B ⊂ A, |B|=2, |A|=4,
    # C(A,B) = |A∩B|/|A| = 2/4 = 0.5 at threshold 0.5)
    got_c = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_join_exact(
            docs, threshold=0.5, shingle_k=2
        ).collect()
    }
    assert got_c[(1, 0)] == 0.5  # the big doc half-contained in small
    assert got_c[(0, 1)] == 1.0  # the small doc fully contained


def test_exact_join_positional_filter_boundary(spark):
    """The r12 positional filter drops a pair only when EVERY shared
    prefix token's overlap upper bound min(pa,pb)+min(na−pa,nb−pb)
    falls below the required overlap.  Pin the boundary where the
    bound EQUALS the requirement for a qualifying pair (ub == O == α):
    an off-by-one (strict >, or 1-based positions fed to the 0-based
    formula) would silently drop a correct result — recall, not value,
    is what the filter can break, so the assert is exact membership.

    Construction: identical docs ⇒ every shared token has pa == pb,
    ub = min(p,p) + min(n−p, n−p) = n = O exactly, and J = 1 ≥ any t —
    the tightest possible bound at every matched position.  The
    near-boundary pair (J exactly = t with size-mismatched sets) rides
    the same corpus."""
    rows = [
        (0, "x y z w"),   # identical pair: ub == O at every position
        (1, "x y z w"),
        (2, "a b c"),     # J(2,3) = 2/4 = 0.5 exactly at t=0.5
        (3, "a b c d e"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.similarity_join_exact(
            docs, threshold=0.5, shingle_k=2
        ).collect()
    }
    assert got[(0, 1)] == 1.0
    assert got[(2, 3)] == 0.5
    assert len(got) == 2
    # containment: identical pair again bounds ub == O == |A|; the
    # subset pair (3 ⊃ 2) sits exactly at C = 0.5
    got_c = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dedup.containment_join_exact(
            docs, threshold=0.5, shingle_k=2
        ).collect()
    }
    assert got_c[(0, 1)] == 1.0 and got_c[(1, 0)] == 1.0
    assert got_c[(2, 3)] == 1.0 and got_c[(3, 2)] == 0.5


def test_entropy_scores_goldens(spark):
    """Known entropies: a one-symbol doc scores 0, a uniform 4-char doc
    ln(4), repetition sits below varied text, empty/NULL score 0."""
    import math

    rows = [
        (0, "aaaaaaaa"),
        (1, "abcd"),
        (2, "the the the the the the"),
        (3, "one two three four five six"),
        (4, ""),
        (5, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.entropy_scores(docs).collect()}
    assert got[0]["char_entropy"] == 0.0
    assert got[0]["token_entropy"] == 0.0  # a single distinct token
    assert abs(got[1]["char_entropy"] - math.log(4)) < 1e-6
    assert got[2]["token_entropy"] == 0.0  # 'the' repeated
    assert got[3]["token_entropy"] > 1.7  # 6 distinct tokens: ln 6
    assert got[2]["char_entropy"] < got[3]["char_entropy"]
    assert got[4]["char_entropy"] == 0.0 and got[4]["n_chars"] == 0
    assert got[5]["char_entropy"] == 0.0 and got[5]["n_chars"] == 0
    assert len(got) == 6  # empty/NULL docs kept, not dropped


def test_containment_join_exact_equals_brute_force(spark):
    """Exact recall for the DIRECTED containment join: prefix-filtered
    output == all-pairs brute force at every threshold, including the
    asymmetric case a short quote inside a long doc (containment ~1,
    Jaccard tiny) that the symmetric join misses."""
    rows = [
        (0, "a b c d"),                                  # short quote
        (1, "a b c d " + " ".join(f"w{i}" for i in range(40))),
        (2, "a b c d e f g h"),
        (3, "q r s t u v"),
        (4, "a b c d"),                                  # dup of 0
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    base = dedup.poly_shingle_base(docs, shingle_k=2)
    sets = {r["id"]: set(r["base"]) for r in base.collect()}
    for t in (0.4, 0.6, 0.8, 1.0):
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in dedup.containment_join_exact(
                docs, threshold=t, shingle_k=2
            ).collect()
        }
        tn = int(-(-t * 1_000_000 // 1))
        bf = {}
        for a in sets:
            for b in sets:
                if a != b and sets[a]:
                    inter = len(sets[a] & sets[b])
                    if inter * 1_000_000 >= tn * len(sets[a]):
                        bf[(a, b)] = round(inter / len(sets[a]), 6)
        assert got == bf, (t, got, bf)
    # the asymmetric pair: 0 contained in 1 at t=1.0, but never 1 in 0
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.containment_join_exact(
            docs, threshold=1.0, shingle_k=2
        ).collect()
    }
    assert (0, 1) in full and (1, 0) not in full
    assert (0, 4) in full and (4, 0) in full  # dups contain each other


def test_cross_containment_join_goldens(spark):
    """A benchmark snippet pasted inside a long training doc is found
    at containment 1.0; an unrelated snippet is not; ids are separate
    spaces (the colliding id 0 on both sides is NOT a self-pair)."""
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "zz yy xx ww vv")],
        ["doc_id", "text"])
    train = spark.createDataFrame(
        [(0, "noise words alpha beta gamma delta more noise tail"),
         (5, "completely different content here indeed")],
        ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in dedup.cross_containment_join(
               bench, train, threshold=0.9, shingle_k=2).collect()}
    assert got == {(0, 0): 1.0}

    # brute-force parity across thresholds
    ba = {r["id"]: set(r["base"]) for r in dedup.poly_shingle_base(
        bench, shingle_k=2).collect()}
    bb = {r["id"]: set(r["base"]) for r in dedup.poly_shingle_base(
        train, shingle_k=2).collect()}
    for t in (0.3, 0.6, 1.0):
        got = {(r["id_a"], r["id_b"]): r["containment"]
               for r in dedup.cross_containment_join(
                   bench, train, threshold=t, shingle_k=2).collect()}
        tn = int(-(-t * 1_000_000 // 1))
        bf = {}
        for a in ba:
            for b in bb:
                if ba[a]:
                    inter = len(ba[a] & bb[b])
                    if inter * 1_000_000 >= tn * len(ba[a]):
                        bf[(a, b)] = round(inter / len(ba[a]), 6)
        assert got == bf, (t, got, bf)


def test_frame_energy_goldens(spark):
    """Hand-checked windows over a real WAV payload: constant-4
    window sums 64*16, the planted zero window is silent, the
    trailing partial window keeps its true n_samples; a non-WAV
    payload yields no frames."""
    from dudb_spark.pipeline import multimodal as mm

    samples = [4] * 64 + [0] * 64 + [3] * 32   # 160 samples, frame=64
    rows = [
        (0, bytearray(mm.synthetic_wav(samples)),
         ("audio", "wav", None, None, None, 0)),
        (1, bytearray(b"not a wav at all"),
         ("audio", "wav", None, None, None, 0)),
    ]
    media = spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA)
    got = {(r["media_id"], r["frame_id"]): r
           for r in mm.frame_energy(media, frame=64).collect()}
    assert set(got) == {(0, 0), (0, 1), (0, 2)}
    w0, w1, w2 = got[(0, 0)], got[(0, 1)], got[(0, 2)]
    assert (w0["n_samples"], w0["sumsq"], w0["silent"]) == (64, 1024, False)
    assert w0["rms"] == 4.0
    assert (w1["sumsq"], w1["silent"]) == (0, True)
    assert (w2["n_samples"], w2["sumsq"]) == (32, 288)
    assert w2["rms"] == 3.0


def test_canonical_keep_quality_beats_min_id(spark):
    """A space-mangled copy at a SMALLER id loses to the clean
    original (quality argmax), while exact-identical copies fall back
    to the min id; singletons keep themselves."""
    rows = [
        (5, "alpha beta gamma delta epsilon zeta"),
        (-6, "alpha  beta  gamma  delta  epsilon  zeta"),  # mangled
        (7, "unique content here"),
        (8, "same exact words"),
        (9, "same exact words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in dedup.canonical_keep(df).collect()}
    assert got[5]["kept"] and got[-6]["canonical_id"] == 5
    assert not got[-6]["kept"]
    assert got[-6]["q_micro"] < got[5]["q_micro"]
    assert got[7]["kept"]
    assert got[8]["kept"] and got[9]["canonical_id"] == 8
