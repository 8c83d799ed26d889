"""Dependency-free baseline JPEG codec (pipeline/jpeg.py).

Three independent anchors keep the codec honest without Pillow:
1. entropy coding is lossless, so the decoder must recover the
   encoder's quantized coefficients BIT-EXACTLY;
2. the batched IDCT is pinned against a literal per-element spec
   transcription (T.81 A.3.3 double-precision sum);
3. when gcc + libjpeg headers exist (they do in this container), a
   compiled C harness decodes our encoder's streams with libjpeg —
   a fully independent implementation — and pixel values must agree
   within IDCT rounding tolerance.
"""

import os
import shutil
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from dudb_spark.pipeline import jpeg


def _rng():
    return np.random.default_rng(20260815)


# ---------------------------------------------------------------------------
# 1. coefficient-exact roundtrip
# ---------------------------------------------------------------------------

def test_gray_coefficients_roundtrip_exact():
    img = _rng().integers(0, 256, (37, 53), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img)
    comps, H, W, qtables = jpeg._decode_coefficients(payload)
    assert (H, W) == (37, 53)
    qz = jpeg._QUANT_LUMA.ravel()[jpeg.ZIGZAG].astype(np.int32)
    expect = jpeg._quantize_blocks(img, qz)
    assert np.array_equal(comps[0].coeffs, expect)
    # stream carries the quant table it used
    assert np.array_equal(qtables[comps[0].tq], qz)


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("restart", [0, 3])
def test_color_roundtrip_shape_and_smoothness(sub, restart):
    """Color roundtrips decode to the right shape, and a smooth gradient
    survives quantization nearly exactly (max error bounded by the
    quant step, not by a decode bug)."""
    rng = _rng()
    h, w = 45, 61
    base = np.add.outer(np.arange(h) * 2, np.arange(w)).astype(np.float64)
    img = np.stack(
        [(base + 40 * i) % 256 for i in range(3)], axis=2
    ).astype(np.uint8)
    payload = jpeg.encode_jpeg(img, subsample=sub, restart=restart)
    px = jpeg.decode_jpeg_pixels(payload)
    assert px.shape == (h, w, 3)
    err = np.abs(px.astype(int) - img.astype(int))
    # 444 keeps chroma; subsampled modes average 2x1 / 2x2 chroma boxes
    # of a gradient, which costs a few more levels at wrap boundaries
    assert err.mean() < (3.0 if sub == "444" else 8.0), (sub, err.mean())
    # interior pixels away from the %256 wrap seams stay tight
    assert np.median(err) <= 2.0, (sub, restart)
    rng.shuffle(img.reshape(-1, 3))  # noise payload still decodes
    assert jpeg.decode_jpeg_pixels(
        jpeg.encode_jpeg(img, subsample=sub, restart=restart)
    ).shape == (h, w, 3)


def test_restart_interval_resets_predictors():
    """The same image with and without restart markers must decode to
    identical pixels (predictor resets are pure bookkeeping)."""
    img = _rng().integers(0, 256, (33, 41, 3), dtype=np.uint8)
    a = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(img, subsample="420"))
    b = jpeg.decode_jpeg_pixels(
        jpeg.encode_jpeg(img, subsample="420", restart=2)
    )
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# 2. IDCT pinned to the spec formula
# ---------------------------------------------------------------------------

def test_idct_matches_spec_transcription():
    """_reconstruct_plane's tensordot IDCT == the literal T.81 A.3.3
    double sum, per element, on random coefficient blocks."""
    rng = _rng()
    coeffs = rng.integers(-60, 60, (3, 8, 8)).astype(np.float64)

    def spec_idct(F):
        out = np.empty((8, 8))
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / np.sqrt(2) if u == 0 else 1.0
                        cv = 1 / np.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * F[u, v]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                out[x, y] = s / 4.0
        return out

    got = np.tensordot(
        np.tensordot(coeffs, jpeg._BASIS, axes=([1], [0])), jpeg._BASIS,
        axes=([1], [0]),
    )
    for i in range(3):
        assert np.allclose(got[i], spec_idct(coeffs[i]), atol=1e-9)


def test_zigzag_is_the_standard_order():
    # the canonical constant, spelled out (not generated) as the pin
    expect = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(jpeg.ZIGZAG) == expect


# ---------------------------------------------------------------------------
# 3. libjpeg cross-check (independent implementation)
# ---------------------------------------------------------------------------

_HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <jpeglib.h>
int main(void) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.do_fancy_upsampling = FALSE;  /* match nearest-replication */
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height,
        ch = cinfo.output_components;
    printf("%d %d %d\n", w, h, ch);
    fflush(stdout);
    JSAMPARRAY buf = (*cinfo.mem->alloc_sarray)(
        (j_common_ptr)&cinfo, JPOOL_IMAGE, w * ch, 1);
    while (cinfo.output_scanline < cinfo.output_height) {
        jpeg_read_scanlines(&cinfo, buf, 1);
        fwrite(buf[0], 1, (size_t)(w * ch), stdout);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 0;
}
"""

_HARNESS_BIN = None


def _libjpeg_harness():
    """Compile the harness once per session; None when gcc/libjpeg are
    unavailable (the test skips)."""
    global _HARNESS_BIN
    if _HARNESS_BIN is not None:
        return _HARNESS_BIN or None
    if not (shutil.which("gcc") and os.path.exists("/usr/include/jpeglib.h")):
        _HARNESS_BIN = ""
        return None
    d = tempfile.mkdtemp(prefix="jpegharness_")
    src = os.path.join(d, "dec.c")
    binp = os.path.join(d, "dec")
    with open(src, "w") as f:
        f.write(_HARNESS_C)
    r = subprocess.run(
        ["gcc", "-O2", "-o", binp, src, "-ljpeg"],
        capture_output=True, text=True,
    )
    _HARNESS_BIN = binp if r.returncode == 0 else ""
    return _HARNESS_BIN or None


def _libjpeg_decode(payload: bytes):
    binp = _libjpeg_harness()
    r = subprocess.run([binp], input=payload, capture_output=True)
    assert r.returncode == 0, r.stderr[-400:]
    head, _, rest = r.stdout.partition(b"\n")
    w, h, ch = map(int, head.split())
    a = np.frombuffer(rest, np.uint8)
    assert a.size == w * h * ch, (w, h, ch, a.size)
    return a.reshape(h, w, ch)


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_encoder_streams_decode_identically_under_libjpeg(sub):
    """Our encoder's streams are spec-valid: libjpeg (independent C
    implementation) accepts them and reconstructs the same pixels as
    our decoder, within IDCT/rounding tolerance (libjpeg's ISLOW is a
    fixed-point approximation; ours is exact double)."""
    if _libjpeg_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, subsample=sub)
    ref = _libjpeg_decode(payload)
    got = jpeg.decode_jpeg_pixels(payload)
    assert ref.shape == got.shape == (40, 56, 3)
    diff = np.abs(ref.astype(int) - got.astype(int))
    if sub == "444":
        # no upsampling in play: pure IDCT + color-convert rounding
        assert diff.max() <= 2, diff.max()
    else:
        # replication upsample matches do_fancy_upsampling=FALSE; allow
        # one extra level for the chained chroma rounding
        assert diff.max() <= 3, (sub, diff.max())
    assert diff.mean() < 0.5, (sub, diff.mean())


def test_gray_and_restart_streams_under_libjpeg():
    if _libjpeg_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    gray = rng.integers(0, 256, (29, 35), dtype=np.uint8)
    ref = _libjpeg_decode(jpeg.encode_jpeg(gray))
    got = jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(gray))
    assert ref.shape == got.shape == (29, 35, 1)
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 1
    color = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    p = jpeg.encode_jpeg(color, subsample="420", restart=2)
    ref = _libjpeg_decode(p)
    got = jpeg.decode_jpeg_pixels(p)
    assert np.abs(ref.astype(int) - got.astype(int)).max() <= 3


# ---------------------------------------------------------------------------
# 4. error boundaries
# ---------------------------------------------------------------------------

def test_rejects_non_jpeg_truncated_and_progressive():
    img = _rng().integers(0, 256, (16, 16), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(payload[:40])
    # entropy data cut off mid-scan
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(payload[:-20])
    # flip SOF0 -> SOF2: the stream claims progressive but carries a
    # baseline SOS header (Se=63 on what is now a DC scan) — rejected
    # as malformed, not misdecoded
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive DC scan"):
        jpeg.decode_jpeg_pixels(prog)
    # arithmetic coding (SOF9) stays a declared boundary
    arith = payload.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(ValueError, match="coding process"):
        jpeg.decode_jpeg_pixels(arith)


def test_decode_jpeg_dict_contract_and_null_fill():
    """multimodal.decode_jpeg returns the shared decoder dict, and a
    corrupt payload null-fills through decode_payloads like the other
    codecs."""
    from dudb_spark.pipeline import multimodal as mm

    img = _rng().integers(0, 256, (20, 24, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, subsample="420")
    d = mm.decode_jpeg(payload)
    assert d["format"] == "jpeg" and (d["width"], d["height"]) == (24, 20)
    assert d["n_channels"] == 3 and len(d["mean"]) == 3
    px = jpeg.decode_jpeg_pixels(payload).astype(np.float64)
    for c in range(3):
        assert abs(d["mean"][c] - px[:, :, c].mean()) < 1e-9
    rows = mm.decode_payloads(
        [(payload, "jpeg"), (payload[:50], "jpeg"), (b"junk", "jpeg")]
    )
    assert rows[0]["width"] == 24
    assert rows[1]["width"] is None and rows[2]["width"] is None
    with pytest.raises(Exception):
        mm.decode_payloads([(b"junk", "jpeg")], strict=True)


def test_decode_media_handles_jpeg_rows(spark):
    """The Arrow decode path carries JPEG rows end-to-end (plumbing +
    codec in one pass through mapInPandas)."""
    from dudb_spark.pipeline import multimodal as mm

    img = _rng().integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img)

    def meta(p):
        return {
            "media_type": "image", "format": "jpeg", "width": None,
            "height": None, "duration_ms": None, "n_bytes": len(p),
        }

    bad = b"\xff\xd8\xffgarbage"
    rows = [
        (1, bytearray(payload), meta(payload)),
        (2, bytearray(bad), meta(bad)),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert got[1]["width"] == 16 and got[1]["format"] == "jpeg"
    assert got[2]["width"] is None


def test_native_entropy_matches_python_bit_exact():
    """The compiled entropy kernel (pipeline/jpeg_native.py) and the
    pure-Python loop must produce IDENTICAL pixels — same LUTs, same
    refill discipline, transcribed line-for-line — across gray/444/420,
    restart intervals, and odd dims.  Skips where gcc is unavailable
    (the fallback then IS the only path)."""
    import os

    import numpy as np
    import pytest

    from dudb_spark.pipeline import jpeg_native
    from dudb_spark.pipeline.jpeg import decode_jpeg_pixels, encode_jpeg

    if jpeg_native.get_lib() is None:
        pytest.skip("no gcc: pure-Python path is the only path")

    def both(payload):
        a = decode_jpeg_pixels(payload)
        os.environ["DUDB_JPEG_NO_NATIVE"] = "1"
        jpeg_native._lib_tried = False
        jpeg_native._lib = None
        try:
            b = decode_jpeg_pixels(payload)
        finally:
            del os.environ["DUDB_JPEG_NO_NATIVE"]
            jpeg_native._lib_tried = False
            jpeg_native._lib = None
        return a, b

    rng = np.random.default_rng(7)
    cases = []
    for t in range(18):
        h, w = int(rng.integers(8, 70)), int(rng.integers(8, 70))
        if t % 3 == 0:
            img, kw = rng.integers(0, 256, (h, w)).astype(np.uint8), {}
        else:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            kw = {"subsample": "444" if t % 2 else "420"}
        if t % 4 == 0:
            kw["restart"] = int(rng.integers(1, 5))
        cases.append(encode_jpeg(img, **kw))
    for p in cases:
        a, b = both(p)
        assert np.array_equal(a, b)

    # error taxonomy matches on truncation too
    trunc = cases[0][: len(cases[0]) - 40]
    with pytest.raises(ValueError):
        decode_jpeg_pixels(trunc)

# ---------------------------------------------------------------------------
# 5. progressive (SOF2) decode: libjpeg-encoded fixtures, coefficient-exact
# ---------------------------------------------------------------------------

# Encodes raw input progressively (jpeg_simple_progression: covers all
# four scan classes — interleaved DC first, per-component AC first bands,
# DC refinement, AC refinement) or dumps any stream's quantized
# coefficients via jpeg_read_coefficients — an integer-domain anchor
# immune to IDCT rounding differences.
_PROG_HARNESS_C = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void encode(int w, int h, int ch, const char *sub, int restart,
                   int prog) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, stdout);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = ch;
    cinfo.in_color_space = ch == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, 85, TRUE);
    if (ch == 3) {
        int hs = 1, vs = 1;
        if (!strcmp(sub, "422")) hs = 2;
        if (!strcmp(sub, "420")) { hs = 2; vs = 2; }
        cinfo.comp_info[0].h_samp_factor = hs;
        cinfo.comp_info[0].v_samp_factor = vs;
        cinfo.comp_info[1].h_samp_factor = 1;
        cinfo.comp_info[1].v_samp_factor = 1;
        cinfo.comp_info[2].h_samp_factor = 1;
        cinfo.comp_info[2].v_samp_factor = 1;
    }
    static jpeg_scan_info seqscans[3];
    if (prog) {
        jpeg_simple_progression(&cinfo);
    } else {
        /* non-interleaved SEQUENTIAL: one full-band scan per component
           (T.81 A.2) — the rare-but-legal layout some encoders emit */
        for (int i = 0; i < ch; i++) {
            seqscans[i].comps_in_scan = 1;
            seqscans[i].component_index[0] = i;
            seqscans[i].Ss = 0; seqscans[i].Se = 63;
            seqscans[i].Ah = 0; seqscans[i].Al = 0;
        }
        cinfo.scan_info = seqscans;
        cinfo.num_scans = ch;
    }
    cinfo.restart_interval = restart;
    jpeg_start_compress(&cinfo, TRUE);
    size_t stride = (size_t)w * ch;
    unsigned char *row = malloc(stride);
    while (cinfo.next_scanline < cinfo.image_height) {
        if (fread(row, 1, stride, stdin) != stride) { exit(3); }
        JSAMPROW rp = row;
        jpeg_write_scanlines(&cinfo, &rp, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
}

static void coefs(void) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, stdin);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr *arrays = jpeg_read_coefficients(&cinfo);
    printf("%d\n", cinfo.num_components);
    for (int ci = 0; ci < cinfo.num_components; ci++) {
        jpeg_component_info *comp = cinfo.comp_info + ci;
        int wb = comp->width_in_blocks, hb = comp->height_in_blocks;
        printf("%d %d\n", wb, hb);
        fflush(stdout);
        for (int br = 0; br < hb; br++) {
            JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, arrays[ci], br, 1, FALSE);
            /* libjpeg stores blocks in NATURAL (raster) order */
            fwrite(rows[0], sizeof(JCOEF), (size_t)wb * DCTSIZE2, stdout);
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
}

int main(int argc, char **argv) {
    if (argc >= 2 && !strcmp(argv[1], "coef")) { coefs(); return 0; }
    if (argc >= 7) {
        encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]), argv[5],
               atoi(argv[6]), argc > 7 ? atoi(argv[7]) : 1);
        return 0;
    }
    return 2;
}
"""

_PROG_BIN = None


def _prog_harness():
    global _PROG_BIN
    if _PROG_BIN is not None:
        return _PROG_BIN or None
    if not (shutil.which("gcc") and os.path.exists("/usr/include/jpeglib.h")):
        _PROG_BIN = ""
        return None
    d = tempfile.mkdtemp(prefix="jpegprog_")
    src = os.path.join(d, "prog.c")
    binp = os.path.join(d, "prog")
    with open(src, "w") as f:
        f.write(_PROG_HARNESS_C)
    r = subprocess.run(
        ["gcc", "-O2", "-o", binp, src, "-ljpeg"],
        capture_output=True, text=True,
    )
    _PROG_BIN = binp if r.returncode == 0 else ""
    return _PROG_BIN or None


def _encode_progressive(img: np.ndarray, sub="444", restart=0,
                        prog=1) -> bytes:
    binp = _prog_harness()
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    r = subprocess.run(
        [binp, "enc", str(w), str(h), str(ch), sub, str(restart),
         str(prog)],
        input=img.tobytes(), capture_output=True,
    )
    assert r.returncode == 0, r.stderr[-400:]
    return r.stdout


def _libjpeg_coefficients(payload: bytes):
    binp = _prog_harness()
    r = subprocess.run([binp, "coef"], input=payload, capture_output=True)
    assert r.returncode == 0, r.stderr[-400:]
    out = r.stdout
    nl = out.index(b"\n")
    nc = int(out[:nl])
    pos = nl + 1
    comps = []
    for _ in range(nc):
        nl = out.index(b"\n", pos)
        wb, hb = map(int, out[pos:nl].split())
        pos = nl + 1
        cnt = wb * hb * 64
        a = np.frombuffer(out[pos: pos + 2 * cnt], np.int16).astype(np.int32)
        pos += 2 * cnt
        comps.append((wb, hb, a.reshape(hb * wb, 64)))
    return comps


def _our_coeffs_natural(payload: bytes):
    """Our decode's per-component coefficients converted to natural
    order and cropped to libjpeg's un-padded block dims."""
    comps, H, W, _ = jpeg._decode_coefficients(payload)
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    out = []
    for c in comps:
        wb = -(-(-(-W * c.h // hmax)) // 8)
        hb = -(-(-(-H * c.v // vmax)) // 8)
        nat = np.zeros_like(c.coeffs)
        nat[:, jpeg.ZIGZAG] = c.coeffs
        g = nat.reshape(c.bh, c.bw, 64)
        out.append((wb, hb, g[:hb, :wb].reshape(hb * wb, 64)))
    return out


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_coefficients_match_libjpeg(sub):
    """Integer-domain anchor: our progressive decode recovers the exact
    quantized coefficients libjpeg's own jpeg_read_coefficients sees in
    the same stream — bit-exact across all scan classes the standard
    jpeg_simple_progression script emits (interleaved DC first, banded
    AC first, DC refinement, AC refinement with EOB runs)."""
    if _prog_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    payload = _encode_progressive(img, sub=sub)
    assert b"\xff\xc2" in payload  # really progressive
    ours = _our_coeffs_natural(payload)
    refs = _libjpeg_coefficients(payload)
    assert len(ours) == len(refs) == 3
    for ci, ((wb, hb, got), (rwb, rhb, want)) in enumerate(zip(ours, refs)):
        assert (wb, hb) == (rwb, rhb), (ci, wb, hb, rwb, rhb)
        assert np.array_equal(got, want), (
            ci, np.argwhere(got != want)[:5],
        )


def test_progressive_gray_restart_and_pixels():
    """Grayscale + restart-interval progressive streams: coefficients
    bit-exact, and full pixel decode agrees with libjpeg within IDCT
    rounding tolerance (ISLOW is fixed-point; ours is exact double)."""
    if _prog_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    gray = rng.integers(0, 256, (29, 35), dtype=np.uint8)
    p = _encode_progressive(gray)
    (wb, hb, got), = _our_coeffs_natural(p)
    (rwb, rhb, want), = _libjpeg_coefficients(p)
    assert (wb, hb) == (rwb, rhb) and np.array_equal(got, want)
    ref = _libjpeg_decode(p)
    px = jpeg.decode_jpeg_pixels(p)
    assert px.shape == ref.shape == (29, 35, 1)
    assert np.abs(ref.astype(int) - px.astype(int)).max() <= 1

    color = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    p = _encode_progressive(color, sub="420", restart=2)
    ours = _our_coeffs_natural(p)
    refs = _libjpeg_coefficients(p)
    for (wb, hb, got), (rwb, rhb, want) in zip(ours, refs):
        assert (wb, hb) == (rwb, rhb) and np.array_equal(got, want)
    ref = _libjpeg_decode(p)
    px = jpeg.decode_jpeg_pixels(p)
    assert np.abs(ref.astype(int) - px.astype(int)).max() <= 3


def test_progressive_smooth_gradient_decodes_cleanly():
    """End-to-end progressive pixel decode without libjpeg reference
    (runs even with no gcc): a smooth gradient must survive the
    progressive path within quantization error, pinned against the
    SEQUENTIAL path of the same image when the harness exists."""
    base = np.add.outer(np.arange(48) * 2, np.arange(64)).astype(np.uint8)
    if _prog_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    p = _encode_progressive(base)
    px = jpeg.decode_jpeg_pixels(p)
    assert px.shape == (48, 64, 1)
    err = np.abs(px[:, :, 0].astype(int) - base.astype(int))
    assert err.max() <= 12 and err.mean() < 3


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_own_progressive_encode_decodes_pixel_identical(sub):
    """encode_jpeg(progressive=True) emits a spectrally-split SOF2
    stream whose decode is PIXEL-IDENTICAL to the baseline stream of
    the same image (same coefficients inside the image), and libjpeg
    accepts it when the harness exists (spec validity)."""
    rng = _rng()
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    pb = jpeg.encode_jpeg(img, subsample=sub)
    pp = jpeg.encode_jpeg(img, subsample=sub, progressive=True)
    assert b"\xff\xc2" in pp and b"\xff\xc2" not in pb
    assert np.array_equal(
        jpeg.decode_jpeg_pixels(pb), jpeg.decode_jpeg_pixels(pp)
    )
    if _libjpeg_harness() is not None:
        ref = _libjpeg_decode(pp)
        got = jpeg.decode_jpeg_pixels(pp)
        assert np.abs(ref.astype(int) - got.astype(int)).max() <= 3


def test_own_progressive_gray_and_guards():
    gray = _rng().integers(0, 256, (29, 35), dtype=np.uint8)
    pp = jpeg.encode_jpeg(gray, progressive=True)
    assert np.array_equal(
        jpeg.decode_jpeg_pixels(jpeg.encode_jpeg(gray)),
        jpeg.decode_jpeg_pixels(pp),
    )
    with pytest.raises(ValueError, match="restart"):
        jpeg.encode_jpeg(gray, progressive=True, restart=2)


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_native_progressive_matches_python_bit_exact(sub):
    """The compiled progressive kernel (dudb_prog_segment) and the
    pure-Python _ProgBits loop recover IDENTICAL coefficients from the
    same libjpeg jpeg_simple_progression streams (all four scan classes,
    restart intervals included via the gray case below)."""
    import importlib

    from dudb_spark.pipeline import jpeg_native

    if _prog_harness() is None or jpeg_native.get_lib() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    payload = _encode_progressive(img, sub=sub)

    native = _our_coeffs_natural(payload)
    os.environ["DUDB_JPEG_NO_NATIVE"] = "1"
    jpeg_native._lib, jpeg_native._lib_tried = None, False
    try:
        pure = _our_coeffs_natural(payload)
    finally:
        del os.environ["DUDB_JPEG_NO_NATIVE"]
        jpeg_native._lib, jpeg_native._lib_tried = None, False
    for (wb, hb, got), (pwb, phb, want) in zip(native, pure):
        assert (wb, hb) == (pwb, phb)
        assert np.array_equal(got, want)


def test_native_progressive_restart_matches_python():
    from dudb_spark.pipeline import jpeg_native

    if _prog_harness() is None or jpeg_native.get_lib() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    color = rng.integers(0, 256, (40, 24, 3), dtype=np.uint8)
    p = _encode_progressive(color, sub="420", restart=2)
    native = _our_coeffs_natural(p)
    os.environ["DUDB_JPEG_NO_NATIVE"] = "1"
    jpeg_native._lib, jpeg_native._lib_tried = None, False
    try:
        pure = _our_coeffs_natural(p)
    finally:
        del os.environ["DUDB_JPEG_NO_NATIVE"]
        jpeg_native._lib, jpeg_native._lib_tried = None, False
    for (wb, hb, got), (pwb, phb, want) in zip(native, pure):
        assert (wb, hb) == (pwb, phb)
        assert np.array_equal(got, want)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_sequential_noninterleaved_multiscan(sub):
    """Sequential (SOF0) streams with one NON-INTERLEAVED scan per
    component (ns=1 x3, T.81 A.2): coefficients bit-exact against
    jpeg_read_coefficients, pixels within IDCT tolerance — the
    subsampled chroma scans must size against the frame's sampling
    maxima, not their own."""
    if _prog_harness() is None:
        pytest.skip("gcc/libjpeg not available")
    rng = _rng()
    img = rng.integers(0, 256, (45, 61, 3), dtype=np.uint8)
    payload = _encode_progressive(img, sub=sub, prog=0)
    assert b"\xff\xc2" not in payload and b"\xff\xc0" in payload
    assert payload.count(b"\xff\xda") == 3  # really three scans
    ours = _our_coeffs_natural(payload)
    refs = _libjpeg_coefficients(payload)
    for (wb, hb, got), (rwb, rhb, want) in zip(ours, refs):
        assert (wb, hb) == (rwb, rhb)
        assert np.array_equal(got, want)
    ref = _libjpeg_decode(payload)
    px = jpeg.decode_jpeg_pixels(payload)
    assert np.abs(ref.astype(int) - px.astype(int)).max() <= 3


def _patch_ac_symbol(payload: bytes, old=0x01, new=0x20) -> bytes:
    """Rewrite one symbol in the stream's AC DHT so the entropy data
    decodes to an AC symbol with size 0 and run not in {0,15} —
    undefined in sequential coding."""
    i = payload.index(b"\xff\xc4")
    i = payload.index(b"\xff\xc4", i + 2)  # second DHT = the AC table
    seglen = int.from_bytes(payload[i + 2:i + 4], "big")
    sym_start = i + 4 + 1 + 16
    sym_end = i + 2 + seglen
    syms = bytearray(payload[sym_start:sym_end])
    syms[syms.index(old)] = new
    return payload[:sym_start] + bytes(syms) + payload[sym_end:]


def test_invalid_ac_symbol_rejected_on_both_entropy_paths():
    """An AC symbol with size 0 outside EOB/ZRL (corrupt/adversarial
    table) must raise on the compiled kernel AND the Python loop — the
    C path previously shifted by -1 (UB) and kept decoding garbage."""
    from dudb_spark.pipeline import jpeg_native

    img = _rng().integers(0, 256, (24, 24), dtype=np.uint8)
    bad = _patch_ac_symbol(jpeg.encode_jpeg(img))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_pixels(bad)  # native path (when gcc exists)
    os.environ["DUDB_JPEG_NO_NATIVE"] = "1"
    jpeg_native._lib, jpeg_native._lib_tried = None, False
    try:
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_pixels(bad)  # pure-Python path
    finally:
        del os.environ["DUDB_JPEG_NO_NATIVE"]
        jpeg_native._lib, jpeg_native._lib_tried = None, False


def test_dc_refinement_scan_needs_no_huffman_table():
    """A progressive DC refinement scan (Ah>0) reads raw bits only — it
    must decode even when its Td destination was never defined (legal
    for encoders; previously raised 'missing Huffman table' before the
    refinement guard ran)."""
    from dudb_spark.pipeline import jpeg_native

    def one_refinement(al):
        c = jpeg._Component()
        c.cid, c.h, c.v, c.tq, c.td, c.ta = 1, 1, 1, 0, 3, 0
        c.bw = c.bh = 1
        c.coeffs = np.zeros((1, 64), np.int32)
        jpeg._entropy_decode_prog(
            b"\x80", [c], [c], 8, 8, {}, 0, 0, 0, 1, al
        )
        return int(c.coeffs[0, 0])

    assert one_refinement(0) == 1  # native path (or python without gcc)
    os.environ["DUDB_JPEG_NO_NATIVE"] = "1"
    jpeg_native._lib, jpeg_native._lib_tried = None, False
    try:
        assert one_refinement(2) == 4  # python path, bit lands at Al
    finally:
        del os.environ["DUDB_JPEG_NO_NATIVE"]
        jpeg_native._lib, jpeg_native._lib_tried = None, False
