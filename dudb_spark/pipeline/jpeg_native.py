"""Optional compiled fast path for the JPEG entropy decoder.

The Huffman symbol loop is the one serial, per-symbol stage of
``pipeline/jpeg.py`` (everything after it — dequant, IDCT, upsample,
color — is batched numpy).  This module compiles a ~100-line C
transcription of EXACTLY the same loop (same LUTs, same refill
discipline, same error taxonomy) at first use with the system ``gcc``
— no libjpeg, no third-party dependency — and exposes it via ctypes.

Because the entropy stage produces exact integer coefficients, the C
and Python paths are bit-identical BY CONSTRUCTION (pinned by
tests/test_jpeg.py::test_native_entropy_matches_python), so decoded
pixels — and the q128 value-exact oracle — are unchanged; this is a
speed tier, not an alternative decoder.  Where the container has no
``gcc`` the import degrades silently and ``pipeline/jpeg.py`` keeps
its pure-Python loop (the honest dependency-free floor recorded in
BENCH_NOTES.md).  ``DUDB_JPEG_NO_NATIVE=1`` forces the fallback.

The shared object is cached under ``$TMPDIR`` keyed by the source
hash, so the one-time compile (~0.2 s) is paid once per host, not per
process.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_C_SOURCE = r"""
#include <stdint.h>

/* Huffman entropy decode of one restart segment, transcribed from
   pipeline/jpeg.py _entropy_decode (same 16-bit-window LUTs:
   packed = (symbol << 5) | code_length, 0 = invalid prefix).
   data MUST include the 8 pad bytes the Python path appends.
   Returns 0 on success; -1 invalid code, -2 bad DC magnitude,
   -3 AC index overflow, -4 truncated stream. */
int dudb_entropy_segment(
    const uint8_t* data, long dlen,
    long mcu_start, long mcu_end, long mcus_x,
    int ncomp, const int32_t* meta,       /* ch, cv, gw per comp */
    const int32_t** dc_luts, const int32_t** ac_luts,
    int32_t* preds, int32_t** coeffs)
{
    uint64_t bitbuf = 0;
    int bitcnt = 0;
    long bpos = 0;
    for (long mcu = mcu_start; mcu < mcu_end; mcu++) {
        long my = mcu / mcus_x, mx = mcu % mcus_x;
        for (int ci = 0; ci < ncomp; ci++) {
            int ch = meta[ci * 3], cv = meta[ci * 3 + 1];
            long gw = meta[ci * 3 + 2];
            const int32_t* lutd = dc_luts[ci];
            const int32_t* luta = ac_luts[ci];
            int32_t pred = preds[ci];
            long row0 = my * cv, col0 = mx * ch;
            for (int by = 0; by < cv; by++) {
                long base = (((row0 + by) * gw + col0) << 6);
                for (int bx = 0; bx < ch; bx++) {
                    int32_t* blk = coeffs[ci] + base + ((long)bx << 6);
                    /* --- DC --- */
                    if (bitcnt < 16) {
                        if (bpos + 1 >= dlen) return -4;
                        bitbuf = (bitbuf << 16)
                            | ((uint64_t)data[bpos] << 8) | data[bpos + 1];
                        bpos += 2; bitcnt += 16;
                    }
                    int32_t packed =
                        lutd[(bitbuf >> (bitcnt - 16)) & 0xFFFF];
                    if (!packed) return -1;
                    int ssss = packed >> 5;
                    bitcnt -= packed & 31;
                    if (ssss) {
                        if (ssss > 11) return -2;
                        if (bitcnt < ssss) {
                            if (bpos + 1 >= dlen) return -4;
                            bitbuf = (bitbuf << 16)
                                | ((uint64_t)data[bpos] << 8)
                                | data[bpos + 1];
                            bpos += 2; bitcnt += 16;
                        }
                        int32_t bits =
                            (bitbuf >> (bitcnt - ssss))
                            & ((1u << ssss) - 1);
                        bitcnt -= ssss;
                        /* T.81 F.2.2.1 EXTEND, inlined */
                        pred += (bits < (1 << (ssss - 1)))
                            ? bits - (1 << ssss) + 1 : bits;
                    }
                    blk[0] = pred;
                    /* --- AC --- */
                    int k = 1;
                    while (k < 64) {
                        if (bitcnt < 16) {
                            if (bpos + 1 >= dlen) return -4;
                            bitbuf = (bitbuf << 16)
                                | ((uint64_t)data[bpos] << 8)
                                | data[bpos + 1];
                            bpos += 2; bitcnt += 16;
                        }
                        packed =
                            luta[(bitbuf >> (bitcnt - 16)) & 0xFFFF];
                        if (!packed) return -1;
                        int sym = packed >> 5;
                        bitcnt -= packed & 31;
                        if (sym == 0) break;          /* EOB */
                        if (sym == 0xF0) { k += 16; continue; } /* ZRL */
                        k += sym >> 4;
                        int s = sym & 15;
                        /* only EOB/ZRL may carry size 0 in sequential
                           coding: s==0 here would shift by -1 (UB) —
                           reject like the Python loop */
                        if (s == 0) return -1;
                        if (k > 63) return -3;
                        if (bitcnt < s) {
                            if (bpos + 1 >= dlen) return -4;
                            bitbuf = (bitbuf << 16)
                                | ((uint64_t)data[bpos] << 8)
                                | data[bpos + 1];
                            bpos += 2; bitcnt += 16;
                        }
                        int32_t bits =
                            (bitbuf >> (bitcnt - s)) & ((1u << s) - 1);
                        bitcnt -= s;
                        blk[k] = (bits < (1 << (s - 1)))
                            ? bits - (1 << s) + 1 : bits;
                        k++;
                    }
                }
            }
            preds[ci] = pred;
        }
    }
    return 0;
}

/* Progressive scan decode of one restart segment, transcribed from
   pipeline/jpeg.py _entropy_decode_prog: the four T.81 G.2 scan
   classes (DC first / DC refinement on Ss==0 by Ah, AC first / AC
   refinement on Ss>0 by Ah).  eobrun persists across units WITHIN a
   segment, so it rides in/out via pointer.  For non-interleaved scans
   ncomp==1 and units walk the sw-wide un-padded block grid; gw stays
   the component's padded stride.  Same refill discipline and error
   codes as the sequential kernel above. */
int dudb_prog_segment(
    const uint8_t* data, long dlen,
    long unit_start, long unit_end,
    long mcus_x, long sw, int interleaved,
    int ncomp, const int32_t* meta,       /* ch, cv, gw per comp */
    const int32_t** dc_luts, const int32_t* ac_lut,
    int ss, int se, int ah, int al,
    int32_t* preds, int32_t* eobrun_io,
    int32_t** coeffs)
{
    uint64_t bitbuf = 0;
    int bitcnt = 0;
    long bpos = 0;
    int32_t eobrun = *eobrun_io;
    const int32_t p1 = 1 << al;

#define REFILL(NEED) \
    if (bitcnt < (NEED)) { \
        if (bpos + 1 >= dlen) return -4; \
        bitbuf = (bitbuf << 16) \
            | ((uint64_t)data[bpos] << 8) | data[bpos + 1]; \
        bpos += 2; bitcnt += 16; \
    }

    for (long unit = unit_start; unit < unit_end; unit++) {
        if (ss == 0) {
            /* ---- DC scans ---- */
            long my, mx;
            if (interleaved) { my = unit / mcus_x; mx = unit % mcus_x; }
            else             { my = unit / sw;     mx = unit % sw; }
            for (int ci = 0; ci < ncomp; ci++) {
                int ch = meta[ci * 3], cv = meta[ci * 3 + 1];
                long gw = meta[ci * 3 + 2];
                long row0 = my * cv, col0 = mx * ch;
                for (int by = 0; by < cv; by++) {
                    for (int bx = 0; bx < ch; bx++) {
                        int32_t* blk = coeffs[ci]
                            + (((row0 + by) * gw + col0 + bx) << 6);
                        if (ah == 0) {
                            REFILL(16);
                            int32_t packed = dc_luts[ci]
                                [(bitbuf >> (bitcnt - 16)) & 0xFFFF];
                            if (!packed) return -1;
                            int s = packed >> 5;
                            bitcnt -= packed & 31;
                            if (s) {
                                if (s > 11) return -2;
                                REFILL(s);
                                int32_t bits =
                                    (bitbuf >> (bitcnt - s))
                                    & ((1u << s) - 1);
                                bitcnt -= s;
                                preds[ci] += (bits < (1 << (s - 1)))
                                    ? bits - (1 << s) + 1 : bits;
                            }
                            blk[0] = preds[ci] << al;
                        } else {
                            REFILL(1);
                            int32_t bit =
                                (bitbuf >> (bitcnt - 1)) & 1;
                            bitcnt -= 1;
                            if (bit) blk[0] |= p1;
                        }
                    }
                }
            }
        } else {
            /* ---- AC scans: single component, un-padded grid ---- */
            long gw = meta[2];
            long my = unit / sw, mx = unit % sw;
            int32_t* row = coeffs[0] + ((my * gw + mx) << 6);
            int k = ss;
            if (ah == 0) {
                /* AC first */
                if (eobrun) { eobrun--; continue; }
                while (k <= se) {
                    REFILL(16);
                    int32_t packed =
                        ac_lut[(bitbuf >> (bitcnt - 16)) & 0xFFFF];
                    if (!packed) return -1;
                    int sym = packed >> 5;
                    bitcnt -= packed & 31;
                    int r = sym >> 4, s = sym & 15;
                    if (s == 0) {
                        if (r == 15) { k += 16; continue; }  /* ZRL */
                        REFILL(r);
                        int32_t extra = r
                            ? (int32_t)((bitbuf >> (bitcnt - r))
                                        & ((1u << r) - 1)) : 0;
                        bitcnt -= r;
                        eobrun = (1 << r) - 1 + extra;
                        break;
                    }
                    k += r;
                    if (k > se) return -3;
                    REFILL(s);
                    int32_t bits =
                        (bitbuf >> (bitcnt - s)) & ((1u << s) - 1);
                    bitcnt -= s;
                    row[k] = ((bits < (1 << (s - 1)))
                              ? bits - (1 << s) + 1 : bits) << al;
                    k++;
                }
            } else {
                /* AC refinement */
                if (eobrun == 0) {
                    while (k <= se) {
                        REFILL(16);
                        int32_t packed =
                            ac_lut[(bitbuf >> (bitcnt - 16)) & 0xFFFF];
                        if (!packed) return -1;
                        int sym = packed >> 5;
                        bitcnt -= packed & 31;
                        int r = sym >> 4, s = sym & 15;
                        int32_t newval = 0;
                        if (s == 0) {
                            if (r < 15) {
                                REFILL(r);
                                int32_t extra = r
                                    ? (int32_t)((bitbuf >> (bitcnt - r))
                                                & ((1u << r) - 1)) : 0;
                                bitcnt -= r;
                                eobrun = (1 << r) + extra;
                                break;
                            }
                            /* r == 15: ZRL — skip 16 zero-history */
                        } else {
                            if (s != 1) return -2;
                            REFILL(1);
                            int32_t bit =
                                (bitbuf >> (bitcnt - 1)) & 1;
                            bitcnt -= 1;
                            newval = bit ? p1 : -p1;
                        }
                        while (k <= se) {
                            int32_t v = row[k];
                            if (v) {
                                REFILL(1);
                                int32_t bit =
                                    (bitbuf >> (bitcnt - 1)) & 1;
                                bitcnt -= 1;
                                if (bit && !(v & p1))
                                    row[k] = v + (v > 0 ? p1 : -p1);
                            } else {
                                if (r == 0) break;
                                r--;
                            }
                            k++;
                        }
                        if (newval && k <= se) row[k] = newval;
                        k++;
                    }
                }
                if (eobrun) {
                    for (; k <= se; k++) {
                        int32_t v = row[k];
                        if (v) {
                            REFILL(1);
                            int32_t bit =
                                (bitbuf >> (bitcnt - 1)) & 1;
                            bitcnt -= 1;
                            if (bit && !(v & p1))
                                row[k] = v + (v > 0 ? p1 : -p1);
                        }
                    }
                    eobrun--;
                }
            }
        }
    }
#undef REFILL
    *eobrun_io = eobrun;
    return 0;
}
"""

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build() -> "ctypes.CDLL | None":
    import shutil

    if os.environ.get("DUDB_JPEG_NO_NATIVE"):
        return None
    if not shutil.which("gcc"):
        return None
    h = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so = os.path.join(
        tempfile.gettempdir(), f"dudb_jpeg_native_{h}.so"
    )
    if not os.path.exists(so):
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "entropy.c")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            tmp_so = os.path.join(td, "entropy.so")
            r = subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", "-o", tmp_so, src],
                capture_output=True,
            )
            if r.returncode != 0:
                return None
            try:
                os.replace(tmp_so, so)
            except OSError:
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    fn = lib.dudb_entropy_segment
    PP = ctypes.POINTER(ctypes.c_void_p)
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        PP, PP,
        ctypes.POINTER(ctypes.c_int32), PP,
    ]
    fn.restype = ctypes.c_int
    fn2 = lib.dudb_prog_segment
    fn2.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        PP, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        PP,
    ]
    fn2.restype = ctypes.c_int
    return lib


def get_lib():
    """The compiled entropy kernel, or None when unavailable (no gcc,
    compile failure, or DUDB_JPEG_NO_NATIVE set)."""
    global _lib, _lib_tried
    if not _lib_tried:
        with _lock:
            if not _lib_tried:
                _lib = _build()
                _lib_tried = True
    return _lib


_ERRORS = {
    -1: "JPEG: invalid Huffman code",
    -2: "JPEG: bad DC magnitude",
    -3: "JPEG: AC index overflow",
    -4: "JPEG: truncated entropy data",
}


def entropy_segment(lib, seg, mcu_start, mcu_end, mcus_x, meta,
                    dc_arrs, ac_arrs, preds, coeff_arrs) -> None:
    """ctypes shim for one restart segment; raises the same ValueError
    taxonomy as the Python loop."""
    ncomp = len(dc_arrs)
    data = seg + b"\xff" * 8

    def pp(arrs):
        return (ctypes.c_void_p * ncomp)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
        )

    rc = lib.dudb_entropy_segment(
        data, len(data), mcu_start, mcu_end, mcus_x,
        ncomp, meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pp(dc_arrs), pp(ac_arrs),
        preds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        pp(coeff_arrs),
    )
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"JPEG: native decode rc={rc}"))


def prog_segment(lib, seg, unit_start, unit_end, mcus_x, sw, interleaved,
                 meta, dc_arrs, ac_arr, ss, se, ah, al,
                 preds, eobrun, coeff_arrs) -> None:
    """ctypes shim for one PROGRESSIVE restart segment (the four T.81
    G.2 scan classes); eobrun is a 1-element int32 array carrying the
    EOB run across units within the segment."""
    ncomp = len(coeff_arrs)
    data = seg + b"\xff" * 8
    i32p = ctypes.POINTER(ctypes.c_int32)

    def pp(arrs):
        return (ctypes.c_void_p * len(arrs))(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in arrs]
        )

    rc = lib.dudb_prog_segment(
        data, len(data), unit_start, unit_end, mcus_x, sw,
        int(interleaved), ncomp, meta.ctypes.data_as(i32p),
        pp(dc_arrs), ac_arr.ctypes.data_as(i32p),
        ss, se, ah, al,
        preds.ctypes.data_as(i32p), eobrun.ctypes.data_as(i32p),
        pp(coeff_arrs),
    )
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"JPEG: native decode rc={rc}"))
