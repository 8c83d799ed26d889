"""Optional compiled fast path for PNG scanline unfiltering.

The PNG filter recurrence is sequential in both directions (pixel i
needs reconstructed pixel i-1, row r needs row r-1), so the exact
numpy path for Average/Paeth rows is the batched anti-diagonal
wavefront in ``pipeline/unfilter.py`` — correct and ~20 MB/s, capped
by one ufunc dispatch round per diagonal.  This module compiles a
~50-line C transcription of EXACTLY the per-pixel reference kernel
(``unfilter.unfilter_rows_py`` — same mod-256 arithmetic, same
Paeth tie-breaks, same error taxonomy) at first use with the system
``gcc`` and exposes it via ctypes — the same pattern, cache, and
fallback discipline as ``jpeg_native.py``.

The unfilter is exact integer work, so the C and numpy paths are
bit-identical BY CONSTRUCTION (pinned by
tests/test_pipeline.py::test_png_native_matches_python_bit_exact);
decoded pixels — and the q56/q86 value-exact oracles — are unchanged.
No ``gcc`` (or ``DUDB_PNG_NO_NATIVE=1``) → ``unfilter.py`` keeps the
wavefront, the honest dependency-free floor.  The shared object is
cached under ``$TMPDIR`` keyed by the source hash, so the one-time
compile is paid once per host, not per process.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>
#include <stdlib.h>

/* Unfilter one PNG image: raw = h scanlines of (filter byte + stride
   filtered bytes), out = h*stride reconstructed pixels.  Transcribed
   from pipeline/unfilter.py unfilter_rows_py — identical mod-256
   arithmetic (uint8 stores wrap exactly like the Python & 0xFF) and
   identical Paeth tie-breaks (left, then up, then up-left).
   Returns 0 on success, -(100+f) for a bad filter type f. */
int dudb_png_unfilter(
    const uint8_t* raw, long h, long stride, long ch, uint8_t* out)
{
    const uint8_t* prev = NULL;
    for (long r = 0; r < h; r++) {
        const uint8_t* line = raw + r * (stride + 1) + 1;
        uint8_t* o = out + r * stride;
        int f = line[-1];
        long i;
        switch (f) {
        case 0:
            for (i = 0; i < stride; i++) o[i] = line[i];
            break;
        case 1:
            for (i = 0; i < stride && i < ch; i++) o[i] = line[i];
            for (; i < stride; i++) o[i] = line[i] + o[i - ch];
            break;
        case 2:
            if (prev)
                for (i = 0; i < stride; i++) o[i] = line[i] + prev[i];
            else
                for (i = 0; i < stride; i++) o[i] = line[i];
            break;
        case 3:
            for (i = 0; i < stride; i++) {
                int a = i >= ch ? o[i - ch] : 0;
                int b = prev ? prev[i] : 0;
                o[i] = line[i] + (uint8_t)((a + b) >> 1);
            }
            break;
        case 4:
            for (i = 0; i < stride; i++) {
                int a = i >= ch ? o[i - ch] : 0;
                int b = prev ? prev[i] : 0;
                int c = (prev && i >= ch) ? prev[i - ch] : 0;
                int p = a + b - c;
                int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                int pr = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                o[i] = line[i] + (uint8_t)pr;
            }
            break;
        default:
            return -(100 + f);
        }
        prev = o;
    }
    return 0;
}
"""

_lib = None
_lib_tried = False
_lock = threading.Lock()


def _build() -> "ctypes.CDLL | None":
    import shutil

    if os.environ.get("DUDB_PNG_NO_NATIVE"):
        return None
    if not shutil.which("gcc"):
        return None
    h = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"dudb_png_native_{h}.so")
    if not os.path.exists(so):
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "unfilter.c")
            with open(src, "w") as f:
                f.write(_C_SOURCE)
            tmp_so = os.path.join(td, "unfilter.so")
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
    fn = lib.dudb_png_unfilter
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    fn.restype = ctypes.c_int
    return lib


def get_lib():
    """The compiled unfilter kernel, or None when unavailable (no gcc,
    compile failure, or DUDB_PNG_NO_NATIVE set)."""
    global _lib, _lib_tried
    if not _lib_tried:
        with _lock:
            if not _lib_tried:
                _lib = _build()
                _lib_tried = True
    return _lib


def unfilter_image(lib, raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """One image through the compiled kernel; same ValueError taxonomy
    as the numpy paths.  ``raw`` must hold h*(stride+1) bytes (the
    caller — unfilter.unfilter_batch — validates via its scanline
    split, exactly as the numpy paths do)."""
    stride = w * ch
    out = np.empty((h, stride), np.uint8)
    rc = lib.dudb_png_unfilter(
        raw, h, stride, ch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"bad PNG filter type {-rc - 100}")
    return out
