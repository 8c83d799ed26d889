"""Dependency-free baseline + progressive JPEG codec (ITU-T T.81).

The decoder handles baseline and extended-sequential Huffman JPEGs
(SOF0/SOF1 — interleaved single-scan AND the rarer non-interleaved
one-scan-per-component layout, T.81 A.2) and progressive Huffman JPEGs
(SOF2, T.81 Annex G.2: DC first/refinement and AC first/refinement
scans with EOB runs and successive approximation): 8-bit precision,
grayscale or YCbCr with integer sampling ratios (4:4:4, 4:2:2, 4:2:0),
optional restart intervals.  Arithmetic coding, 12-bit precision, and CMYK raise
ValueError — ``multimodal.decode_jpeg`` falls back to Pillow for those
when it is installed, and null-fills otherwise (the same declared
boundary as the other codecs; reference has no multimodal surface —
pipeline extension).

Execution split mirrors the PNG decoder (multimodal.py / unfilter.py):
the ONLY sequentially-dependent stage — Huffman entropy decoding — runs
as a tight table-driven Python loop (a 16-bit-window LUT per Huffman
table, one dict-free list lookup per symbol), and EVERYTHING after the
symbol stream is numpy over all blocks at once: dequantization, inverse
zigzag, a batched 8x8 IDCT (two tensordots against the orthonormal DCT-II
basis), chroma upsampling via ``np.repeat``, and the BT.601 full-range
YCbCr->RGB transform.  At 100 TB the per-payload work is embarrassingly
parallel across the ``mapInPandas`` decode stage; nothing here touches
the driver.

The encoder exists for test fixtures and the decode bench: it produces
spec-valid interchange streams (it writes its own DQT/DHT segments, so
the decoder exercises real table parsing) but optimizes for simplicity,
not ratio — every DC symbol gets a 4-bit code and every AC symbol an
8-bit code (canonical, all-ones codes unused, Kraft-satisfied), which is
~2x the size of an Annex-K stream.  Entropy decode is lossless, so the
encoder's quantized coefficients are bit-recoverable by the decoder:
tests pin exact coefficient equality end-to-end plus pixel equality
against an independent per-block reference IDCT.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# shared constants
# --------------------------------------------------------------------------

def _zigzag_order() -> np.ndarray:
    """Raster index of each zigzag position, generated from the diagonal
    walk (up-right on even anti-diagonals, down-left on odd) so the
    constant cannot be mistyped.  Sanity-pinned below."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        rows = rng if s % 2 else reversed(rng)
        out.extend(r * 8 + (s - r) for r in rows)
    return np.array(out, np.int64)


ZIGZAG = _zigzag_order()
assert list(ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2] and int(ZIGZAG[63]) == 63

# orthonormal DCT-II basis: spatial = B.T @ coeffs @ B, coeffs = B @ x @ B.T
_BASIS = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# quantization matrices (Annex K.1/K.2 shape not required for validity —
# these are mildly flattened variants in RASTER order; the decoder reads
# whatever the stream carries)
_QUANT_LUMA = np.clip(
    np.add.outer(np.arange(8), np.arange(8)) * 3 + 8, 1, 255
).astype(np.uint8)
_QUANT_CHROMA = np.clip(
    np.add.outer(np.arange(8), np.arange(8)) * 5 + 12, 1, 255
).astype(np.uint8)


# --------------------------------------------------------------------------
# Huffman tables: canonical build + 16-bit window LUT
# --------------------------------------------------------------------------

class _HuffLUT:
    """16-bit-window decode table: ``packed[w] = (symbol << 5) | length``
    for every 16-bit window ``w`` whose prefix is a valid code; 0 marks
    an invalid prefix (corrupt stream).  One list lookup decodes one
    symbol regardless of code length."""

    __slots__ = ("packed", "_np")

    def np32(self):
        """The same table as a contiguous int32 array (the compiled
        entropy kernel indexes it directly); built lazily, cached."""
        if self._np is None:
            self._np = np.array(self.packed, np.int32)
        return self._np

    def __init__(self, counts, symbols):
        self._np = None
        packed = [0] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                k += 1
                base = code << (16 - length)
                if base >= 1 << 16:
                    raise ValueError("JPEG: over-subscribed Huffman table")
                val = (sym << 5) | length
                packed[base: base + (1 << (16 - length))] = [val] * (
                    1 << (16 - length)
                )
                code += 1
            code <<= 1
        self.packed = packed


def _huff_cached(raw: bytes) -> _HuffLUT:
    """DHT-payload-keyed LUT cache: a corpus encoded with one table set
    (the overwhelmingly common case — every libjpeg-default stream
    shares the Annex K tables) builds each 65536-entry window table
    once per process instead of once per image.  Bounded FIFO; the
    tables are immutable so sharing across decodes is safe."""
    lut = _HUFF_CACHE.get(raw)
    if lut is None:
        counts = list(raw[:16])
        lut = _HuffLUT(counts, list(raw[16:16 + sum(counts)]))
        if len(_HUFF_CACHE) >= 64:
            _HUFF_CACHE.pop(next(iter(_HUFF_CACHE)))
        _HUFF_CACHE[raw] = lut
    return lut


_HUFF_CACHE: dict[bytes, _HuffLUT] = {}


# --------------------------------------------------------------------------
# decoder (T.81 F.2.2.1 EXTEND is inlined at both magnitude reads)
# --------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "coeffs", "bw", "bh")


def _decode_coefficients(payload: bytes):
    """Parse markers + entropy-decode: returns (components, H, W, qtables)
    with per-component quantized coefficient arrays of shape
    (bh*bw, 64) in ZIGZAG order — the exact values the encoder emitted
    (entropy coding is lossless), which is what the roundtrip tests pin."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffLUT] = {}
    comps: list[_Component] = []
    H = W = 0
    restart = 0
    sof_seen = False
    progressive = False
    scans_done = 0
    seq_done: set[int] = set()
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone
        if pos + 2 > n:
            raise ValueError("JPEG: truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2: pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("JPEG: truncated segment")
        end = pos + seglen
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                cnt = 64 * (2 if pq else 1)
                raw = seg[o: o + cnt]
                if len(raw) < cnt:
                    raise ValueError("JPEG: truncated DQT")
                dt = ">u2" if pq else "u1"
                qtables[tq] = np.frombuffer(raw, dt).astype(np.int32)
                o += cnt
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                counts = list(seg[o + 1: o + 17])
                nsym = sum(counts)
                symbols = list(seg[o + 17: o + 17 + nsym])
                if len(symbols) < nsym:
                    raise ValueError("JPEG: truncated DHT")
                huff[(tc, th)] = _huff_cached(
                    bytes(seg[o + 1: o + 17 + nsym])
                )
                o += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
            progressive = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            H, W = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            for i in range(nc):
                c = _Component()
                c.cid = seg[6 + 3 * i]
                c.h = seg[7 + 3 * i] >> 4
                c.v = seg[7 + 3 * i] & 15
                c.tq = seg[8 + 3 * i]
                if not (1 <= c.h <= 4 and 1 <= c.v <= 4):
                    raise ValueError("JPEG: bad sampling factors")
                comps.append(c)
            if progressive:
                # coefficients accumulate across scans: allocate every
                # component's full MCU-padded grid up front (interleaved
                # DC scans address the padded grid; AC scans the
                # component's own un-padded block dims)
                hmax = max(c.h for c in comps)
                vmax = max(c.v for c in comps)
                mx = -(-W // (8 * hmax))
                my = -(-H // (8 * vmax))
                for c in comps:
                    c.bw = mx * c.h
                    c.bh = my * c.v
                    c.coeffs = np.zeros((c.bh * c.bw, 64), np.int32)
            sof_seen = True
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG coding process "
                f"(SOF marker 0xFF{marker:02X}; sequential/progressive "
                "Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not sof_seen:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            order = []
            for i in range(ns):
                c = by_id.get(seg[1 + 2 * i])
                if c is None:
                    raise ValueError("JPEG: scan references unknown component")
                c.td = seg[2 + 2 * i] >> 4
                c.ta = seg[2 + 2 * i] & 15
                order.append(c)
            scan_start = end
            scan_end = _scan_extent(payload, scan_start)
            if progressive:
                ss = seg[1 + 2 * ns]
                se = seg[2 + 2 * ns]
                ah = seg[3 + 2 * ns] >> 4
                al = seg[3 + 2 * ns] & 15
                _entropy_decode_prog(
                    payload[scan_start:scan_end], order, comps, H, W,
                    huff, restart, ss, se, ah, al,
                )
                scans_done += 1
                pos = scan_end
                continue
            # sequential: interleaved single-scan is the common case;
            # non-interleaved streams carry one scan per component
            # (ns < ncomps, T.81 A.2) — decode each against the frame's
            # global sampling maxima and return once every component
            # has its coefficients
            _entropy_decode(
                payload[scan_start:scan_end], order, H, W, huff, restart,
                hv=(max(c.h for c in comps), max(c.v for c in comps)),
            )
            seq_done.update(id(c) for c in order)
            if len(seq_done) < len(comps):
                pos = scan_end
                continue
            for c in comps:
                if c.tq not in qtables:
                    raise ValueError("JPEG: missing quantization table")
            return comps, H, W, qtables
        pos = end
    if progressive and scans_done:
        for c in comps:
            if c.tq not in qtables:
                raise ValueError("JPEG: missing quantization table")
        return comps, H, W, qtables
    raise ValueError("JPEG: no SOS marker")


def _scan_extent(payload: bytes, start: int):
    """End offset of the entropy-coded scan: the next 0xFF not followed
    by 0x00 (stuffing) or RSTn."""
    pos = start
    n = len(payload)
    while True:
        nxt = payload.find(b"\xff", pos)
        if nxt < 0 or nxt + 1 >= n:
            return n
        b = payload[nxt + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            pos = nxt + 2
            continue
        return nxt


def _entropy_decode(scan, order, H, W, huff, restart, hv=None):
    """Huffman-decode every MCU of an (interleaved or single-component)
    scan into per-component ``coeffs`` arrays.  The symbol loop is the
    serial core: one LUT lookup per symbol + one masked shift per
    magnitude read, with restart segments resetting predictors.

    ``hv`` carries the frame-GLOBAL (hmax, vmax): a non-interleaved
    scan of one subsampled component must size that component's block
    grid against the frame's sampling maxima, not its own (T.81 A.1.1
    — without it a 4:2:0 chroma scan would be sized full-resolution)."""
    hmax, vmax = hv if hv else (
        max(c.h for c in order), max(c.v for c in order)
    )
    if len(order) == 1:
        c = order[0]
        # non-interleaved: the MCU is one block of the lone component
        cw = -(-W * c.h // hmax)
        chh = -(-H * c.v // vmax)
        c.bw = -(-cw // 8)
        c.bh = -(-chh // 8)
        mcus_x, mcus_y = c.bw, c.bh
        layout = [(c, 1, 1)]
        grid_w = {id(c): c.bw}
    else:
        mcus_x = -(-W // (8 * hmax))
        mcus_y = -(-H // (8 * vmax))
        layout = [(c, c.h, c.v) for c in order]
        grid_w = {}
        for c in order:
            c.bw = mcus_x * c.h
            c.bh = mcus_y * c.v
            grid_w[id(c)] = c.bw
    for c in order:
        c.coeffs = np.zeros((c.bh * c.bw, 64), np.int32)
    try:
        dc_lut = {id(c): huff[(0, c.td)].packed for c in order}
        ac_lut = {id(c): huff[(1, c.ta)].packed for c in order}
    except KeyError:
        raise ValueError("JPEG: scan references missing Huffman table")

    # split restart segments (byte-aligned per spec; RSTn bytes cannot
    # collide with stuffed 0xFF00 pairs) and unstuff each, so the bit
    # reader never sees markers
    import re as _re

    if restart:
        parts = _re.split(b"\xff[\xd0-\xd7]", scan)
    else:
        parts = [scan]
    segments = [p.replace(b"\xff\x00", b"\xff") for p in parts]

    n_mcus = mcus_x * mcus_y
    per_seg = restart or n_mcus

    # compiled fast path: the SAME loop in C (pipeline/jpeg_native.py),
    # bit-identical coefficients, pure-Python fallback below when gcc
    # is unavailable or DUDB_JPEG_NO_NATIVE is set
    from dudb_spark.pipeline import jpeg_native

    lib = jpeg_native.get_lib()
    if lib is not None:
        meta = np.array(
            [x for c, ch, cv in layout for x in (ch, cv, grid_w[id(c)])],
            np.int32,
        )
        dc_arrs = [huff[(0, c.td)].np32() for c, _, _ in layout]
        ac_arrs = [huff[(1, c.ta)].np32() for c, _, _ in layout]
        coeff_arrs = [c.coeffs.reshape(-1) for c, _, _ in layout]
        mcu = 0
        for seg in segments:
            if mcu >= n_mcus:
                break
            preds = np.zeros(len(layout), np.int32)
            seg_end = min(mcu + per_seg, n_mcus)
            jpeg_native.entropy_segment(
                lib, seg, mcu, seg_end, mcus_x, meta,
                dc_arrs, ac_arrs, preds, coeff_arrs,
            )
            mcu = seg_end
        if mcu < n_mcus:
            raise ValueError("JPEG: truncated entropy data")
        return
    # per-component decode state, hoisted out of the hot loop: packed
    # coefficient position (block_index << 6 | zigzag_k) + value lists,
    # LUTs and grid strides bound once per component
    state = [
        (
            dc_lut[id(c)], ac_lut[id(c)], grid_w[id(c)], ch, cv,
            [], [], ci,
        )
        for ci, (c, ch, cv) in enumerate(layout)
    ]
    npreds = len(layout)

    mcu = 0
    for seg in segments:
        if mcu >= n_mcus:
            break
        preds = [0] * npreds
        # 8 pad bytes let the refill skip per-byte bounds checks: a
        # correct stream only peeks (never decodes) past its final
        # symbol, so pad VALUE is irrelevant; a truncated stream either
        # hits an invalid code or runs off the pad -> IndexError below
        data = seg + b"\xff" * 8
        bitbuf = 0
        bitcnt = 0
        bpos = 0
        seg_end = min(mcu + per_seg, n_mcus)
        try:
            while mcu < seg_end:
                my, mx = divmod(mcu, mcus_x)
                for lut_d, lut_a, gw, ch, cv, idx, vals, ci in state:
                    pred = preds[ci]
                    idx_append = idx.append
                    vals_append = vals.append
                    row0 = my * cv
                    col0 = mx * ch
                    for by in range(cv):
                        base = ((row0 + by) * gw + col0) << 6
                        for bx in range(ch):
                            bi6 = base + (bx << 6)
                            # --- DC ---
                            if bitcnt < 16:
                                bitbuf = (
                                    (bitbuf << 16)
                                    | (data[bpos] << 8) | data[bpos + 1]
                                )
                                bpos += 2
                                bitcnt += 16
                            packed = lut_d[(bitbuf >> (bitcnt - 16)) & 0xFFFF]
                            if packed == 0:
                                raise ValueError("JPEG: invalid Huffman code")
                            ssss = packed >> 5
                            bitcnt -= packed & 31
                            if ssss:
                                if ssss > 11:
                                    raise ValueError("JPEG: bad DC magnitude")
                                if bitcnt < ssss:
                                    bitbuf = (
                                        (bitbuf << 16)
                                        | (data[bpos] << 8) | data[bpos + 1]
                                    )
                                    bpos += 2
                                    bitcnt += 16
                                bits = (bitbuf >> (bitcnt - ssss)) & (
                                    (1 << ssss) - 1
                                )
                                bitcnt -= ssss
                                # T.81 F.2.2.1 EXTEND, inlined
                                if bits < (1 << (ssss - 1)):
                                    pred += bits - (1 << ssss) + 1
                                else:
                                    pred += bits
                            idx_append(bi6)
                            vals_append(pred)
                            # --- AC ---
                            k = 1
                            while k < 64:
                                if bitcnt < 16:
                                    bitbuf = (
                                        (bitbuf << 16)
                                        | (data[bpos] << 8) | data[bpos + 1]
                                    )
                                    bpos += 2
                                    bitcnt += 16
                                packed = lut_a[
                                    (bitbuf >> (bitcnt - 16)) & 0xFFFF
                                ]
                                if packed == 0:
                                    raise ValueError(
                                        "JPEG: invalid Huffman code"
                                    )
                                sym = packed >> 5
                                bitcnt -= packed & 31
                                if sym == 0:  # EOB
                                    break
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += sym >> 4
                                s = sym & 15
                                if s == 0:
                                    # only EOB (0x00) / ZRL (0xF0) may
                                    # carry size 0 in sequential coding
                                    raise ValueError(
                                        "JPEG: invalid AC symbol"
                                    )
                                if k > 63:
                                    raise ValueError("JPEG: AC index overflow")
                                if bitcnt < s:
                                    bitbuf = (
                                        (bitbuf << 16)
                                        | (data[bpos] << 8) | data[bpos + 1]
                                    )
                                    bpos += 2
                                    bitcnt += 16
                                bits = (bitbuf >> (bitcnt - s)) & (
                                    (1 << s) - 1
                                )
                                bitcnt -= s
                                idx_append(bi6 + k)
                                if bits < (1 << (s - 1)):
                                    vals_append(bits - (1 << s) + 1)
                                else:
                                    vals_append(bits)
                                k += 1
                            # keep the rolling int bounded (Python bigint
                            # cost grows with bit size; trim to live bits)
                            bitbuf &= (1 << bitcnt) - 1
                    preds[ci] = pred
                mcu += 1
        except IndexError:
            raise ValueError("JPEG: truncated entropy data")
    if mcu < n_mcus:
        raise ValueError("JPEG: truncated entropy data")
    for (c, _, _), (_, _, _, _, _, idx, vals, _) in zip(layout, state):
        pk = np.array(idx, np.int64)
        c.coeffs[pk >> 6, pk & 63] = np.array(vals, np.int32)


class _ProgBits:
    """Bit reader for progressive scans (T.81 G.2): same 16-bit refill
    discipline as the sequential loop, per restart segment.  Method-call
    overhead is acceptable here — progressive is the rare tier; the
    bench hot path (baseline) keeps the inlined loop + native kernel."""

    __slots__ = ("data", "bitbuf", "bitcnt", "bpos")

    def __init__(self, seg: bytes):
        # 8 pad bytes: a correct stream only peeks past its last symbol
        self.data = seg + b"\xff" * 8
        self.bitbuf = 0
        self.bitcnt = 0
        self.bpos = 0

    def decode(self, lut) -> int:
        if self.bitcnt < 16:
            self.bitbuf = (
                (self.bitbuf << 16)
                | (self.data[self.bpos] << 8) | self.data[self.bpos + 1]
            )
            self.bpos += 2
            self.bitcnt += 16
        packed = lut[(self.bitbuf >> (self.bitcnt - 16)) & 0xFFFF]
        if packed == 0:
            raise ValueError("JPEG: invalid Huffman code")
        self.bitcnt -= packed & 31
        self.bitbuf &= (1 << self.bitcnt) - 1
        return packed >> 5

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bitcnt < n:
            self.bitbuf = (
                (self.bitbuf << 16)
                | (self.data[self.bpos] << 8) | self.data[self.bpos + 1]
            )
            self.bpos += 2
            self.bitcnt += 16
        bits = (self.bitbuf >> (self.bitcnt - n)) & ((1 << n) - 1)
        self.bitcnt -= n
        return bits

    def extend(self, n: int) -> int:
        bits = self.receive(n)
        # T.81 F.2.2.1 EXTEND
        return bits - (1 << n) + 1 if bits < (1 << (n - 1)) else bits


def _entropy_decode_prog(scan, order, comps_all, H, W, huff, restart,
                         ss, se, ah, al):
    """One progressive scan (T.81 G.2) folded into the components'
    coefficient arrays.  Four scan classes: DC first (Ss=Se=0, Ah=0 —
    diffs << Al, interleaved or not), DC refinement (Ah>0 — one raw bit
    per block ORed at Al), AC first (Ss>0, Ah=0 — single component,
    EOB-run codes skip whole blocks), AC refinement (Ah>0 — correction
    bits for already-nonzero coefficients plus newly ±1<<Al ones, EOB
    runs carry correction bits through skipped blocks).  Restart
    intervals reset predictors AND the EOB run."""
    hmax = max(c.h for c in comps_all)
    vmax = max(c.v for c in comps_all)
    mcus_x = -(-W // (8 * hmax))
    mcus_y = -(-H // (8 * vmax))
    if ss == 0 and se != 0:
        raise ValueError("JPEG: progressive DC scan with Se != 0")
    if ss > 0 and len(order) != 1:
        raise ValueError("JPEG: progressive AC scan must be one component")
    if not (se < 64 and ss <= se):
        raise ValueError("JPEG: bad spectral selection")
    interleaved = len(order) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
        layout = [(c, c.h, c.v) for c in order]
    else:
        c = order[0]
        # non-interleaved scans cover the component's OWN block dims
        # (no MCU padding); positions map into the padded c.bw grid
        cw = -(-W * c.h // hmax)
        chh = -(-H * c.v // vmax)
        sw = -(-cw // 8)
        sh = -(-chh // 8)
        n_units = sw * sh
        layout = [(c, 1, 1)]
    if ss == 0:
        if ah > 0:
            dc_lut = None  # refinement reads raw bits only — a missing
            # (never-defined) DC table destination is legal here
        else:
            try:
                dc_lut = {id(c): huff[(0, c.td)].packed for c in order}
            except KeyError:
                raise ValueError(
                    "JPEG: scan references missing Huffman table"
                )
    else:
        c = order[0]
        try:
            ac_lut = huff[(1, c.ta)].packed
        except KeyError:
            raise ValueError("JPEG: scan references missing Huffman table")
        coeffs = c.coeffs
        gw = c.bw

    import re as _re

    if restart:
        parts = _re.split(b"\xff[\xd0-\xd7]", scan)
    else:
        parts = [scan]
    segments = [p.replace(b"\xff\x00", b"\xff") for p in parts]
    per_seg = restart or n_units
    p1 = 1 << al

    # compiled fast path: the SAME four scan procedures in C
    # (jpeg_native.dudb_prog_segment), bit-identical coefficients;
    # pure-Python loop below when gcc is unavailable
    from dudb_spark.pipeline import jpeg_native

    lib = jpeg_native.get_lib()  # honors DUDB_JPEG_NO_NATIVE
    if lib is not None:
        meta = np.array(
            [x for (c, ch, cv) in layout for x in (ch, cv, c.bw)],
            np.int32,
        )
        zero = np.zeros(1, np.int32)
        dc_arrs = [
            huff[(0, c.td)].np32() if (ss == 0 and ah == 0) else zero
            for (c, _, _) in layout
        ]
        ac_np = huff[(1, order[0].ta)].np32() if ss > 0 else zero
        coeff_arrs = [c.coeffs.reshape(-1) for (c, _, _) in layout]
        sw_val = mcus_x if interleaved else sw
        unit = 0
        for seg in segments:
            if unit >= n_units:
                break
            preds_np = np.zeros(len(layout), np.int32)
            eob_np = np.zeros(1, np.int32)
            seg_end = min(unit + per_seg, n_units)
            jpeg_native.prog_segment(
                lib, seg, unit, seg_end, mcus_x, sw_val, interleaved,
                meta, dc_arrs, ac_np, ss, se, ah, al,
                preds_np, eob_np, coeff_arrs,
            )
            unit = seg_end
        if unit < n_units:
            raise ValueError("JPEG: truncated entropy data")
        return

    unit = 0
    try:
        for seg in segments:
            if unit >= n_units:
                break
            br = _ProgBits(seg)
            preds = [0] * len(order)
            eobrun = 0
            seg_end = min(unit + per_seg, n_units)
            while unit < seg_end:
                if ss == 0:
                    # ---- DC scans (interleaved or single-component) ----
                    if interleaved:
                        my, mx = divmod(unit, mcus_x)
                    else:
                        my, mx = divmod(unit, sw)
                    for ci, (c, ch, cv) in enumerate(layout):
                        row0 = my * cv
                        col0 = mx * ch
                        for by in range(cv):
                            for bx in range(ch):
                                bi = (row0 + by) * c.bw + col0 + bx
                                if ah == 0:
                                    sssss = br.decode(dc_lut[id(c)])
                                    if sssss > 11:
                                        raise ValueError(
                                            "JPEG: bad DC magnitude"
                                        )
                                    if sssss:
                                        preds[ci] += br.extend(sssss)
                                    c.coeffs[bi, 0] = preds[ci] << al
                                else:
                                    if br.receive(1):
                                        c.coeffs[bi, 0] |= p1
                elif ah == 0:
                    # ---- AC first scan ----
                    my, mx = divmod(unit, sw)
                    bi = my * gw + mx
                    if eobrun:
                        eobrun -= 1
                    else:
                        k = ss
                        while k <= se:
                            sym = br.decode(ac_lut)
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1 + br.receive(r)
                                break
                            k += r
                            if k > se:
                                raise ValueError("JPEG: AC index overflow")
                            coeffs[bi, k] = br.extend(s) << al
                            k += 1
                else:
                    # ---- AC refinement scan ----
                    my, mx = divmod(unit, sw)
                    bi = my * gw + mx
                    row = coeffs[bi]
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            sym = br.decode(ac_lut)
                            r, s = sym >> 4, sym & 15
                            if s == 0:
                                if r < 15:
                                    eobrun = (1 << r) + br.receive(r)
                                    break
                                newval = 0  # ZRL: skip 16 zero-history
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "JPEG: bad AC refinement magnitude"
                                    )
                                newval = p1 if br.receive(1) else -p1
                            # advance past r zero-history coefficients,
                            # emitting a correction bit at each nonzero
                            while k <= se:
                                v = row[k]
                                if v:
                                    if br.receive(1) and not (v & p1):
                                        row[k] = v + (p1 if v > 0 else -p1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if newval and k <= se:
                                row[k] = newval
                            k += 1
                    if eobrun:
                        # rest of this block: correction bits only
                        while k <= se:
                            v = row[k]
                            if v and br.receive(1) and not (v & p1):
                                row[k] = v + (p1 if v > 0 else -p1)
                            k += 1
                        eobrun -= 1
                unit += 1
    except IndexError:
        raise ValueError("JPEG: truncated entropy data")
    if unit < n_units:
        raise ValueError("JPEG: truncated entropy data")


def _reconstruct_plane(c: _Component, qtable: np.ndarray) -> np.ndarray:
    """Dequantize + inverse zigzag + batched IDCT + level shift for one
    component: all-blocks-at-once numpy, no Python per-block work."""
    deq = c.coeffs * qtable[None, :]
    nat = np.zeros_like(deq)
    nat[:, ZIGZAG] = deq  # zigzag position k lands at raster ZIGZAG[k]
    blocks = nat.reshape(-1, 8, 8).astype(np.float64)
    spatial = np.tensordot(
        np.tensordot(blocks, _BASIS, axes=([1], [0])), _BASIS,
        axes=([1], [0]),
    )  # (n, 8x, 8y) after two contractions over the u/v axes
    px = np.clip(np.round(spatial) + 128.0, 0, 255).astype(np.uint8)
    plane = (
        px.reshape(c.bh, c.bw, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(c.bh * 8, c.bw * 8)
    )
    return plane


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full decode to an (H, W, ch) uint8 array (ch 1 or 3, RGB order
    for color).  BT.601 full-range YCbCr->RGB per JFIF."""
    comps, H, W, qtables = _decode_coefficients(payload)
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    planes = []
    for c in comps:
        plane = _reconstruct_plane(c, qtables[c.tq])
        ry, rx = vmax // c.v, hmax // c.h
        if (rx * c.h, ry * c.v) != (hmax, vmax):
            raise ValueError("JPEG: non-integer sampling ratio")
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return planes[0][:, :, None]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.empty((H, W, 3), np.float64)
    rgb[:, :, 0] = y + 1.402 * cr
    rgb[:, :, 1] = y - 0.344136 * cb - 0.714136 * cr
    rgb[:, :, 2] = y + 1.772 * cb
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder (test fixtures + bench payloads)
# --------------------------------------------------------------------------

# simple valid canonical tables (see module docstring): 12 DC symbols at
# 4 bits, all 162 AC symbols at 8 bits; all-ones codes unused
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _canonical_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def put(self, code: int, length: int):
        self.buf = (self.buf << length) | code
        self.cnt += length
        while self.cnt >= 8:
            b = (self.buf >> (self.cnt - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # stuffing
            self.cnt -= 8
        self.buf &= (1 << self.cnt) - 1

    def flush(self):
        if self.cnt:
            pad = 8 - self.cnt
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec


def _quantize_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """(h, w) uint8 plane -> (nblocks, 64) int32 quantized coefficients
    in zigzag order; edge-replicated padding to 8-multiples."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeffs = np.tensordot(
        np.tensordot(blocks, _BASIS.T, axes=([1], [0])), _BASIS.T,
        axes=([1], [0]),
    )
    q = np.round(coeffs.reshape(-1, 64) / qtable[None, :]).astype(np.int32)
    return q[:, ZIGZAG]  # raster -> zigzag order


def _encode_dc(bw: _BitWriter, dc: int, pred: int) -> int:
    diff = dc - pred
    ssss = int(diff).bit_length() if diff else 0
    if diff < 0:
        bits = diff + (1 << ssss) - 1
    else:
        bits = diff
    code, length = _DC_CODES[ssss]
    bw.put(code, length)
    if ssss:
        bw.put(bits & ((1 << ssss) - 1), ssss)
    return dc


def _encode_ac(bw: _BitWriter, zz: np.ndarray) -> None:
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]
            bw.put(c, ln)
            run -= 16
        s = abs(v).bit_length()
        c, ln = _AC_CODES[(run << 4) | s]
        bw.put(c, ln)
        bits = v if v >= 0 else v + (1 << s) - 1
        bw.put(bits & ((1 << s) - 1), s)
        run = 0
    if last < 63:
        c, ln = _AC_CODES[0x00]
        bw.put(c, ln)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = _encode_dc(bw, int(zz[0]), pred)
    _encode_ac(bw, zz)
    return dc


def encode_jpeg(
    img: np.ndarray, subsample: str = "444", restart: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JPEG.  ``subsample``: '444', '422' or '420' (color only).
    ``restart``: emit DRI + RSTn every N MCUs when nonzero.
    ``progressive=True`` emits a spectrally-split SOF2 stream instead
    (one DC scan of all components + one full-band AC scan per
    component, Ah=Al=0 — a minimal valid progression whose quantized
    coefficients are IDENTICAL to the baseline stream's on every block
    inside the image (MCU-padding blocks carry DC only: non-interleaved
    AC scans cover the un-padded dims per T.81, and padding never
    reaches pixels), which is what the progressive fixture tests and
    bench pin; restart unsupported in this mode)."""
    img = np.asarray(img, np.uint8)
    if progressive and restart:
        raise ValueError("progressive encode does not support restart")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if not gray:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(
            np.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255
        )
        cr = np.clip(
            np.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255
        )
        sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
        planes = [y.astype(np.uint8)]
        for chroma in (cb, cr):
            if sh > 1 or sv > 1:
                ph = -(-h // sv) * sv
                pw = -(-w // sh) * sh
                p = np.pad(chroma, ((0, ph - h), (0, pw - w)), mode="edge")
                chroma = p.reshape(ph // sv, sv, pw // sh, sh).mean(
                    axis=(1, 3)
                )
            planes.append(np.round(chroma).astype(np.uint8))
        samp = [(sh, sv), (1, 1), (1, 1)]
        qsel = [0, 1, 1]
    else:
        planes = [img]
        samp = [(1, 1)]
        qsel = [0]

    qz = [_QUANT_LUMA.ravel()[ZIGZAG].astype(np.int32),
          _QUANT_CHROMA.ravel()[ZIGZAG].astype(np.int32)]
    out = bytearray(b"\xff\xd8")
    for tq, qt in enumerate(qz[: 2 if not gray else 1]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
        out += bytes(int(v) for v in qt)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * len(planes), 8, h, w,
                             len(planes))
    for i, ((sh, sv), tq) in enumerate(zip(samp, qsel)):
        out += bytes([i + 1, (sh << 4) | sv, tq])
    for tc_th, counts, symbols in (
        ((0 << 4) | 0, _DC_COUNTS, _DC_SYMBOLS),
        ((1 << 4) | 0, _AC_COUNTS, _AC_SYMBOLS),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 2 + 1 + 16 + sum(counts)
        ) + bytes([tc_th]) + bytes(counts) + bytes(symbols)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    if not progressive:
        out += b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(planes), len(planes)
        )
        for i in range(len(planes)):
            out += bytes([i + 1, 0x00])  # DC table 0, AC table 0
        out += bytes([0, 63, 0])

    # per-component zigzag blocks over the padded MCU grid
    comp_blocks = []
    if len(planes) == 1:
        mcus_x = -(-w // 8)
        mcus_y = -(-h // 8)
        comp_blocks.append(
            (_quantize_blocks(planes[0], qz[0]), mcus_x, 1, 1)
        )
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        for plane, (sh, sv), tq in zip(planes, samp, qsel):
            gw, gh = mcus_x * sh, mcus_y * sv
            ph, pw = gh * 8, gw * 8
            p = np.pad(
                plane,
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            comp_blocks.append((_quantize_blocks(p, qz[tq]), gw, sh, sv))

    n_mcus = mcus_x * mcus_y
    if progressive:
        # scan 1: DC of every component (interleaved MCU walk for >1)
        out += b"\xff\xda" + struct.pack(
            ">HB", 6 + 2 * len(planes), len(planes)
        )
        for i in range(len(planes)):
            out += bytes([i + 1, 0x00])
        out += bytes([0, 0, 0])  # Ss=0 Se=0 Ah=Al=0
        bw = _BitWriter()
        preds = [0] * len(planes)
        for mcu in range(n_mcus):
            my, mx = divmod(mcu, mcus_x)
            for ci, (zz, gw, sh, sv) in enumerate(comp_blocks):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * gw + (mx * sh + bx)
                        preds[ci] = _encode_dc(bw, int(zz[bi][0]), preds[ci])
        bw.flush()
        out += bw.out
        # scans 2..: one full-band AC scan per component, over the
        # component's own un-padded block dims (T.81: non-interleaved
        # scans carry no MCU padding)
        for ci, (zz, gw, sh, sv) in enumerate(comp_blocks):
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes([ci + 1, 0x00, 1, 63, 0])
            cw = -(-w * sh // hmax)
            chh = -(-h * sv // vmax)
            sbw, sbh = -(-cw // 8), -(-chh // 8)
            bw = _BitWriter()
            for row in range(sbh):
                for col in range(sbw):
                    _encode_ac(bw, zz[row * gw + col])
            bw.flush()
            out += bw.out
        out += b"\xff\xd9"
        return bytes(out)

    bw = _BitWriter()
    preds = [0] * len(planes)
    for mcu in range(n_mcus):
        if restart and mcu and mcu % restart == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((mcu // restart - 1) % 8)])
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcus_x)
        for ci, (zz, gw, sh, sv) in enumerate(comp_blocks):
            for by in range(sv):
                for bx in range(sh):
                    bi = (my * sv + by) * gw + (mx * sh + bx)
                    preds[ci] = _encode_block(bw, zz[bi], preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
