"""Vectorized PNG scanline unfiltering (numpy), plus the round-4
pure-Python kernel kept as the bit-exactness oracle and bench baseline.

The PNG filter recurrence is sequential in BOTH directions — pixel i
needs reconstructed pixel i-1 (Sub/Average/Paeth) and row r needs
reconstructed row r-1 (Up/Average/Paeth) — so a naive numpy port can't
vectorize the hot filters.  Two exact strategies recover columnar speed:

- **Run-grouped rows** (`_unfilter_simple`): images whose rows only use
  filters None/Sub/Up.  A run of Up rows is a modular prefix sum over
  rows (``np.add.accumulate`` with dtype=uint8 wraps mod 256 — exactly
  the PNG arithmetic); a Sub row is the same accumulate across pixels;
  None rows are copies.  ~20× the Python kernel.
- **Batched anti-diagonal wavefront** (`_unfilter_wavefront`): for
  images with Average/Paeth rows.  Cell (row, px) depends on (row,
  px-1), (row-1, px), (row-1, px-1) — all on earlier anti-diagonals
  d = row + px, so every cell on diagonal d is computable at step d.
  Same-shape images advance in lockstep through the uniform kernel
  (`_unfilter_wavefront_uniform`): neighbor loads are closed-form
  SLICES of zero-padded rolling buffers holding the previous two
  diagonals — no index arrays, no gathers, no boundary masks — and the
  predictor math is presence-gated per diagonal and runs in
  preallocated scratch.  Throughput is capped by one ufunc dispatch
  round per diagonal (the left-neighbor dependency is fundamental);
  batching K images widens each diagonal K-fold, which is the lever
  that matters inside an Arrow batch.

Both paths are fuzz-pinned bit-identical to the Python kernel
(tests/test_pipeline.py) — the arithmetic is exact mod-256 integer
work, no floats.

At 100 TB this kernel sits inside the Arrow ``mapInPandas`` decode
stage (multimodal.decode_media): one wavefront per Arrow batch, so
throughput scales with batch size, and executors stay columnar
end-to-end.  When Pillow is installed, multimodal.py routes around
this module entirely (real C codecs); this is the dependency-free
floor, not the ceiling.
"""

from __future__ import annotations

import numpy as np


def unfilter_rows_py(raw: bytes, h: int, w: int, ch: int) -> list[bytes]:
    """The round-4 per-pixel Python kernel — kept as the correctness
    oracle for the vectorized paths and as the bench's r4 baseline."""
    stride = w * ch
    prev = bytearray(stride)
    out = []
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
        out.append(bytes(line))
        prev = line
    return out


def _split_scanlines(raw: bytes, h: int, stride: int):
    """(filter types, filtered data rows) from the inflated stream."""
    arr = np.frombuffer(raw, np.uint8)[: h * (stride + 1)].reshape(
        h, stride + 1
    )
    return arr[:, 0], arr[:, 1:]


def _unfilter_simple(
    ftypes: np.ndarray, data: np.ndarray, ch: int
) -> np.ndarray:
    """Exact unfilter for rows using only None/Sub/Up, via modular
    (uint8-wrapping) accumulates over row runs.  Returns (h, stride)."""
    h, stride = data.shape
    recon = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    fl = ftypes.tolist()
    r = 0
    while r < h:
        f = fl[r]
        if f == 2:
            # run of Up rows: recon[r..e] = prev + cumsum of data rows
            e = r + 1
            while e < h and fl[e] == 2:
                e += 1
            blk = np.add.accumulate(data[r:e], axis=0, dtype=np.uint8)
            blk += prev
            recon[r:e] = blk
            r = e
        elif f == 0:
            e = r + 1
            while e < h and fl[e] == 0:
                e += 1
            recon[r:e] = data[r:e]
            r = e
        elif f == 1:
            # Sub: per-channel prefix sum across the row, mod 256
            recon[r] = np.add.accumulate(
                data[r].reshape(-1, ch), axis=0, dtype=np.uint8
            ).reshape(stride)
            r += 1
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = recon[r - 1]
    return recon


_GEOM_CACHE: dict = {}


def _diag_geometry(h: int, w: int):
    """Cached diagonal geometry for a (h, w) shape: the row-major →
    diagonal-major permutation, per-diagonal extents, and the row
    windows.  Media corpora repeat a handful of shapes (thumbnails,
    tiles, fixed-resolution frames), and this int64 index arithmetic is
    several passes over h·w — more memory traffic than the uint8 pixel
    data itself — so it is built once per shape per process."""
    g = _GEOM_CACHE.get((h, w))
    if g is not None:
        return g
    D = h + w - 1
    dd = np.arange(D)
    r0 = np.maximum(0, dd - w + 1)
    r1 = np.minimum(dd, h - 1)
    cnt = r1 - r0 + 1
    dstart = np.concatenate(([0], np.cumsum(cnt)))
    r_ix, p_ix = np.indices((h, w), dtype=np.int64)
    d_of = (r_ix + p_ix).ravel()
    # int32: fancy-index scatter/gather with 4-byte indices runs
    # measurably faster than int64 and no image approaches 2**31 cells
    idx = (dstart[d_of] + (r_ix.ravel() - r0[d_of])).astype(np.int32)
    if len(_GEOM_CACHE) > 64:
        _GEOM_CACHE.clear()
    g = (idx, dstart, int(cnt.max()), r0, r1)
    _GEOM_CACHE[(h, w)] = g
    return g


def _unfilter_wavefront_uniform(
    ftypes: np.ndarray, data: np.ndarray, h: int, w: int, ch: int
) -> np.ndarray:
    """Batched exact wavefront over K same-shape images — (K, h) filter
    types and (K, h, w*ch) filtered rows in, (K, h, w*ch) pixels out.

    Same anti-diagonal dependency argument as the general wavefront, but
    uniform shape makes every neighbor position a closed-form SLICE of
    the previous diagonal's block instead of a gather: on diagonal d the
    up/left/ul neighbors of the cells (ordered by row) are contiguous
    runs of diagonals d-1 / d-2, offset by {0,1,2} depending on whether
    the diagonal has entered the r0 = d-w+1 regime.  The previous two
    diagonals live in zero-PADDED rolling buffers, so boundary cells
    (row 0 / column 0) read the pad's zeros and no masks or index
    arrays exist at all.  Predictor math is presence-gated per diagonal
    (a diagonal with no Paeth rows never pays the Paeth compare chain)
    and runs entirely in preallocated scratch.

    Per-diagonal filter statistics come from PER-ROW class counts (a
    cell's filter is its row's filter, and a diagonal covers the row
    window [r0, r1]): five h-length prefix sums replace four reduceat
    passes over all h·w cells, and the mixed-diagonal per-cell masks
    slice row windows of the (K, h) filter map — cell j of diagonal d
    sits in row r0+j — so no diagonal-major filter permutation exists
    at all."""
    K = data.shape[0]
    D = h + w - 1
    cells = data.reshape(K, h * w, ch)
    idx, dstart, B, r0a, r1a = _diag_geometry(h, w)
    raw_d = np.empty((K, h * w, ch), np.uint8)
    raw_d[:, idx] = cells
    # per-diagonal class counts from per-row counts (see docstring)
    rowcnt = np.empty((5, h), np.int64)
    for f in range(5):
        rowcnt[f] = (ftypes == f).sum(axis=0)
    csum = np.concatenate(
        [np.zeros((5, 1), np.int64), np.cumsum(rowcnt, axis=1)], axis=1
    )
    nf = csum[:, r1a + 1] - csum[:, r0a]  # (5, D)
    present = nf > 0
    fs5 = np.arange(5)[:, None]
    fmax_l = np.where(present, fs5, -1).max(axis=0).tolist()
    fmin_l = np.where(present, fs5, 5).min(axis=0).tolist()
    n3_l = nf[3].tolist()
    n4_l = nf[4].tolist()
    # channel-expanded per-row filter map: mixed-diagonal masks compare
    # (K, L, ch) slices of this with out= scratch — a (K, L, 1) mask
    # broadcast against (K, L, ch) operands would collapse numpy's
    # inner loop to ch elements and dominate the whole kernel
    fmapc = np.repeat(ftypes.astype(np.int8)[:, :, None], ch, axis=2)
    # plain-python per-diagonal scalars: extracting numpy array scalars
    # inside the loop costs ~1 µs each × 6 × D, pure dispatch overhead
    dstart_l = dstart.tolist()
    r0_l = r0a.tolist()

    recon_d = np.empty((K, h * w, ch), np.uint8)
    # rolling zero-padded previous diagonals: block at [1 : 1+cnt],
    # slot 0 and 3 slots past the block stay zero for boundary reads.
    # int16, NOT uint8: the predictor math below feeds these straight
    # into subtract/add ufuncs, and numpy selects the loop from the
    # INPUT dtypes even when out= is wider — uint8 pads would wrap
    # mod 256 (Average's a+b sum, Paeth's signed differences) before
    # the cast to the int16 scratch ever happens.
    pad1 = np.zeros((K, B + 4, ch), np.int16)
    pad2 = np.zeros((K, B + 4, ch), np.int16)
    s_p = np.empty((K, B, ch), np.int16)
    s_a = np.empty((K, B, ch), np.int16)
    s_b = np.empty((K, B, ch), np.int16)
    s_c = np.empty((K, B, ch), np.int16)
    s_pred = np.empty((K, B, ch), np.int16)
    m1 = np.empty((K, B, ch), np.bool_)
    m2 = np.empty((K, B, ch), np.bool_)
    for d in range(D):
        s, e = dstart_l[d], dstart_l[d + 1]
        L = e - s
        r0 = r0_l[d]
        lo, hi = fmin_l[d], fmax_l[d]
        has3, has4 = bool(n3_l[d]), bool(n4_l[d])
        raw = raw_d[:, s:e]
        if hi == 0:  # whole diagonal unfiltered
            recon_d[:, s:e] = raw
        else:
            # neighbor VIEWS into the padded previous diagonals — the
            # alignment shifts by one once r0 = d-w+1 kicks in (up/left
            # from d-1), and by up to two for ul (d-2)
            off = 0 if d <= w - 1 else 1
            up = pad1[:, off: L + off]
            left = pad1[:, off + 1: L + off + 1]
            pred = s_pred[:, :L]
            if has4:
                ulo = 0 if d <= w - 1 else (1 if d == w else 2)
                ul = pad2[:, ulo: L + ulo]
                # p−a = b−c, p−b = a−c, p−c = (b−c)+(a−c): two subs and
                # an add replace the four subtractions via p
                pa = s_a[:, :L]
                np.subtract(up, ul, out=pa)
                pb = s_b[:, :L]
                np.subtract(left, ul, out=pb)
                pc = s_c[:, :L]
                np.add(pa, pb, out=pc)
                np.abs(pa, out=pa)
                np.abs(pb, out=pb)
                np.abs(pc, out=pc)
                # nearest-of-three with ties left > up > ul, built as
                # arithmetic BLENDS (pred += mask·(src − pred)): a
                # masked np.copyto(where=) drops to a per-element
                # fallback on a mixed mask (~9× the cost of these three
                # SIMD passes), so no masked copy appears anywhere here
                ma = m1[:, :L]
                mb = m2[:, :L]
                t = s_p[:, :L]
                np.less_equal(pb, pc, out=ma)  # up beats ul
                np.subtract(up, ul, out=t)
                np.multiply(t, ma, out=t)
                np.add(ul, t, out=pred)  # pred = ul + m·(up−ul)
                np.less_equal(pa, pb, out=ma)  # left beats both
                np.less_equal(pa, pc, out=mb)
                np.bitwise_and(ma, mb, out=ma)
                np.subtract(left, pred, out=t)
                np.multiply(t, ma, out=t)
                pred += t
                if has3:
                    p = s_c[:, :L]  # pc is dead now: avg scratch
                    np.add(left, up, out=p)
                    p >>= 1
                    np.equal(fmapc[:, r0: r0 + L], 3, out=ma)
                    np.subtract(p, pred, out=t)
                    np.multiply(t, ma, out=t)
                    pred += t
            elif has3:
                np.add(left, up, out=pred)
                pred >>= 1
            elif lo == hi == 1:
                pred[:] = left
            elif lo == hi == 2:
                pred[:] = up
            else:  # mixed None/Sub/Up only
                pred[:] = 0
            if lo <= 2 and not (lo == hi == 1) and not (lo == hi == 2):
                # rows with None/Sub/Up mixed into this diagonal:
                # overwrite their cells with the same blend trick
                # (pred already holds 0 for the pure-simple mixed case)
                frowc = fmapc[:, r0: r0 + L]
                ma = m1[:, :L]
                t = s_p[:, :L]
                if lo == 0 and (has3 or has4):
                    # zero the None-row cells: multiply by (f != 0)
                    np.not_equal(frowc, 0, out=ma)
                    np.multiply(pred, ma, out=pred)
                np.equal(frowc, 1, out=ma)
                np.subtract(left, pred, out=t)
                np.multiply(t, ma, out=t)
                pred += t
                np.equal(frowc, 2, out=ma)
                np.subtract(up, pred, out=t)
                np.multiply(t, ma, out=t)
                pred += t
            pred += raw
            # the int16 → uint8 store truncates mod 256 — exactly the
            # PNG wrap — so no explicit &= 0xFF pass is needed
            recon_d[:, s:e] = pred
        # roll the pads: current block becomes pad1, old pad1 -> pad2;
        # slot 0 and three slots past the block are re-zeroed so the
        # next diagonals' shifted views read zeros at the boundaries.
        # The block loads from the just-stored uint8 output (already
        # wrapped), not from the raw int16 pred.
        pad1, pad2 = pad2, pad1
        pad1[:, 1: 1 + L] = recon_d[:, s:e]
        pad1[:, 0] = 0
        pad1[:, 1 + L: 4 + L] = 0
    out = recon_d[:, idx]
    return out.reshape(K, h, w * ch)


def _unfilter_wavefront(items: list[tuple]) -> list[np.ndarray]:
    """Batched exact unfilter for images containing Average/Paeth rows.
    ``items``: (ftypes, data, h, w, ch) per image; returns (h, stride)
    uint8 arrays in item order.

    Images are grouped by exact shape and each group runs through the
    uniform-shape wavefront (:func:`_unfilter_wavefront_uniform`), whose
    neighbor loads are slices of zero-padded rolling diagonal buffers —
    no index arrays, no gathers.  Real media corpora repeat a handful of
    shapes (thumbnails, tiles, fixed-resolution frames), so grouping
    keeps the batch amortization of the original mixed-shape wavefront
    while removing its per-cell position bookkeeping.

    Smaller shapes EMBED into a larger group's canvas when the extra
    cells are cheap: a PNG cell depends only on cells above/left of it,
    so an image placed in the top-left corner of a larger (h, w) canvas
    — right columns zero-filled inside its own rows, bottom rows padded
    as filter-None zeros — reconstructs its region bit-identically, and
    the embedded image rides the big group's existing per-diagonal
    dispatches instead of paying its own h+w-1 rounds (ufunc dispatch,
    not element count, is what bounds small-group throughput)."""
    for ftypes, _, _, _, _ in items:
        mx, mn = int(ftypes.max()), int(ftypes.min())
        if mx > 4 or mn < 0:
            raise ValueError(f"bad PNG filter type {mx if mx > 4 else mn}")
    groups: dict[tuple, list[int]] = {}
    for j, (_, _, h, w, ch) in enumerate(items):
        groups.setdefault((h, w, ch), []).append(j)
    # embedding plan: host each group in the cheapest covering group
    # (same ch, h/w no larger) whose added element work stays below
    # half the host's own — dispatch savings dominate long before that
    host: dict[tuple, tuple] = {}
    by_cells = sorted(
        groups, key=lambda g: (g[0] * g[1], g[0], g[1]), reverse=True
    )
    for gi, small in enumerate(by_cells):
        hs, ws, chs = small
        best = None
        for big in by_cells[:gi]:
            hb, wb, chb = big
            if chb != chs or hb < hs or wb < ws or big in host:
                continue
            waste = (hb * wb - hs * ws) * len(groups[small])
            budget = hb * wb * len(groups[big])
            if waste <= budget // 2 and (best is None or waste < best[0]):
                best = (waste, big)
        if best is not None:
            host[small] = best[1]
    results: list[np.ndarray | None] = [None] * len(items)
    for big, idxs in groups.items():
        if big in host:
            continue
        hb, wb, chb = big
        members = [(j, big) for j in idxs] + [
            (j, small)
            for small, hg in host.items()
            if hg == big
            for j in groups[small]
        ]
        fts = np.zeros((len(members), hb), items[0][0].dtype)
        data = np.zeros((len(members), hb, wb * chb), np.uint8)
        for k, (j, (h, w, ch)) in enumerate(members):
            fts[k, :h] = items[j][0]
            data[k, :h, : w * ch] = items[j][1]
        recs = _unfilter_wavefront_uniform(fts, data, hb, wb, chb)
        for k, (j, (h, w, ch)) in enumerate(members):
            results[j] = (
                recs[k]
                if (h, w, ch) == big
                else np.ascontiguousarray(recs[k][:h, : w * ch])
            )
    return results


def unfilter_batch(
    images: list[tuple[bytes, int, int, int]]
) -> list[np.ndarray]:
    """Exact unfilter of a batch of inflated PNG streams.  Each item is
    (raw, h, w, ch); returns (h, w*ch) uint8 pixel arrays in order.
    Simple images (no Average/Paeth) take the run-grouped fast path;
    the rest share one batched wavefront."""
    results: list[np.ndarray | None] = [None] * len(images)
    wave, wave_idx, wave_cells = [], [], 0
    for j, (raw, h, w, ch) in enumerate(images):
        stride = w * ch
        if h == 0 or stride == 0:
            results[j] = np.zeros((h, stride), np.uint8)
            continue
        ftypes, data = _split_scanlines(raw, h, stride)
        if int(ftypes.max()) <= 2:
            results[j] = _unfilter_simple(ftypes, data, ch)
        else:
            wave.append((ftypes, data, h, w, ch))
            wave_idx.append(j)
            wave_cells += h * w
    if wave:
        # compiled per-pixel kernel when available (png_native.py — the
        # jpeg_native pattern: gcc at first use, cached by source hash,
        # bit-identical by construction and fuzz-pinned); the numpy
        # wavefront below remains the dependency-free exact floor
        from dudb_spark.pipeline import png_native

        lib = png_native.get_lib()
        if lib is not None:
            for j, (ftypes, data, h, w, ch) in zip(wave_idx, wave):
                mx = int(ftypes.max())
                if mx > 4:
                    raise ValueError(f"bad PNG filter type {mx}")
                results[j] = png_native.unfilter_image(
                    lib, images[j][0], h, w, ch
                )
        # the wavefront's vectorized build/scan only amortizes past a few
        # thousand cells; a lone thumbnail is faster through the per-pixel
        # kernel (both paths are fuzz-pinned identical)
        elif wave_cells < 4096:
            for j, (ftypes, data, h, w, ch) in zip(wave_idx, wave):
                raw, _, _, _ = images[j]
                rows = unfilter_rows_py(raw, h, w, ch)
                results[j] = np.frombuffer(
                    b"".join(rows), np.uint8
                ).reshape(h, w * ch)
        else:
            for j, rec in zip(wave_idx, _unfilter_wavefront(wave)):
                results[j] = rec
    return results


def unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Single-image convenience wrapper over :func:`unfilter_batch`."""
    return unfilter_batch([(raw, h, w, ch)])[0]
