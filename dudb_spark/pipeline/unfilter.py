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
  All images in a decode batch advance in lockstep (their diagonal-d
  cells are one contiguous block), which amortizes numpy dispatch over
  the whole batch instead of one 3-element pixel.  Cell positions are
  ANALYTIC (diagonal lengths are closed-form), so there is no argsort;
  neighbor positions come from the identity left_pos = up_pos + 1
  (left and up sit adjacently in the previous diagonal's block).

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


def _unfilter_wavefront(items: list[tuple]) -> list[np.ndarray]:
    """Batched exact unfilter for images containing Average/Paeth rows.
    ``items``: (ftypes, data, h, w, ch) per image; returns (h, stride)
    uint8 arrays in item order.  See module docstring for the scheme.

    Layout is built vectorized per same-shape run (images are regrouped
    by shape first — output order is restored by index), and the scan
    works on uint8 state with preallocated int16 scratch, so both
    phases run at memory bandwidth rather than allocator speed."""
    groups: dict[int, list[int]] = {}
    for j, it in enumerate(items):
        groups.setdefault(it[4], []).append(j)
    results: list[np.ndarray | None] = [None] * len(items)
    for ch, idxs in groups.items():
        # same-shape images adjacent -> one vectorized build per shape
        idxs = sorted(idxs, key=lambda j: (items[j][2], items[j][3]))
        metas = [items[j] for j in idxs]
        J = len(metas)
        max_d = max(h + w - 1 for _, _, h, w, _ in metas)
        # diagonal lengths are closed-form; global layout = per diagonal,
        # images in fixed order, each image's cells ordered by row
        counts = np.zeros((J, max_d), np.int64)
        for ji, (_, _, h, w, _) in enumerate(metas):
            dd = np.arange(h + w - 1)
            counts[ji, : h + w - 1] = (
                np.minimum(dd, h - 1) - np.maximum(0, dd - w + 1) + 1
            )
        diag_start = np.concatenate(([0], np.cumsum(counts.sum(axis=0))))
        img_off = np.cumsum(counts, axis=0) - counts
        total = int(diag_start[-1])
        # cell `total` is a zero SENTINEL: boundary cells (row 0 / col 0)
        # aim their missing-neighbor positions at it, so the scan needs
        # no existence masks at all — gathers read 0 naturally
        ptype = np.int32 if total + 1 < 2**31 else np.int64
        counts = counts.astype(ptype)
        diag_start_p = diag_start.astype(ptype)
        img_off = img_off.astype(ptype)
        raw_s = np.empty((total, ch), np.uint8)
        f_s = np.empty(total, np.int8)
        up_pos = np.empty(total, ptype)
        left_pos = np.empty(total, ptype)
        ul_pos = np.empty(total, ptype)
        out_pos = []
        ji = 0
        while ji < J:
            # run of same-shape images: shared grid, per-image offsets
            _, _, h, w, _ = metas[ji]
            je = ji + 1
            while je < J and metas[je][2] == h and metas[je][3] == w:
                je += 1
            K = je - ji
            r_ix, p_ix = np.indices((h, w), dtype=ptype)
            r_f = r_ix.ravel()
            p_f = p_ix.ravel()
            d = r_f + p_f
            cnt_d = counts[ji, d]  # same for the whole run
            pos0 = (
                diag_start_p[d]
                + img_off[ji, d]
                + (r_f - np.maximum(0, d - w + 1))
            )
            d1 = np.maximum(d - 1, 0)
            up0 = diag_start_p[d1] + img_off[ji, d1] + (
                r_f - 1 - np.maximum(0, d - w)
            )
            cnt_d1 = counts[ji, d1]
            d2 = np.maximum(d - 2, 0)
            ul0 = diag_start_p[d2] + img_off[ji, d2] + (
                r_f - 1 - np.maximum(0, d - 1 - w)
            )
            cnt_d2 = counts[ji, d2]
            has_u0 = r_f > 0
            has_l0 = p_f > 0
            # fuse the sentinel into the per-cell BASE vectors (h*w-sized,
            # cheap): masked cells get base=total with a zeroed per-image
            # stride, so base + k*stride == total for every image — no
            # (K, h*w)-sized mask/where is ever materialized
            up0m = np.where(has_u0, up0, total)
            cnt1m = np.where(has_u0, cnt_d1, 0)
            left0m = np.where(has_l0, up0 + 1, total)
            cnt1l = np.where(has_l0, cnt_d1, 0)
            ulok = has_u0 & has_l0
            ul0m = np.where(ulok, ul0, total)
            cnt2m = np.where(ulok, cnt_d2, 0)
            ks = np.arange(K, dtype=ptype)[:, None]
            pos = pos0[None, :] + ks * cnt_d[None, :]
            flat = pos.ravel()
            up_pos[flat] = (up0m[None, :] + ks * cnt1m[None, :]).ravel()
            # left sits one past up in the previous diagonal's block
            left_pos[flat] = (left0m[None, :] + ks * cnt1l[None, :]).ravel()
            ul_pos[flat] = (ul0m[None, :] + ks * cnt2m[None, :]).ravel()
            raw_s[flat] = np.stack(
                [m[1].reshape(h * w, ch) for m in metas[ji:je]]
            ).reshape(K * h * w, ch)
            f_s[flat] = np.stack(
                [
                    np.repeat(m[0].astype(np.int8), w)
                    for m in metas[ji:je]
                ]
            ).ravel()
            for k in range(K):
                out_pos.append(pos[k])
            ji = je
        if np.any((f_s < 0) | (f_s > 4)):
            raise ValueError("bad PNG filter type")
        recon = np.zeros((total + 1, ch), np.uint8)  # +1 = zero sentinel
        # which filters appear on each diagonal (drives the minimal
        # predictor computation per step)
        dstarts = diag_start[:-1]
        fmax = np.maximum.reduceat(f_s, dstarts)
        fmin = np.minimum.reduceat(f_s, dstarts)
        # preallocated int16 scratch, sliced per diagonal
        B = int((diag_start[1:] - diag_start[:-1]).max())
        s_up = np.empty((B, ch), np.int16)
        s_left = np.empty((B, ch), np.int16)
        s_ul = np.empty((B, ch), np.int16)
        s_p = np.empty((B, ch), np.int16)
        s_a = np.empty((B, ch), np.int16)
        s_b = np.empty((B, ch), np.int16)
        s_c = np.empty((B, ch), np.int16)
        for dd in range(max_d):
            s, e = int(diag_start[dd]), int(diag_start[dd + 1])
            L = e - s
            sl = slice(s, e)
            lo, hi = int(fmin[dd]), int(fmax[dd])
            if hi == 0:  # whole diagonal is filter None
                recon[sl] = raw_s[sl]
                continue
            up = s_up[:L]
            up[:] = recon[up_pos[sl]]       # uint8 gather, int16 store
            left = s_left[:L]
            left[:] = recon[left_pos[sl]]
            if hi >= 3:
                ul = s_ul[:L]
                ul[:] = recon[ul_pos[sl]]
                # Paeth predictor (exact): p = left+up-ul, nearest of the
                # three with ties left > up > ul
                p = s_p[:L]
                np.add(left, up, out=p)
                p -= ul
                pa = s_a[:L]
                np.subtract(p, left, out=pa)
                np.abs(pa, out=pa)
                pb = s_b[:L]
                np.subtract(p, up, out=pb)
                np.abs(pb, out=pb)
                pc = s_c[:L]
                np.subtract(p, ul, out=pc)
                np.abs(pc, out=pc)
                pr = np.where(
                    (pa <= pb) & (pa <= pc),
                    left,
                    np.where(pb <= pc, up, ul),
                )
                avg = np.add(left, up, out=p)  # reuse p scratch
                avg >>= 1
                if lo == 4 and hi == 4:
                    pred = pr
                elif lo == 3 and hi == 3:
                    pred = avg
                else:
                    f = f_s[sl][:, None]
                    pred = np.where(f == 3, avg, pr)
                    if lo <= 2:
                        pred = np.where(
                            f == 0,
                            0,
                            np.where(f == 1, left, np.where(f == 2, up, pred)),
                        )
            else:
                if lo == 1 and hi == 1:
                    pred = left
                elif lo == 2 and hi == 2:
                    pred = up
                else:
                    f = f_s[sl][:, None]
                    pred = np.where(f == 0, 0, np.where(f == 1, left, up))
            pred += raw_s[sl]       # int16 += uint8
            pred &= 0xFF
            recon[sl] = pred        # cast back to uint8 state
        for ji, j in enumerate(idxs):
            _, _, h, w, _ = metas[ji]
            results[j] = recon[out_pos[ji]].reshape(h, w * ch)
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
        # the wavefront's vectorized build/scan only amortizes past a few
        # thousand cells; a lone thumbnail is faster through the per-pixel
        # kernel (both paths are fuzz-pinned identical)
        if wave_cells < 4096:
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
