"""Perceptual average-hash (aHash) over images — vectorized, batch-first.

phash(image) = 64-bit hash: grayscale → 8×8 area-downsample → bit i,j set
iff cell mean > global mean of the 64 cell means; bits packed row-major,
MSB first, reinterpreted as signed int64 (the table's ``phash:int64``
column, BASELINE.json:15).

Operates on a whole batch (n, h, w, 3) at once — the hot path never
loops over pixels in Python.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ahash64_batch", "ahash64"]

_BITS = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))  # MSB-first


def _downsample_mean(gray: np.ndarray, out: int = 8) -> np.ndarray:
    """(n, h, w) → (n, out, out) by area mean.  h, w need not divide `out`
    evenly: cells are index ranges of near-equal size (np.add.reduceat)."""
    n, h, w = gray.shape
    if h % out == 0 and w % out == 0:
        bh, bw = h // out, w // out
        return gray.reshape(n, out, bh, out, bw).mean(axis=(2, 4))
    ri = (np.arange(out) * h) // out
    ci = (np.arange(out) * w) // out
    s = np.add.reduceat(np.add.reduceat(gray, ri, axis=1), ci, axis=2)
    rc = np.diff(np.append(ri, h)).reshape(1, out, 1)
    cc = np.diff(np.append(ci, w)).reshape(1, 1, out)
    return s / (rc * cc)


def ahash64_batch(pixels: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n,) int64 average-hash."""
    gray = pixels.astype(np.float64).mean(axis=3)
    cells = _downsample_mean(gray, 8)  # (n, 8, 8)
    means = cells.mean(axis=(1, 2), keepdims=True)
    bits = (cells > means).reshape(len(pixels), 64)
    h = (bits.astype(np.uint64) * _BITS).sum(axis=1, dtype=np.uint64)
    return h.view(np.int64)


def ahash64(pixels: np.ndarray) -> int:
    return int(ahash64_batch(pixels[None, ...])[0])
