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


def _resample_axis(a: np.ndarray, out: int, axis: int) -> np.ndarray:
    """Resample one axis to length ``out``: area mean over near-equal
    index ranges when the axis is long enough (np.add.reduceat),
    nearest-center gather when the axis is SHORTER than ``out`` (a
    repeated-index reduceat would make empty cells → div-by-zero)."""
    size = a.shape[axis]
    if size >= out:
        idx = (np.arange(out) * size) // out
        s = np.add.reduceat(a, idx, axis=axis)
        cnt = np.diff(np.append(idx, size)).astype(np.float64)
        shape = [1] * a.ndim
        shape[axis] = out
        return s / cnt.reshape(shape)
    centers = np.minimum(((np.arange(out) + 0.5) * size / out).astype(
        np.int64), size - 1)
    return np.take(a, centers, axis=axis)


def _downsample_mean(gray: np.ndarray, out: int = 8) -> np.ndarray:
    """(n, h, w) → (n, out, out) by area mean (nearest-center gather on
    any axis shorter than ``out``)."""
    n, h, w = gray.shape
    if h % out == 0 and w % out == 0 and h >= out and w >= out:
        bh, bw = h // out, w // out
        return gray.reshape(n, out, bh, out, bw).mean(axis=(2, 4))
    return _resample_axis(_resample_axis(gray, out, 1), out, 2)


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


def dhash64_batch(pixels: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n,) int64 difference-hash: grayscale →
    8×9 area-downsample → bit (i, j) set iff cell[i, j+1] > cell[i, j]
    (the imagehash convention).  Row-adjacent gradients make dhash
    invariant to global brightness/contrast shifts that flip ahash
    bits."""
    gray = pixels.astype(np.float64).mean(axis=3)
    n = len(gray)
    cells = _resample_axis(_resample_axis(gray, 8, 1), 9, 2)  # (n, 8, 9)
    bits = (cells[:, :, 1:] > cells[:, :, :-1]).reshape(n, 64)
    hsh = (bits.astype(np.uint64) * _BITS).sum(axis=1, dtype=np.uint64)
    return hsh.view(np.int64)


def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n, n): row k is the k-th cosine."""
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (x + 0.5) * k / n)
    C[0] *= 1.0 / np.sqrt(2.0)
    return C


_DCT32 = _dct_basis(32)


def phash_dct64_batch(pixels: np.ndarray) -> np.ndarray:
    """(n, h, w, 3) uint8 → (n,) int64 DCT perceptual hash (the classic
    pHash): grayscale → 32×32 area-downsample → 2-D DCT-II → top-left
    8×8 low-frequency block → bit set iff coefficient > block median
    (imagehash convention).  The DCT is two batched GEMMs against a
    precomputed orthonormal basis — no scipy, no per-image loop.
    Robust to resizing/blur/brightness; pairs with the same
    hamming-band near-dup machinery as ahash/dhash."""
    gray = pixels.astype(np.float64).mean(axis=3)
    cells = _downsample_mean(gray, 32)  # (n, 32, 32)
    # DCT2(G) = C @ G @ C.T, batched over n
    d = np.einsum("ij,njk,lk->nil", _DCT32, cells, _DCT32, optimize=True)
    low = d[:, :8, :8].reshape(len(gray), 64)
    med = np.median(low, axis=1, keepdims=True)
    bits = low > med
    hsh = (bits.astype(np.uint64) * _BITS).sum(axis=1, dtype=np.uint64)
    return hsh.view(np.int64)


__all__ += ["dhash64_batch", "phash_dct64_batch"]
