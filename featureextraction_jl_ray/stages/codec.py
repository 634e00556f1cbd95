"""Image payload codec + pixel-feature stages (SURVEY.md §2-B S6/M5/M6,
ST3) — actor-pool ``map_batches`` stages over the images table's
``(bytes, w, h, fmt)`` columns.

Formats:
- ``raw``  — w·h·3 uint8 RGB row-major, lossless (the test fixtures'
  format; decode∘encode is exact, so the PSNR≥40dB gate of
  BASELINE.json:15 is trivially ∞).
- ``png``/``jpeg`` — require an imaging library that is NOT in this
  container; the stage raises NotImplementedError with a clear message
  (import-gated, per the task's stub policy).  The Ray-side plumbing
  (schema, batching, actor pool) is identical and fully tested via raw.

PSNR: 10·log10(255² / MSE) on decoded uint8 pixels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.phash import ahash64_batch
from ..functions.veccol import numpy_to_fixed_list_column

__all__ = ["DecodeImages", "psnr", "decode_batch", "with_pixel_features"]

try:  # pragma: no cover - PIL absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images (dB; ∞ if equal)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def decode_batch(batch: pa.Table) -> np.ndarray:
    """Decode a batch with UNIFORM (w, h, fmt) → (n, h, w, 3) uint8.

    Uniform dims are a hard requirement HERE; ``DecodeImages.__call__``
    handles mixed-dim batches by grouping rows per (w, h) and calling
    this per group (vectorized within each group).
    """
    fmts = batch.column("fmt").to_pylist()
    if any(f != "raw" for f in fmts):
        if not _HAVE_PIL:
            raise NotImplementedError(
                "non-'raw' image formats need an imaging library (PIL) that "
                "is not installed in this environment; plumbing is format-"
                "agnostic — install pillow to enable png/jpeg"
            )
        raise NotImplementedError("png/jpeg decode path not yet wired")
    w = batch.column("w").to_numpy(zero_copy_only=False)
    h = batch.column("h").to_numpy(zero_copy_only=False)
    if not ((w == w[0]).all() and (h == h[0]).all()):
        raise ValueError("decode_batch requires uniform dims within a batch")
    payload = batch.column("bytes").combine_chunks()
    n = len(payload)
    row_bytes = int(h[0]) * int(w[0]) * 3
    # BinaryArray buffers: [validity, offsets(int32), data] — rows are
    # stored back-to-back, so one zero-copy frombuffer covers the batch
    off_dtype = np.int64 if pa.types.is_large_binary(payload.type) else np.int32
    offsets = np.frombuffer(
        payload.buffers()[1],
        dtype=off_dtype,
        count=n + 1,
        offset=payload.offset * off_dtype().itemsize,
    )
    if offsets[-1] - offsets[0] != n * row_bytes:
        raise ValueError("payload length does not match w*h*3 for fmt='raw'")
    buf = np.frombuffer(
        payload.buffers()[2], dtype=np.uint8, count=n * row_bytes, offset=int(offsets[0])
    )
    return buf.reshape(n, int(h[0]), int(w[0]), 3)


def encode_raw(pixels: np.ndarray) -> list[bytes]:
    return [p.tobytes() for p in pixels]


class DecodeImages:
    """Actor-pool stage: decode + downsampled pixel feature vector (+
    optional phash verification against the stored column).

    Feature = area-mean downsample of RGB to (grid × grid × 3), scaled to
    [0, 1] float32 — the projected p-dim vector the PCA fit/transform
    consumes (SURVEY.md §7: "keep the fit path on projected p-dim
    vectors, never raw pixels at full p").
    """

    def __init__(
        self,
        grid: int = 8,
        feature_col: str = "pix",
        verify_phash: bool = False,
        drop_bytes: bool = True,
    ):
        self._grid = grid
        self._feature_col = feature_col
        self._verify_phash = verify_phash
        self._drop_bytes = drop_bytes

    def _featurize(self, pix: np.ndarray) -> np.ndarray:
        """(n, h, w, 3) uint8 → (n, g·g·3) float32 area-mean features."""
        n, h, w, _ = pix.shape
        g = self._grid
        gray = pix.astype(np.float32)
        if h % g == 0 and w % g == 0:
            feat = gray.reshape(n, g, h // g, g, w // g, 3).mean(axis=(2, 4))
        else:
            ri = (np.arange(g) * h) // g
            ci = (np.arange(g) * w) // g
            s = np.add.reduceat(np.add.reduceat(gray, ri, axis=1), ci, axis=2)
            rc = np.diff(np.append(ri, h)).reshape(1, g, 1, 1)
            cc = np.diff(np.append(ci, w)).reshape(1, 1, g, 1)
            feat = s / (rc * cc)
        return (feat / np.float32(255.0)).reshape(n, g * g * 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        g = self._grid
        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        if n == 0:
            feat = np.empty((0, g * g * 3), dtype=np.float32)
            computed = np.empty(0, dtype=np.int64)
        elif (w == w[0]).all() and (h == h[0]).all():
            pix = decode_batch(batch)
            feat = self._featurize(pix)
            computed = ahash64_batch(pix) if self._verify_phash else None
        else:
            # heterogeneous dims: decode per (w, h) group — vectorized
            # within each group — and scatter results back to row order
            feat = np.empty((n, g * g * 3), dtype=np.float32)
            computed = np.empty(n, dtype=np.int64) if self._verify_phash else None
            keys = (w.astype(np.int64) << np.int64(32)) | h.astype(np.int64)
            for kv in np.unique(keys):
                idx = np.nonzero(keys == kv)[0]
                sub = batch.take(pa.array(idx))
                pix = decode_batch(sub)
                feat[idx] = self._featurize(pix)
                if computed is not None:
                    computed[idx] = ahash64_batch(pix)
        out = batch.append_column(
            self._feature_col, numpy_to_fixed_list_column(feat, pa.float32())
        )
        if self._verify_phash:
            stored = batch.column("phash").to_numpy(zero_copy_only=False)
            out = out.append_column(
                "phash_ok", pa.array(computed == stored, type=pa.bool_())
            )
        if self._drop_bytes:
            out = out.drop_columns(["bytes"])
        return out


def with_pixel_features(
    ds,
    *,
    grid: int = 8,
    feature_col: str = "pix",
    verify_phash: bool = False,
    drop_bytes: bool = True,
    concurrency=None,
    batch_size: int | None = 1024,
):
    """Images ds → + float32 feature vector column.

    Decode holds no model state, so the default is STATELESS TASKS
    (``concurrency=None``): the scheduler runs exactly as many as there
    are free CPUs — no actor-pool sizing to get wrong, no idle
    processes competing with the shuffle (a 32-actor decode pool next
    to a 32-actor transform pool oversubscribed a 32-core box 2×).
    Pass an int/tuple to force an actor pool (e.g. when a future codec
    needs per-worker buffers, SURVEY.md ST3).  Small batches because
    `bytes` rows are wide (SURVEY.md §4 memory row).
    """
    kwargs = {
        "grid": grid,
        "feature_col": feature_col,
        "verify_phash": verify_phash,
        "drop_bytes": drop_bytes,
    }
    if concurrency is None:
        stage = DecodeImages(**kwargs)  # stateless: shared callable is fine

        def fn(batch: pa.Table) -> pa.Table:
            return stage(batch)

        return ds.map_batches(
            fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return ds.map_batches(
        DecodeImages,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
