"""Image payload codec + pixel-feature stages (SURVEY.md §2-B S6/M5/M6,
ST3) — actor-pool ``map_batches`` stages over the images table's
``(bytes, w, h, fmt)`` columns.

Formats:
- ``raw``  — w·h·3 uint8 RGB row-major, lossless (the test fixtures'
  format; decode∘encode is exact, so the PSNR≥40dB gate of
  BASELINE.json:15 is trivially ∞).
- ``png``/``jpeg`` — fully wired through PIL (per-row decode/encode in
  ``_decode_compressed`` / ``encode_images``) but import-gated: the
  library is NOT in this container, so without PIL the stage raises
  NotImplementedError with a clear message.  Activation tests in
  ``tests/test_optional_deps.py`` run the real path (png lossless
  round-trip, jpeg PSNR≥40dB) the moment pillow is installed.

PSNR: 10·log10(255² / MSE) on decoded uint8 pixels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.phash import ahash64_batch
from ..functions.veccol import numpy_to_fixed_list_column

__all__ = [
    "DecodeImages",
    "psnr",
    "decode_batch",
    "encode_images",
    "with_pixel_features",
    "resize_batch",
    "ResizeImages",
    "resize_images",
    "ImageStats",
    "with_image_stats",
    "SharpnessStats",
    "with_sharpness_stats",
    "HashImages",
    "with_image_hashes",
    "AugmentImages",
    "augment_images",
    "patchify_images",
    "ChannelStats",
    "fit_channel_stats",
]

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


def _decode_compressed(payload, fmts, w0: int, h0: int) -> np.ndarray:
    """PIL path: per-row decode of compressed payloads (+ raw fast rows).

    A Python loop is inherent here — png/jpeg streams decode one image
    at a time; the vectorized raw path below stays loop-free.
    """
    import io as _io

    from PIL import Image

    n = len(payload)
    out = np.empty((n, h0, w0, 3), dtype=np.uint8)
    row_bytes = h0 * w0 * 3
    for i in range(n):
        b = payload[i].as_py()
        if fmts[i] == "raw":
            out[i] = np.frombuffer(b, dtype=np.uint8, count=row_bytes).reshape(
                h0, w0, 3
            )
            continue
        with Image.open(_io.BytesIO(b)) as im:
            arr = np.asarray(im.convert("RGB"), dtype=np.uint8)
        if arr.shape != (h0, w0, 3):
            raise ValueError(
                f"decoded {fmts[i]} image is {arr.shape[1]}x{arr.shape[0]}, "
                f"metadata says {w0}x{h0}"
            )
        out[i] = arr
    return out


def decode_batch(batch: pa.Table) -> np.ndarray:
    """Decode a batch with UNIFORM (w, h) → (n, h, w, 3) uint8.

    Uniform dims are a hard requirement HERE; ``DecodeImages.__call__``
    handles mixed-dim batches by grouping rows per (w, h) and calling
    this per group (vectorized within each group).  ``fmt`` may be mixed:
    all-raw batches take the zero-copy vectorized path; batches with any
    compressed row decode via PIL (import-gated).
    """
    w = batch.column("w").to_numpy(zero_copy_only=False)
    h = batch.column("h").to_numpy(zero_copy_only=False)
    if len(w) == 0:
        return np.empty((0, 0, 0, 3), dtype=np.uint8)
    if not ((w == w[0]).all() and (h == h[0]).all()):
        raise ValueError("decode_batch requires uniform dims within a batch")
    fmts = batch.column("fmt").to_pylist()
    if any(f != "raw" for f in fmts):
        if not _HAVE_PIL:
            raise NotImplementedError(
                "non-'raw' image formats need an imaging library (PIL) that "
                "is not installed in this environment; plumbing is format-"
                "agnostic — install pillow to enable png/jpeg"
            )
        return _decode_compressed(
            batch.column("bytes").combine_chunks(), fmts, int(w[0]), int(h[0])
        )
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


def encode_images(pixels: np.ndarray, fmt: str = "raw", **save_kw) -> list[bytes]:
    """(n, h, w, 3) uint8 → payload bytes per row.  ``raw`` is the
    lossless row-major layout; ``png``/``jpeg`` go through PIL
    (import-gated).  ``save_kw`` forwards to ``PIL.Image.save`` (e.g.
    ``quality=95`` for jpeg — the PSNR≥40dB contract of BASELINE.json:15
    assumes a high-quality encode)."""
    if fmt == "raw":
        return encode_raw(pixels)
    if not _HAVE_PIL:
        raise NotImplementedError(
            f"encoding fmt={fmt!r} needs PIL (not installed); install "
            "pillow to enable png/jpeg"
        )
    import io as _io

    from PIL import Image

    out = []
    for p in pixels:
        b = _io.BytesIO()
        Image.fromarray(np.ascontiguousarray(p), "RGB").save(
            b, format=fmt.upper(), **save_kw
        )
        out.append(b.getvalue())
    return out


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
        channel_stats=None,
    ):
        self._grid = grid
        self._feature_col = feature_col
        self._verify_phash = verify_phash
        self._drop_bytes = drop_bytes
        self._cs = channel_stats

    def _featurize(self, pix: np.ndarray) -> np.ndarray:
        """(n, h, w, 3) uint8 → (n, g·g·3) float32 area-mean features.

        Default scaling is /255 to [0, 1]; with ``channel_stats`` (a
        corpus-level :func:`fit_channel_stats` result) each channel is
        standardized ``(x − mean)/std`` instead — the ImageNet-
        normalization convention, fitted on THIS corpus."""
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
        if self._cs is not None:
            mean, std = self._cs.mean, self._cs.std
            feat = (feat - mean.reshape(1, 1, 1, 3)) / std.reshape(1, 1, 1, 3)
            return feat.reshape(n, g * g * 3).astype(np.float32)
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
    channel_stats=None,
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
        "channel_stats": channel_stats,
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


class ChannelStats:
    """Corpus-level per-channel pixel statistics on the uint8 scale
    (``mean``/``std``: shape-(3,) float64; ``n_pixels``: total pixels).
    Tiny, picklable, broadcast-safe."""

    def __init__(self, mean: np.ndarray, std: np.ndarray, n_pixels: float):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.std = np.asarray(std, dtype=np.float64)
        self.n_pixels = float(n_pixels)

    def __repr__(self):
        return (f"ChannelStats(mean={self.mean.round(3).tolist()}, "
                f"std={self.std.round(3).tolist()}, "
                f"n_pixels={int(self.n_pixels)})")


def fit_channel_stats(ds, *, batch_size: int | None = 1024) -> ChannelStats:
    """Fit CORPUS-level per-channel pixel mean/std — the "compute the
    dataset's normalization constants" pass every image-training recipe
    runs once (the ImageNet-mean/std pattern), here distributed: each
    batch decodes and folds its pixels into one centered (n, mean, M2)
    partial per channel — a single 7-number row crosses the wire per
    batch — and the driver Chan-merges the ≤ num_batches partials.
    Centered partials, not raw sum/sumsq: no catastrophic cancellation
    at 10¹²-image pixel counts (the moments-layer convention,
    state/moments.py)."""

    def partial(batch: pa.Table) -> pa.Table:
        st = {"n": 0.0, "mean": np.zeros(3), "M2": np.zeros(3)}

        def per_group(pix, idx):
            p = pix.reshape(-1, 3).astype(np.float64)
            cn = float(p.shape[0])
            if cn == 0.0:
                return
            cm = p.mean(axis=0)
            cm2 = ((p - cm) ** 2).sum(axis=0)
            d = cm - st["mean"]
            tot = st["n"] + cn
            st["M2"] += cm2 + d * d * (st["n"] * cn / tot)
            st["mean"] += d * (cn / tot)
            st["n"] = tot

        _map_dim_groups(batch, per_group)
        return pa.table({
            "n": pa.array([st["n"]]),
            "mean": numpy_to_fixed_list_column(
                st["mean"].reshape(1, 3), pa.float64()),
            "m2": numpy_to_fixed_list_column(
                st["M2"].reshape(1, 3), pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=batch_size).to_pandas()
    n, mean, m2 = 0.0, np.zeros(3), np.zeros(3)
    for _, row in parts.iterrows():
        cn = float(row["n"])
        if cn == 0.0:
            continue
        cm = np.asarray(row["mean"], dtype=np.float64)
        cm2 = np.asarray(row["m2"], dtype=np.float64)
        d = cm - mean
        tot = n + cn
        m2 += cm2 + d * d * (n * cn / tot)
        mean += d * (cn / tot)
        n = tot
    if n == 0.0:
        raise ValueError("fit_channel_stats saw zero pixels")
    return ChannelStats(mean, np.sqrt(m2 / n), n)


def _map_dim_groups(batch: pa.Table, per_group):
    """Run ``per_group(pix, idx)`` once per uniform-(w, h) row group of
    ``batch`` (vectorized within each group), in row order when dims are
    already uniform.  Returns nothing; per_group scatters into
    caller-owned output arrays via ``idx``."""
    n = batch.num_rows
    if n == 0:
        return
    w = batch.column("w").to_numpy(zero_copy_only=False)
    h = batch.column("h").to_numpy(zero_copy_only=False)
    if (w == w[0]).all() and (h == h[0]).all():
        per_group(decode_batch(batch), np.arange(n))
        return
    keys = (w.astype(np.int64) << np.int64(32)) | h.astype(np.int64)
    for kv in np.unique(keys):
        idx = np.nonzero(keys == kv)[0]
        per_group(decode_batch(batch.take(pa.array(idx))), idx)


def resize_batch(pix: np.ndarray, out_w: int, out_h: int,
                 method: str = "bilinear") -> np.ndarray:
    """(n, h, w, 3) uint8 → (n, out_h, out_w, 3) uint8, fully vectorized.

    ``nearest``: sample at output-pixel centers.  ``bilinear``:
    half-pixel-center (align_corners=False) convention — the one PIL /
    OpenCV / torch default to — with edge clamping; rint-rounded back to
    uint8.
    """
    n, h, w, _ = pix.shape
    if method == "nearest":
        ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
        ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
        return pix[:, ri][:, :, ci]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    fx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0 = np.clip(np.floor(fy), 0, h - 1).astype(np.int64)
    x0 = np.clip(np.floor(fx), 0, w - 1).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0).astype(np.float32).reshape(1, -1, 1, 1)
    wx = np.clip(fx - x0, 0.0, 1.0).astype(np.float32).reshape(1, 1, -1, 1)
    p = pix.astype(np.float32)
    r0 = p[:, y0]           # (n, out_h, w, 3) — one row gather, reused
    r1 = p[:, y1]
    top = r0[:, :, x0] * (1.0 - wx) + r0[:, :, x1] * wx
    bot = r1[:, :, x0] * (1.0 - wx) + r1[:, :, x1] * wx
    out = top * (1.0 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


class ResizeImages:
    """Stage: decode → resize to a fixed (out_w, out_h) → re-encode raw.

    The standard corpus-prep step before batched model inference (every
    vision model wants one input size).  Mixed-dim batches resize per
    (w, h) group, vectorized within each group.  Output rows keep their
    schema with ``bytes``/``w``/``h`` replaced (fmt stays 'raw').
    """

    def __init__(self, out_w: int, out_h: int, method: str = "bilinear"):
        self._ow, self._oh, self._method = int(out_w), int(out_h), method

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = np.empty((n, self._oh, self._ow, 3), dtype=np.uint8)

        def per_group(pix, idx):
            out[idx] = resize_batch(pix, self._ow, self._oh, self._method)

        _map_dim_groups(batch, per_group)
        i = batch.schema.get_field_index("bytes")
        batch = batch.set_column(i, "bytes", pa.array(encode_raw(out), type=pa.binary()))
        batch = batch.set_column(
            batch.schema.get_field_index("w"), "w",
            pa.array(np.full(n, self._ow, dtype=np.int32)))
        return batch.set_column(
            batch.schema.get_field_index("h"), "h",
            pa.array(np.full(n, self._oh, dtype=np.int32)))


def resize_images(ds, *, out_w: int, out_h: int, method: str = "bilinear",
                  concurrency=None, batch_size: int | None = 512):
    """Images ds → same schema with every image resized to (out_w, out_h).

    Stateless by default (tasks); pass ``concurrency`` for an actor pool.
    Small batches — both the input AND output pixel payloads are live
    per batch.
    """
    stage = ResizeImages(out_w, out_h, method)
    if concurrency is None:
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(
        ResizeImages, fn_constructor_args=(out_w, out_h, method),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class ImageStats:
    """Stage: per-image channel means + luminance mean/std + quality
    flags (dark / bright / low-contrast) — the image analog of the text
    quality-scoring stage, for corpus filtering before training.
    """

    def __init__(self, dark: float = 32.0, bright: float = 224.0,
                 low_contrast: float = 8.0, drop_bytes: bool = True):
        self._dark, self._bright = dark, bright
        self._lc = low_contrast
        self._drop = drop_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ch_mean = np.empty((n, 3), dtype=np.float64)
        lum_mean = np.empty(n, dtype=np.float64)
        lum_std = np.empty(n, dtype=np.float64)

        def per_group(pix, idx):
            p = pix.astype(np.float64)
            ch_mean[idx] = p.mean(axis=(1, 2))
            # ITU-R BT.601 luma
            lum = p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114
            lum_mean[idx] = lum.mean(axis=(1, 2))
            lum_std[idx] = lum.std(axis=(1, 2))

        _map_dim_groups(batch, per_group)
        for name, arr in (("r_mean", ch_mean[:, 0]), ("g_mean", ch_mean[:, 1]),
                          ("b_mean", ch_mean[:, 2]), ("lum_mean", lum_mean),
                          ("lum_std", lum_std)):
            batch = batch.append_column(name, pa.array(arr))
        batch = batch.append_column("flag_dark", pa.array(lum_mean <= self._dark))
        batch = batch.append_column("flag_bright", pa.array(lum_mean >= self._bright))
        batch = batch.append_column("flag_low_contrast", pa.array(lum_std <= self._lc))
        if self._drop:
            batch = batch.drop_columns(["bytes"])
        return batch


def with_image_stats(ds, *, dark: float = 32.0, bright: float = 224.0,
                     low_contrast: float = 8.0, drop_bytes: bool = True,
                     concurrency=None, batch_size: int | None = 1024):
    """Images ds → + per-image channel/luminance stats and quality flags."""
    stage = ImageStats(dark, bright, low_contrast, drop_bytes)
    if concurrency is None:
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(
        ImageStats, fn_constructor_args=(dark, bright, low_contrast, drop_bytes),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class HashImages:
    """Stage: perceptual-hash columns per image — any subset of
    ``ahash`` (mean threshold), ``dhash`` (horizontal gradient,
    brightness-invariant), ``phash`` (32×32 DCT low-frequency, the
    classic pHash — robust to resize/blur).  All three are int64,
    band-compatible with the hamming near-dup machinery
    (``stages/dedup.py::hamming_near_dup_pairs``).  Vectorized per
    uniform-(w, h) row group; the DCT is two batched GEMMs."""

    _FNS = None  # resolved lazily (import order)

    def __init__(self, methods=("ahash", "dhash", "phash"),
                 drop_bytes: bool = True, prefix: str = ""):
        from ..functions.phash import (
            ahash64_batch,
            dhash64_batch,
            phash_dct64_batch,
        )

        table = {"ahash": ahash64_batch, "dhash": dhash64_batch,
                 "phash": phash_dct64_batch}
        unknown = set(methods) - set(table)
        if unknown:
            raise ValueError(f"unknown hash methods {sorted(unknown)}; "
                             f"pick from {sorted(table)}")
        self._methods = list(methods)
        self._fns = [table[m] for m in self._methods]
        self._drop = drop_bytes
        self._prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = [np.empty(n, dtype=np.int64) for _ in self._methods]

        def per_group(pix, idx):
            for o, fn in zip(out, self._fns):
                o[idx] = fn(pix)

        _map_dim_groups(batch, per_group)
        for name, arr in zip(self._methods, out):
            col = self._prefix + name
            if col in batch.schema.names:  # e.g. a precomputed phash column
                batch = batch.set_column(
                    batch.schema.get_field_index(col), col, pa.array(arr))
            else:
                batch = batch.append_column(col, pa.array(arr))
        if self._drop:
            batch = batch.drop_columns(["bytes"])
        return batch


def with_image_hashes(ds, *, methods=("ahash", "dhash", "phash"),
                      drop_bytes: bool = True, prefix: str = "",
                      concurrency=None, batch_size: int | None = 1024):
    """Images ds → + int64 perceptual-hash columns (ahash/dhash/phash)."""
    stage = HashImages(methods, drop_bytes, prefix)
    if concurrency is None:
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(
        HashImages, fn_constructor_args=(methods, drop_bytes, prefix),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class SharpnessStats:
    """Stage: per-image blur / exposure quality signals — the LAION-style
    image corpus filters:

    - ``sharpness``: variance of the 4-neighbor Laplacian of the BT.601
      luma (the classic "variance of Laplacian" blur detector; low =
      blurry / flat).  Images smaller than 3×3 have no interior → 0.0.
    - ``clip_dark_frac`` / ``clip_bright_frac``: fraction of pixels at
      the histogram ends (luma ≤ 2 / ≥ 253) — crushed-shadow /
      blown-highlight exposure clipping.
    - ``flag_blurry`` / ``flag_clipped``: threshold flags for a
      downstream corpus filter.

    Vectorized over each uniform-(w, h) row group: the Laplacian is four
    shifted-array subtractions on the (N, H, W) luma stack — no per-pixel
    Python, no convolution library."""

    def __init__(self, blur_threshold: float = 100.0,
                 clip_threshold: float = 0.3, drop_bytes: bool = True):
        self._blur = blur_threshold
        self._clip = clip_threshold
        self._drop = drop_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sharp = np.zeros(n, dtype=np.float64)
        dark = np.empty(n, dtype=np.float64)
        bright = np.empty(n, dtype=np.float64)

        def per_group(pix, idx):
            p = pix.astype(np.float64)
            lum = (p[..., 0] * 0.299 + p[..., 1] * 0.587
                   + p[..., 2] * 0.114)
            if lum.shape[1] >= 3 and lum.shape[2] >= 3:
                lap = (4.0 * lum[:, 1:-1, 1:-1]
                       - lum[:, :-2, 1:-1] - lum[:, 2:, 1:-1]
                       - lum[:, 1:-1, :-2] - lum[:, 1:-1, 2:])
                sharp[idx] = lap.var(axis=(1, 2))
            dark[idx] = (lum <= 2.0).mean(axis=(1, 2))
            bright[idx] = (lum >= 253.0).mean(axis=(1, 2))

        _map_dim_groups(batch, per_group)
        batch = batch.append_column("sharpness", pa.array(sharp))
        batch = batch.append_column("clip_dark_frac", pa.array(dark))
        batch = batch.append_column("clip_bright_frac", pa.array(bright))
        batch = batch.append_column(
            "flag_blurry", pa.array(sharp <= self._blur))
        batch = batch.append_column(
            "flag_clipped",
            pa.array(np.maximum(dark, bright) >= self._clip))
        if self._drop:
            batch = batch.drop_columns(["bytes"])
        return batch


def with_sharpness_stats(ds, *, blur_threshold: float = 100.0,
                         clip_threshold: float = 0.3,
                         drop_bytes: bool = True, concurrency=None,
                         batch_size: int | None = 1024):
    """Images ds → + per-image sharpness / exposure-clip quality signals."""
    stage = SharpnessStats(blur_threshold, clip_threshold, drop_bytes)
    if concurrency is None:
        return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)
    return ds.map_batches(
        SharpnessStats,
        fn_constructor_args=(blur_threshold, clip_threshold, drop_bytes),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


class AugmentImages:
    """Deterministic augmentation stage: horizontal/vertical flip and/or
    crop.  ``crop=(cw, ch)`` center-crops; ``crop_mode="hash"`` instead
    derives the crop origin from the stable hash of ``image_id`` — the
    reproducible stand-in for random crops (identical across runs and
    resumes, no RNG state to ship).  All ops are numpy views/slices —
    no per-image Python loop; mixed dims go per-(w, h) group."""

    def __init__(self, *, hflip: bool = False, vflip: bool = False,
                 crop: tuple[int, int] | None = None,
                 crop_mode: str = "center"):
        if crop_mode not in ("center", "hash"):
            raise ValueError(f"crop_mode must be center/hash, got {crop_mode!r}")
        self._hf, self._vf, self._crop, self._mode = hflip, vflip, crop, crop_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import stable_hash_array

        n = batch.num_rows
        if self._crop is not None:
            cw, ch = self._crop
        else:
            cw = ch = None
        out: list[np.ndarray | None] = [None] * n
        ids = (batch.column("image_id").to_numpy(zero_copy_only=False)
               if "image_id" in batch.column_names else np.arange(n))

        def per_group(pix, idx):
            g = pix
            if self._hf:
                g = g[:, :, ::-1]
            if self._vf:
                g = g[:, ::-1]
            if cw is not None:
                h, w = g.shape[1], g.shape[2]
                if cw > w or ch > h:
                    raise ValueError(f"crop {self._crop} exceeds image ({w}x{h})")
                if self._mode == "center":
                    x0 = np.full(len(idx), (w - cw) // 2, dtype=np.int64)
                    y0 = np.full(len(idx), (h - ch) // 2, dtype=np.int64)
                else:
                    hx = stable_hash_array(ids[idx], seed=0xC401)
                    hy = stable_hash_array(ids[idx], seed=0xC402)
                    x0 = (hx % np.uint64(w - cw + 1)).astype(np.int64)
                    y0 = (hy % np.uint64(h - ch + 1)).astype(np.int64)
                rows = y0[:, None] + np.arange(ch)[None, :]
                cols = x0[:, None] + np.arange(cw)[None, :]
                g = g[np.arange(len(idx))[:, None, None],
                      rows[:, :, None], cols[:, None, :]]
            for j, i in enumerate(idx):
                out[i] = np.ascontiguousarray(g[j])

        _map_dim_groups(batch, per_group)
        ow = np.array([o.shape[1] for o in out], dtype=np.int32)
        oh = np.array([o.shape[0] for o in out], dtype=np.int32)
        payload = [o.tobytes() for o in out]
        batch = batch.set_column(batch.schema.get_field_index("bytes"),
                                 "bytes", pa.array(payload, type=pa.binary()))
        batch = batch.set_column(batch.schema.get_field_index("w"), "w",
                                 pa.array(ow))
        return batch.set_column(batch.schema.get_field_index("h"), "h",
                                pa.array(oh))


def augment_images(ds, *, hflip: bool = False, vflip: bool = False,
                   crop: tuple[int, int] | None = None,
                   crop_mode: str = "center", batch_size: int | None = 512):
    """Images ds → same schema, deterministically augmented (stateless
    tasks; pure slicing needs no actor state)."""
    stage = AugmentImages(hflip=hflip, vflip=vflip, crop=crop,
                          crop_mode=crop_mode)
    return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def patchify_images(ds, *, patch: int = 8, stride: int | None = None,
                    gray: bool = True, batch_size: int | None = 256):
    """Explode each image into flattened patch vectors — the classic
    FeatureExtraction-style prep for PCA/whitening over image patches:
    one output row per (image, patch) with ``patch_vec`` a
    fixed_size_list<float32> of length patch² (grayscale) or 3·patch²
    (rgb), plus the patch grid coordinates.

    Images stream through stateless tasks; each batch's output is
    (rows_per_image × batch) rows, so keep ``batch_size`` modest — the
    fan-out is the point (downstream PCA fits on a bounded sample)."""
    stride = patch if stride is None else stride

    def fn(batch: pa.Table) -> pa.Table:
        ids_all = batch.column("image_id").to_numpy(zero_copy_only=False)
        chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []

        def per_group(pix, idx):
            n, h, w, _ = pix.shape
            if h < patch or w < patch:
                return
            p = pix.astype(np.float32)
            if gray:
                p = (p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114)
                p = p[..., None]
            ny = (h - patch) // stride + 1
            nx = (w - patch) // stride + 1
            ys = (np.arange(ny) * stride)[:, None] + np.arange(patch)[None, :]
            xs = (np.arange(nx) * stride)[:, None] + np.arange(patch)[None, :]
            # (n, ny, nx, patch, patch, c) gather, then flatten per patch
            g = p[:, ys][:, :, :, xs]          # (n, ny, patch, nx, patch, c)
            g = g.transpose(0, 1, 3, 2, 4, 5)  # (n, ny, nx, patch, patch, c)
            vecs = g.reshape(n * ny * nx, -1)
            pid = np.repeat(ids_all[idx], ny * nx)
            py = np.tile(np.repeat(np.arange(ny, dtype=np.int32), nx), n)
            px = np.tile(np.tile(np.arange(nx, dtype=np.int32), ny), n)
            chunks.append((pid, py, px, vecs))

        _map_dim_groups(batch, per_group)
        if not chunks:
            dim = patch * patch * (1 if gray else 3)
            return pa.table({
                "image_id": pa.array([], type=pa.int64()),
                "patch_y": pa.array([], type=pa.int32()),
                "patch_x": pa.array([], type=pa.int32()),
                "patch_vec": pa.array([], type=pa.list_(pa.float32(), dim)),
            })
        pid = np.concatenate([c[0] for c in chunks])
        py = np.concatenate([c[1] for c in chunks])
        px = np.concatenate([c[2] for c in chunks])
        vecs = np.concatenate([c[3] for c in chunks])
        dim = vecs.shape[1]
        flat = pa.array(vecs.reshape(-1).astype(np.float32))
        return pa.table({
            "image_id": pa.array(pid),
            "patch_y": pa.array(py),
            "patch_x": pa.array(px),
            "patch_vec": pa.FixedSizeListArray.from_arrays(flat, dim),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def with_aspect_bucket(ds, *, w_col: str = "w", h_col: str = "h",
                       thresholds=(0.5, 0.8, 1.25, 2.0),
                       out_col: str = "aspect_bucket"):
    """Aspect-ratio bucketing (the SDXL-style multimodal-training prep
    step: batches must be dimension-homogeneous, and bucketing by w/h
    beats square-cropping for information loss).  ``bucket =
    searchsorted(thresholds, w/h, right)`` — a pure width/height
    function, so it runs at the metadata layer without decoding a
    single byte, and the threshold compare is SQL-mirrorable exactly
    (same float64 division both sides)."""
    t = np.asarray(thresholds, dtype=np.float64)

    def fn(batch: pa.Table) -> pa.Table:
        w = batch.column(w_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column(h_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(t, w / h, side="right").astype(np.int64)
        return batch.append_column(out_col, pa.array(b))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pack_images_by_pixels(ds, *, budget: int, id_col: str = "image_id",
                          w_col: str = "w", h_col: str = "h",
                          bucket_col: str = "aspect_bucket",
                          num_shards: int = 1):
    """Pack images into ≈``budget``-pixel training batches WITHIN their
    aspect bucket — the image analog of ``pack_chunks``' watermark
    sequence packing (a batch never mixes buckets, so collation stays
    dimension-homogeneous).

    Only (id, bucket, w, h) ride the exchange — pixel payloads never
    shuffle; join the assignment back by id.  Within each (bucket,
    shard) stream rows are ordered by ``id_col`` and ``pack_bin =
    floor(running_pixels_before / budget)`` — all-integer arithmetic,
    so the full assignment is SQL-mirrorable at ``num_shards=1``.
    ``num_shards > 1`` splits every bucket into independent packing
    streams via ``hash_u32(id)`` (the scale path: parallelism is then
    buckets × shards, not the handful of aspect buckets; string-id
    hashing is SipHash → pytest-verified, not SQL)."""
    from .blobshuffle import _BUCKET, pack_by_bucket, unpack_table
    from .split import hash_u32

    cols = [id_col, bucket_col, w_col, h_col]

    def add_shard(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        w = t.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = t.column(h_col).to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.append_column("n_pixels", pa.array(w * h))
        b = t.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if num_shards > 1:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            shard = (hash_u32(ids) % np.uint64(num_shards)).astype(np.int64)
        else:
            shard = np.zeros(len(b), dtype=np.int64)
        t = t.append_column("pack_shard", pa.array(shard))
        return pack_by_bucket(t, b * num_shards + shard)

    def pack(t: pa.Table) -> pa.Table:
        df = unpack_table(t).to_pandas().sort_values(
            id_col, kind="mergesort", ignore_index=True)
        n = df["n_pixels"].to_numpy(dtype=np.int64)
        before = np.cumsum(n) - n
        df["pack_bin"] = before // budget
        return pa.Table.from_pandas(df, preserve_index=False)

    sharded = ds.map_batches(add_shard, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    return sharded.groupby(_BUCKET).map_groups(pack, batch_format="pyarrow")


__all__.append("with_aspect_bucket")
__all__.append("pack_images_by_pixels")
