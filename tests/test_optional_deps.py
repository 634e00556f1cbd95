"""Activation tests for import-gated optional-dependency paths.

These tests RUN the real gated code (not the error message) and are
skip-marked on the import, so they are skipped in this sandbox (pillow
and pylance are absent) and light up automatically the moment the
dependency is installed — VERDICT r2 "Next round" #9.

The inverse tests (gate raises a clear NotImplementedError when the
library is absent) run HERE, so the sandbox still exercises the gates.
"""

import importlib.util

import numpy as np
import pyarrow as pa
import pytest

_HAVE_PIL = importlib.util.find_spec("PIL") is not None
_HAVE_LANCE = importlib.util.find_spec("lance") is not None


def _smooth_images(n=8, w=48, h=32, seed=3):
    """Smooth gradient+sinusoid images: jpeg-friendly content so the
    PSNR≥40dB contract (BASELINE.json:15) is meaningful (white noise
    would fail any lossy codec at q95 and prove nothing)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    for i in range(n):
        fx, fy = rng.uniform(0.02, 0.08, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        for c in range(3):
            plane = (
                127
                + 60 * np.sin(2 * np.pi * (fx * xx + fy * yy) + phase[c])
                + 40 * (xx / w)
            )
            out[i, :, :, c] = np.clip(plane, 0, 255).astype(np.uint8)
    return out


def _images_table(pix, fmt):
    from featureextraction_jl_ray.stages.codec import encode_images

    n, h, w, _ = pix.shape
    return pa.table(
        {
            "image_id": pa.array([f"img{i}" for i in range(n)]),
            "bytes": pa.array(encode_images(pix, fmt), type=pa.binary()),
            "w": pa.array(np.full(n, w, dtype=np.int32)),
            "h": pa.array(np.full(n, h, dtype=np.int32)),
            "fmt": pa.array([fmt] * n),
        }
    )


# ---------------------------------------------------------------------------
# PIL path — real decode/encode (skipped without pillow)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _HAVE_PIL, reason="pillow not installed")
def test_png_roundtrip_lossless():
    from featureextraction_jl_ray.stages.codec import decode_batch, psnr

    pix = _smooth_images()
    back = decode_batch(_images_table(pix, "png"))
    assert back.shape == pix.shape
    assert psnr(pix, back) == float("inf")  # png is lossless


@pytest.mark.skipif(not _HAVE_PIL, reason="pillow not installed")
def test_jpeg_psnr_gate():
    from featureextraction_jl_ray.stages.codec import decode_batch, psnr

    pix = _smooth_images()
    back = decode_batch(_images_table(pix, "jpeg"))
    assert psnr(pix, back) >= 40.0  # BASELINE.json:15 lossy contract


@pytest.mark.skipif(not _HAVE_PIL, reason="pillow not installed")
def test_mixed_fmt_batch_decodes():
    from featureextraction_jl_ray.stages.codec import (
        decode_batch,
        encode_images,
        psnr,
    )

    pix = _smooth_images(n=6)
    blobs = encode_images(pix[:3], "png") + encode_images(pix[3:], "raw")
    n, h, w, _ = pix.shape
    tbl = pa.table(
        {
            "bytes": pa.array(blobs, type=pa.binary()),
            "w": pa.array(np.full(n, w, dtype=np.int32)),
            "h": pa.array(np.full(n, h, dtype=np.int32)),
            "fmt": pa.array(["png"] * 3 + ["raw"] * 3),
        }
    )
    back = decode_batch(tbl)
    assert psnr(pix, back) == float("inf")


@pytest.mark.skipif(not _HAVE_PIL, reason="pillow not installed")
def test_pixel_features_compressed_matches_raw(ray_session):
    """The full Ray stage over png payloads == the same stage over raw."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.codec import with_pixel_features

    pix = _smooth_images(n=16)

    def feats(fmt):
        ds = rd.from_arrow(_images_table(pix, fmt))
        out = with_pixel_features(ds, grid=4).take_all()
        return np.array(sorted((r["image_id"], tuple(r["pix"])) for r in out),
                        dtype=object)

    a, b = feats("png"), feats("raw")
    assert all(x[0] == y[0] for x, y in zip(a, b))
    assert np.allclose(
        np.array([x[1] for x in a], dtype=np.float32),
        np.array([y[1] for y in b], dtype=np.float32),
    )


# ---------------------------------------------------------------------------
# Lance path — real read/write round-trip (skipped without pylance)
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not _HAVE_LANCE, reason="pylance not installed")
def test_lance_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from featureextraction_jl_ray.sources.io import read_table, write_table

    pix = _smooth_images(n=12)
    src = rd.from_arrow(_images_table(pix, "raw"))
    uri = str(tmp_path / "imgs.lance")
    write_table(src, uri, fmt="lance")
    back = read_table(uri, fmt="lance")
    assert back.count() == 12
    cols = read_table(uri, fmt="lance", columns=["image_id", "w"])
    tbl = cols.take_all()
    assert set(tbl[0].keys()) == {"image_id", "w"}


# ---------------------------------------------------------------------------
# Gate behavior in THIS sandbox (deps absent): loud, typed errors
# ---------------------------------------------------------------------------


@pytest.mark.skipif(_HAVE_PIL, reason="pillow installed — gate inactive")
def test_compressed_decode_gate_raises():
    from featureextraction_jl_ray.stages.codec import decode_batch, encode_images

    tbl = pa.table(
        {
            "bytes": pa.array([b"\x89PNG fake"], type=pa.binary()),
            "w": pa.array([4], type=pa.int32()),
            "h": pa.array([4], type=pa.int32()),
            "fmt": pa.array(["png"]),
        }
    )
    with pytest.raises(NotImplementedError, match="pillow"):
        decode_batch(tbl)
    with pytest.raises(NotImplementedError, match="pillow"):
        encode_images(np.zeros((1, 4, 4, 3), dtype=np.uint8), "png")


@pytest.mark.skipif(_HAVE_LANCE, reason="pylance installed — gate inactive")
def test_lance_gate_raises():
    from featureextraction_jl_ray.sources.io import read_table

    with pytest.raises(NotImplementedError, match="pylance"):
        read_table("/tmp/nonexistent.lance", fmt="lance")
