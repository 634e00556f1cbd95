"""Multimodal plumbing: raw audio/video decode + stub gating."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.codec import with_pixel_features
from featureextraction_jl_ray.stages.multimodal import (
    with_audio_features,
    with_video_frames,
)


def _audio_table(n=6, sr=8000, fmt="pcm16"):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        ns = int(rng.integers(sr // 2, sr * 2))
        pcm = (np.sin(np.arange(ns) * (0.01 + 0.01 * i)) * 20000).astype("<i2")
        rows.append((f"clip_{i}", pcm.tobytes(), sr, ns, fmt))
    cols = list(zip(*rows))
    return pa.table(
        {
            "clip_id": pa.array(cols[0], type=pa.string()),
            "bytes": pa.array(cols[1], type=pa.binary()),
            "sr": pa.array(cols[2], type=pa.int32()),
            "n_samples": pa.array(cols[3], type=pa.int64()),
            "fmt": pa.array(cols[4], type=pa.string()),
        }
    )


def _video_table(n=3, w=16, h=16, fmt="rgb24"):
    rng = np.random.default_rng(1)
    rows = []
    for i in range(n):
        nf = int(rng.integers(4, 10))
        frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
        rows.append((f"vid_{i}", frames.tobytes(), w, h, nf, fmt, frames))
    return rows, pa.table(
        {
            "video_id": pa.array([r[0] for r in rows], type=pa.string()),
            "bytes": pa.array([r[1] for r in rows], type=pa.binary()),
            "w": pa.array([r[2] for r in rows], type=pa.int32()),
            "h": pa.array([r[3] for r in rows], type=pa.int32()),
            "n_frames": pa.array([r[4] for r in rows], type=pa.int32()),
            "fmt": pa.array([r[5] for r in rows], type=pa.string()),
        }
    )


def test_audio_features(ray_session):
    ds = ray_session.data.from_arrow(_audio_table())
    out = with_audio_features(ds, n_bands=8).to_pandas()
    feats = np.stack(out["afeat"].to_numpy())
    assert feats.shape == (6, 8)
    assert np.isfinite(feats).all() and (feats >= 0).all()
    assert "bytes" not in out.columns


def test_audio_stub_gating(ray_session):
    tbl = _audio_table(fmt="mp3")
    ds = ray_session.data.from_arrow(tbl)
    with pytest.raises(Exception, match="codec libraries|NotImplemented"):
        with_audio_features(ds).to_pandas()


def test_video_frame_sampling_feeds_image_pipeline(ray_session):
    rows, tbl = _video_table()
    ds = ray_session.data.from_arrow(tbl)
    frames = with_video_frames(ds, k=3)
    # sampled frames reuse the image decode stage downstream
    out = with_pixel_features(frames, grid=4).to_pandas()
    assert {"video_id", "frame_idx", "pix"} <= set(out.columns)
    assert all(len(p) == 4 * 4 * 3 for p in out["pix"])
    # frame bytes must equal the original frame content
    got = out.sort_values(["video_id", "frame_idx"]).iloc[0]
    orig = rows[0][6][int(got["frame_idx"])]
    np.testing.assert_allclose(
        np.asarray(got["pix"]).reshape(4, 4, 3),
        orig.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3)) / 255.0,
        atol=1e-6,
    )


def test_psnr_roundtrip_and_threshold():
    """north_rule verification clause: decoded pixels must round-trip
    losslessly for fmt='raw' (PSNR = inf) and psnr() must discriminate at
    the 40 dB bar for lossy codecs."""
    from featureextraction_jl_ray.stages.codec import decode_batch, encode_raw, psnr

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(4, 16, 16, 3), dtype=np.uint8)
    tbl = pa.table({
        "bytes": pa.array(encode_raw(pix), type=pa.binary()),
        "w": pa.array([16] * 4, type=pa.int32()),
        "h": pa.array([16] * 4, type=pa.int32()),
        "fmt": pa.array(["raw"] * 4),
    })
    back = decode_batch(tbl)
    assert psnr(pix, back) == float("inf")
    np.testing.assert_array_equal(pix, back)
    # ±2-level quantization noise ≈ 43 dB (above the bar); ±20 ≈ 23 dB (below)
    small = np.clip(pix.astype(np.int16) + rng.integers(-2, 3, pix.shape), 0, 255)
    big = np.clip(pix.astype(np.int16) + rng.integers(-20, 21, pix.shape), 0, 255)
    assert psnr(pix, small.astype(np.uint8)) >= 40.0
    assert psnr(pix, big.astype(np.uint8)) < 40.0


def test_silence_trim_planted(ray_session):
    """Loud-silence-loud clip keeps exactly the loud frames in order;
    all-silent clip empties; trailing partial frame follows the same
    rule; compressed formats still raise loudly."""
    import ray as _ray

    from featureextraction_jl_ray.stages.multimodal import (
        SilenceTrim,
        with_silence_trim,
    )

    frame = 128
    loud = (np.sin(np.arange(frame * 4) * 0.1) * 12000).astype("<i2")
    quiet = np.zeros(frame * 3, dtype="<i2")
    pcm = np.concatenate([loud, quiet, loud])
    # trailing ACTIVE partial frame (half a frame of loud signal)
    tail = (np.sin(np.arange(frame // 2) * 0.1) * 12000).astype("<i2")
    tbl = pa.table({
        "clip_id": ["a", "b", "c"],
        "bytes": [pcm.tobytes(), quiet.tobytes(),
                  np.concatenate([quiet, tail]).tobytes()],
        "fmt": ["pcm16"] * 3,
    })
    out = {r["clip_id"]: r
           for r in with_silence_trim(_ray.data.from_arrow(tbl),
                                      frame=frame).take_all()}
    a = np.frombuffer(out["a"]["bytes"], dtype="<i2")
    assert np.array_equal(a, np.concatenate([loud, loud]))
    assert out["a"]["n_samples"] == frame * 8
    assert out["b"]["n_samples"] == 0 and out["b"]["active_ratio"] == 0.0
    c = np.frombuffer(out["c"]["bytes"], dtype="<i2")
    assert np.array_equal(c, tail)        # partial active tail kept
    with pytest.raises(Exception, match="codec"):
        SilenceTrim()(pa.table({
            "clip_id": ["x"], "bytes": [b"\x00\x01"], "fmt": ["mp3"]}))


def test_video_phash_near_dup_planted(ray_session):
    """Re-uploaded (identical) video pairs with its original at jaccard
    1.0; distinct videos produce no pair; dhash variant survives a
    global brightness shift."""
    import ray as _ray

    from featureextraction_jl_ray.stages.multimodal import (
        video_phash_near_dup,
    )

    rng = np.random.default_rng(51)
    w, h, nf = 12, 8, 6

    def clip(seed):
        r = np.random.default_rng(seed)
        return r.integers(0, 200, size=(nf, h, w, 3), dtype=np.uint8)

    v0, v1 = clip(1), clip(2)
    v0b = np.clip(v0.astype(np.int64) + 25, 0, 255).astype(np.uint8)
    tbl = pa.table({
        "video_id": ["orig", "dup", "other", "shifted"],
        "bytes": [v0.tobytes(), v0.tobytes(), v1.tobytes(), v0b.tobytes()],
        "w": pa.array([w] * 4, type=pa.int32()),
        "h": pa.array([h] * 4, type=pa.int32()),
        "n_frames": pa.array([nf] * 4, type=pa.int32()),
        "fmt": ["rgb24"] * 4,
    })
    ds = _ray.data.from_arrow(tbl)
    pairs = video_phash_near_dup(ds, k=4, threshold=0.8,
                                 num_buckets=4).to_pandas()
    got = {tuple(sorted((r.key_a, r.key_b))): r.jaccard
           for r in pairs.itertuples()}
    assert got.get(("dup", "orig")) == 1.0
    assert ("orig", "other") not in got and ("dup", "other") not in got
    # brightness-shifted copy: dhash fingerprints are invariant
    pairs_d = video_phash_near_dup(ds, k=4, threshold=0.8,
                                   hash_method="dhash",
                                   num_buckets=4).to_pandas()
    got_d = {tuple(sorted((r.key_a, r.key_b))): r.jaccard
             for r in pairs_d.itertuples()}
    assert got_d.get(("orig", "shifted")) == 1.0
