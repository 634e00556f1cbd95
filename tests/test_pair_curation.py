"""LAION-style pair-curation pipeline: planted blurry / clipped /
short-caption / visual-duplicate pairs, stage-order semantics
(filter BEFORE dedup), computed-hash variant."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from featureextraction_jl_ray.pipelines.paircuration import run_pair_curation


def _images(rows):
    """rows: list of (image_id, pixels(h,w,3 uint8), caption, phash)"""
    return pa.table({
        "image_id": pa.array([r[0] for r in rows]),
        "entity_id": pa.array([f"e{i}" for i in range(len(rows))]),
        "bytes": pa.array([r[1].tobytes() for r in rows], type=pa.binary()),
        "w": pa.array([r[1].shape[1] for r in rows], type=pa.int32()),
        "h": pa.array([r[1].shape[0] for r in rows], type=pa.int32()),
        "fmt": pa.array(["raw"] * len(rows)),
        "caption": pa.array([r[2] for r in rows]),
        "phash": pa.array([r[3] for r in rows], type=pa.int64()),
    })


def test_pair_curation_gates_and_dedup_order(ray_session):
    import ray

    rng = np.random.default_rng(31)
    sharp = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    sharp2 = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    blurry = np.full((16, 16, 3), 128, dtype=np.uint8)
    black = np.zeros((16, 16, 3), dtype=np.uint8)

    # planted phashes pairwise Hamming > 3 except the planted pairs
    # (0 vs 0xFF vs 0xFF00 are 8-16 bits apart)
    rows = [
        ("keep_a", sharp, "a fine caption", 0),
        ("drop_blurry", blurry, "long enough caption", 0xF0F0F0),
        ("drop_clipped", black, "long enough caption", 0x0F0F0F),
        ("drop_caption", sharp2, "short", 0xFF00FF),
        # visual dups: SAME phash; min-id "dup_1" fails the caption gate,
        # so dedup-after-filter must keep "dup_2" (dedup-first would
        # collapse to dup_1 and then lose the whole cluster)
        ("dup_1", sharp, "x", 0xFF),
        ("dup_2", sharp, "kept twin caption", 0xFF),
        # hamming-1 neighbours both surviving: min id wins
        ("near_a", sharp, "caption one fine", 0xFF00),
        ("near_b", sharp2, "caption two fine", 0xFF01),
    ]
    ds = ray.data.from_arrow(_images(rows))
    kept = run_pair_curation(ds, min_caption_tokens=2, blur_threshold=5.0,
                             max_distance=3, num_buckets=4)
    got = sorted(r["image_id"] for r in kept.take_all())
    assert got == ["dup_2", "keep_a", "near_a"]
    out_cols = set(kept.schema().names)
    assert "bytes" not in out_cols
    assert {"sharpness", "n_tokens_ws", "phash"} <= out_cols


def test_pair_curation_computed_hash(ray_session):
    """compute_hash='phash' hashes the PIXELS (identical pixels collapse
    even when the stored phash column disagrees)."""
    import ray

    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    other = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        ("pix_dup_1", img, "caption alpha", 1),
        ("pix_dup_2", img, "caption beta", 2**40),  # stored phash far away
        ("distinct", other, "caption gamma", 7),
    ]
    ds = ray.data.from_arrow(_images(rows))
    kept = run_pair_curation(ds, min_caption_tokens=1, blur_threshold=5.0,
                             compute_hash="phash", num_buckets=4)
    got = sorted(r["image_id"] for r in kept.take_all())
    assert got == ["distinct", "pix_dup_1"]
    assert "computed_phash" in kept.schema().names
