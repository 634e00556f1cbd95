"""Deterministic synthetic image+caption tables (FIXTURES.md §A1/A2).

Generates the driver-mandated input shape (BASELINE.json:15):

    images(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
           caption:string, phash:int64, ts:timestamp[us])
    captions(image_id:string, ts:timestamp[us], caption:string, phash:int64)

Fully deterministic: every partition seeds its own PCG64 from
(table, partition_id, seed) — no wall clock, no global RNG state
(SURVEY.md §7 hard-part 2).  Generation is itself a Ray pipeline
(``range(P).map_batches``) so bench-scale tables are produced in
parallel and written partition-wise.

Skew fixture: ``skew_frac`` of rows share ONE phash — their pixels are a
common 8×8 base pattern upsampled ×2 plus antisymmetric 2×2 noise
[[d,−d],[−d,d]] that preserves every 2×2 cell mean exactly, so the
average-hash is bit-identical while the images differ (near-duplicates;
exercises D2 salting + D3 banding).

Near-dup fixture (``neardup_frac`` of the skewed rows): one 8×8 cell of
the base pattern is reflected across the global cell mean (pixels of
that cell set to 2g−cell), flipping that cell's average-hash bit — the
resulting phashes sit at Hamming distance ~1 from the skew hash and ~2
from each other, so the Hamming-banded near-dup pairs are NON-empty and
the ``phash_near_dup_pairs`` DuckDB oracle checks real pairs.

Leakage bait: caption rows whose ts is later than every image ts of the
entity carry a "LEAK_" caption; a correct as-of join must never attach
them (SURVEY.md §5.2 №4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .functions.phash import ahash64_batch

__all__ = ["synth_images", "synth_captions", "write_synth_tables", "SynthConfig"]

_WORDS = np.array(
    (
        "amber bridge canyon delta ember forest gale harbor iris juniper "
        "kestrel lagoon meadow nectar onyx prairie quartz raven sierra thistle "
        "umber violet willow xenon yarrow zephyr anchor beacon cinder drift "
        "echo fjord glacier horizon inlet jetty knoll lantern mesa nimbus "
        "orchard pebble quarry ridge summit tundra upland vale wharf yonder"
    ).split()
)

_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
_DAY_US = 86_400_000_000


class SynthConfig:
    def __init__(
        self,
        n_entities: int = 200,
        rows_per_entity: int = 5,
        img_size: int = 16,
        skew_frac: float = 0.3,
        neardup_frac: float = 0.34,
        caption_entity_frac: float = 0.7,
        leak_frac: float = 0.5,
        session_gap_minutes: int = 30,
        seed: int = 42,
        num_partitions: int = 8,
    ):
        self.n_entities = n_entities
        self.rows_per_entity = rows_per_entity
        self.img_size = img_size
        self.skew_frac = skew_frac
        self.neardup_frac = neardup_frac
        self.caption_entity_frac = caption_entity_frac
        self.leak_frac = leak_frac
        self.session_gap_minutes = session_gap_minutes
        self.seed = seed
        self.num_partitions = num_partitions


def _rng(table: str, pid: int, seed: int) -> np.random.Generator:
    return np.random.default_rng(
        np.random.SeedSequence([seed, pid, abs(hash_str(table))])
    )


def hash_str(s: str) -> int:
    """Tiny deterministic FNV-1a (Python hash() is seed-randomized)."""
    h = 2166136261
    for c in s.encode():
        h = ((h ^ c) * 16777619) & 0xFFFFFFFF
    return h


def _skew_base(cfg: SynthConfig) -> np.ndarray:
    """The shared 8×8×3 base pattern of the skewed-phash cluster."""
    rng = _rng("skew_base", 0, cfg.seed)
    return rng.integers(64, 192, size=(8, 8, 3), dtype=np.uint8)


def _entity_rows(cfg: SynthConfig, pid: int):
    """Entity ids handled by partition pid (round-robin)."""
    return np.arange(pid, cfg.n_entities, cfg.num_partitions)


def _gen_images_partition(cfg: SynthConfig, pid: int) -> pa.Table:
    rng = _rng("images", pid, cfg.seed)
    ents = _entity_rows(cfg, pid)
    s = cfg.img_size
    base = _skew_base(cfg)
    base_up = np.repeat(np.repeat(base, s // 8, axis=0), s // 8, axis=1)

    ids, ents_col, ts_all, pix_all, captions = [], [], [], [], []
    gap_us = cfg.session_gap_minutes * 60_000_000
    for e in ents:
        erng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 1000 + int(e)]))
        n_rows = 1 + int(erng.integers(0, cfg.rows_per_entity * 2))
        # per-entity increasing ts with occasional session-gap bursts
        start = int(erng.integers(0, 30)) * _DAY_US + int(erng.integers(0, _DAY_US))
        deltas = erng.integers(30_000_000, gap_us // 2, size=n_rows).astype(np.int64)
        burst = erng.random(n_rows) < 0.25
        deltas[burst] += gap_us * 3
        ts = start + np.cumsum(deltas)
        skewed = erng.random(n_rows) < cfg.skew_frac
        # vectorized pixel generation for the whole entity at once
        imgs = erng.integers(0, 256, size=(n_rows, s, s, 3), dtype=np.uint8)
        k = int(skewed.sum())
        if k:
            d = erng.integers(-32, 33, size=(k, s // 2, s // 2, 3), dtype=np.int16)
            noise = np.zeros((k, s, s, 3), dtype=np.int16)
            noise[:, 0::2, 0::2] = d
            noise[:, 1::2, 1::2] = d
            noise[:, 0::2, 1::2] = -d
            noise[:, 1::2, 0::2] = -d
            skew_imgs = (base_up.astype(np.int16)[None] + noise).astype(np.uint8)
            # near-dup planting: reflect ONE 8×8 cell across the global
            # cell mean → that cell's ahash bit flips (Hamming ≈ 1 from
            # the skew hash); zero the noise in that cell so the flip is
            # exact.  Drawn AFTER the noise from the same stream so the
            # non-near rows' pixels are unchanged vs the v2 fixture.
            near = erng.random(k) < cfg.neardup_frac
            cell_pick = erng.integers(0, 64, size=k)
            cells_gray = base.astype(np.float64).mean(axis=2)  # (8, 8)
            g = cells_gray.mean()
            bs = s // 8
            for idx in np.nonzero(near)[0]:
                r8, c8 = divmod(int(cell_pick[idx]), 8)
                shift = 2.0 * (g - cells_gray[r8, c8])
                val = np.clip(
                    base[r8, c8].astype(np.float64) + shift, 0, 255
                ).astype(np.uint8)
                skew_imgs[idx, r8 * bs:(r8 + 1) * bs, c8 * bs:(c8 + 1) * bs] = val
            imgs[skewed] = skew_imgs
        word_idx = erng.integers(0, len(_WORDS), size=(n_rows, 5))
        for i in range(n_rows):
            pix_all.append(imgs[i])
            ids.append(f"img_{e:05d}_{i:04d}")
            ents_col.append(f"ent_{e:05d}")
            ts_all.append(ts[i])
            captions.append(" ".join(_WORDS[word_idx[i]]))

    pix = np.stack(pix_all) if pix_all else np.zeros((0, s, s, 3), np.uint8)
    phash = ahash64_batch(pix) if len(pix) else np.array([], dtype=np.int64)
    return pa.table(
        {
            "image_id": pa.array(ids, type=pa.string()),
            "entity_id": pa.array(ents_col, type=pa.string()),
            "bytes": pa.array([p.tobytes() for p in pix], type=pa.binary()),
            "w": pa.array(np.full(len(ids), s, dtype=np.int32)),
            "h": pa.array(np.full(len(ids), s, dtype=np.int32)),
            "fmt": pa.array(["raw"] * len(ids), type=pa.string()),
            "caption": pa.array(captions, type=pa.string()),
            "phash": pa.array(phash, type=pa.int64()),
            "ts": pa.array(
                (_EPOCH.astype(np.int64) + np.asarray(ts_all, dtype=np.int64)).astype(
                    "datetime64[us]"
                ),
                type=pa.timestamp("us"),
            ),
        }
    )


def _gen_captions_partition(cfg: SynthConfig, pid: int) -> pa.Table:
    """Caption/phash STATE stream per entity — interleaved with image ts,
    including strictly-future LEAK_ rows (leakage bait)."""
    ents = _entity_rows(cfg, pid)
    ids, ts_all, caps, phashes = [], [], [], []
    for e in ents:
        erng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 2000 + int(e)]))
        if erng.random() >= cfg.caption_entity_frac:
            continue
        img = _gen_entity_ts(cfg, int(e))
        if len(img) == 0:
            continue
        lo, hi = img.min(), img.max()
        n_caps = 1 + int(erng.integers(0, 3))
        cap_ts = np.sort(
            erng.integers(lo - _DAY_US, hi + 1, size=n_caps).astype(np.int64)
        )
        for t in cap_ts:
            ids.append(f"ent_{e:05d}")
            ts_all.append(t)
            words = _WORDS[erng.integers(0, len(_WORDS), size=4)]
            caps.append("state " + " ".join(words))
            phashes.append(int(erng.integers(-(2**62), 2**62)))
        if erng.random() < cfg.leak_frac:
            ids.append(f"ent_{e:05d}")
            ts_all.append(hi + _DAY_US)  # strictly after every image ts
            caps.append("LEAK_poison_future_caption")
            phashes.append(-1)
    return pa.table(
        {
            "entity_id": pa.array(ids, type=pa.string()),
            "ts": pa.array(
                (_EPOCH.astype(np.int64) + np.asarray(ts_all, dtype=np.int64)).astype(
                    "datetime64[us]"
                ),
                type=pa.timestamp("us"),
            ),
            "caption_state": pa.array(caps, type=pa.string()),
            "phash_state": pa.array(phashes, type=pa.int64()),
        }
    )


def _gen_entity_ts(cfg: SynthConfig, e: int) -> np.ndarray:
    """Recompute entity e's image timestamps (same stream as images gen)."""
    erng = np.random.default_rng(np.random.SeedSequence([cfg.seed, 1000 + e]))
    n_rows = 1 + int(erng.integers(0, cfg.rows_per_entity * 2))
    gap_us = cfg.session_gap_minutes * 60_000_000
    start = int(erng.integers(0, 30)) * _DAY_US + int(erng.integers(0, _DAY_US))
    deltas = erng.integers(30_000_000, gap_us // 2, size=n_rows).astype(np.int64)
    burst = erng.random(n_rows) < 0.25
    deltas[burst] += gap_us * 3
    return start + np.cumsum(deltas)


def synth_images(cfg: SynthConfig) -> pa.Table:
    return pa.concat_tables(
        [_gen_images_partition(cfg, p) for p in range(cfg.num_partitions)]
    )


def synth_captions(cfg: SynthConfig) -> pa.Table:
    return pa.concat_tables(
        [_gen_captions_partition(cfg, p) for p in range(cfg.num_partitions)]
    )


def write_synth_tables(cfg: SynthConfig, out_dir: str, *, use_ray: bool = True) -> dict:
    """Write images/ and captions/ parquet dirs under out_dir (idempotent
    cache keyed by config); parallel via Ray when a session is live."""
    import os

    tag = (
        f"n{cfg.n_entities}_r{cfg.rows_per_entity}_s{cfg.img_size}"
        f"_sk{int(cfg.skew_frac*100)}_nd{int(cfg.neardup_frac*100)}"
        f"_seed{cfg.seed}_v3"
    )
    root = os.path.join(out_dir, tag)
    paths = {
        "images": os.path.join(root, "images"),
        "captions": os.path.join(root, "captions"),
    }
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return paths
    os.makedirs(root, exist_ok=True)
    import pyarrow.parquet as pq

    if use_ray:
        import ray

        @ray.remote
        def gen_and_write(kind: str, pid: int, out_path: str) -> int:
            # generate AND write inside the task — a driver-side write loop
            # serializes 128 partitions and dominates wall time
            fn = _gen_images_partition if kind == "images" else _gen_captions_partition
            tbl = fn(cfg, pid)
            pq.write_table(tbl, out_path)
            return tbl.num_rows

        os.makedirs(paths["images"], exist_ok=True)
        os.makedirs(paths["captions"], exist_ok=True)
        futs = [
            gen_and_write.remote(
                kind, p, os.path.join(paths[kind], f"part-{p:05d}.parquet")
            )
            for kind in ("images", "captions")
            for p in range(cfg.num_partitions)
        ]
        ray.get(futs)
    else:
        os.makedirs(paths["images"], exist_ok=True)
        os.makedirs(paths["captions"], exist_ok=True)
        for p in range(cfg.num_partitions):
            pq.write_table(
                _gen_images_partition(cfg, p),
                os.path.join(paths["images"], f"part-{p:05d}.parquet"),
            )
            pq.write_table(
                _gen_captions_partition(cfg, p),
                os.path.join(paths["captions"], f"part-{p:05d}.parquet"),
            )
    with open(done, "w") as fh:
        fh.write(tag)
    return paths
