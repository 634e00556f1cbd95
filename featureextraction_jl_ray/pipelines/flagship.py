"""The flagship pipeline (SURVEY.md §3.2 E1/E2/E3) — the end-to-end job
the north-star describes (BASELINE.json:6): per-entity point-in-time
features over an image+caption table:

    images ──┐
             ├─ as-of join (latest caption/phash state, zero leakage)
    captions ┘
        → fused windowed features (sessionize, lag-k phash, backfill
          caption state, trailing rolling count) — ONE shuffle+scan
        → decode + downsampled pixel feature vector (actor pool)
        → whitened-PCA transform (actor pool, model broadcast)
        → partition-wise checkpointed write + manifest  (resumable)

Fit (E2) is its own short pass over the images table only (decode →
distributed moments → driver eigh); the main run then streams once.
Resume (E3) filters completed partitions out BEFORE the shuffle, so
finished work costs nothing on rerun.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.hashing import bucket_of
from ..sources.io import checkpointed_write, completed_partitions
from ..stages.asof import asof_join
from ..stages.codec import with_pixel_features
from ..stages.transform import apply_pca_transform
from ..stages.window import with_windows
from ..state.moments import fit_moments
from ..state.pca import PCAModel

__all__ = ["FlagshipConfig", "fit_flagship_model", "run_flagship", "resume_flagship"]


@dataclass
class FlagshipConfig:
    grid: int = 8  # pixel feature = grid*grid*3 dims
    k: int = 16  # PCA components
    mode: str = "pca_whiten"
    session_gap: str = "30min"
    lag_k: int = 1
    rolling_window: str = "1h"
    num_buckets: int = 64
    decode_concurrency: tuple = (1, 8)
    transform_concurrency: tuple = (1, 8)
    decode_batch_size: int = 1024

    @property
    def fingerprint(self) -> str:
        return (
            f"flagship/g{self.grid}/k{self.k}/{self.mode}/gap{self.session_gap}"
            f"/lag{self.lag_k}/roll{self.rolling_window}/b{self.num_buckets}"
        )


def fit_flagship_model(images, cfg: FlagshipConfig) -> PCAModel:
    """E2: images → decode/downsample → distributed moments → eigh → model."""
    pix = with_pixel_features(
        images.select_columns(["bytes", "w", "h", "fmt"]),
        grid=cfg.grid,
        concurrency=cfg.decode_concurrency,
        batch_size=cfg.decode_batch_size,
    )
    m = fit_moments(pix, "pix")
    return PCAModel.from_moments(m).select(k=cfg.k)


def _features(images, captions, cfg: FlagshipConfig):
    joined = asof_join(
        images,
        captions,
        on="ts",
        by="entity_id",
        right_cols=["caption_state", "phash_state"],
        num_buckets=cfg.num_buckets,
        left_tiebreak=("image_id",),
    )
    return with_windows(
        joined,
        "entity_id",
        "ts",
        lag_cols=["phash"],
        lag_k=cfg.lag_k,
        backfill_cols=["caption_state", "phash_state"],
        session_gap=cfg.session_gap,
        rolling={"value_col": "phash", "window": cfg.rolling_window, "aggs": ("count",),
                 "prefix": "roll_"},
        num_buckets=cfg.num_buckets,
        tiebreak_cols=("image_id",),
    )


def run_flagship(
    images,
    captions,
    *,
    cfg: FlagshipConfig | None = None,
    model: PCAModel | None = None,
    out_dir: str | None = None,
    skip_partitions: set[int] | None = None,
):
    """E1: full pipeline.  Returns (Dataset, model) when out_dir is None,
    else ((manifest_records, model)) after a checkpointed write."""
    cfg = cfg or FlagshipConfig()
    if model is None:
        model = fit_flagship_model(images, cfg)
    if skip_partitions:
        # prune completed partitions BEFORE the shuffle: entity→bucket is
        # the same stable hash the writer uses, so a finished partition's
        # rows are dropped at the read on resume
        skip_arr = np.fromiter(skip_partitions, dtype=np.int64)
        B = cfg.num_buckets

        def prune(batch: pa.Table) -> pa.Table:
            b = bucket_of(
                batch.column("entity_id").to_numpy(zero_copy_only=False), B, seed=0
            )
            return batch.filter(pa.array(~np.isin(b, skip_arr)))

        images = images.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        captions = captions.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )
    feats = _features(images, captions, cfg)
    feats = with_pixel_features(
        feats,
        grid=cfg.grid,
        concurrency=cfg.decode_concurrency,
        batch_size=cfg.decode_batch_size,
    )
    out = apply_pca_transform(
        feats,
        model,
        "pix",
        out_col="z",
        mode=cfg.mode,
        concurrency=cfg.transform_concurrency,
        drop_input=True,
    )
    if out_dir is None:
        return out, model
    records = checkpointed_write(
        out,
        out_dir,
        entity_col="entity_id",
        key_col="image_id",
        num_buckets=cfg.num_buckets,
        op_fingerprint=cfg.fingerprint,
        skip_partitions=skip_partitions,
    )
    return records, model


def resume_flagship(images, captions, *, out_dir: str, cfg: FlagshipConfig | None = None,
                    model: PCAModel | None = None):
    """E3: skip partitions already in the manifest, run the rest."""
    cfg = cfg or FlagshipConfig()
    done = completed_partitions(out_dir, op_fingerprint=cfg.fingerprint)
    return run_flagship(
        images, captions, cfg=cfg, model=model, out_dir=out_dir, skip_partitions=done
    )
