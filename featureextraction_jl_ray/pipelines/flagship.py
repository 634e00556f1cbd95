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
from ..sources.io import (
    collect_manifest_records,
    completed_partitions,
    input_fingerprints,
    latest_manifest_records,
    make_bucket_writer,
)
from ..stages.asof import asof_join
from ..stages.codec import with_pixel_features
from ..stages.transform import apply_pca_transform
from ..stages.window import make_windows_frame_fn
from ..state.moments import fit_moments
from ..state.pca import PCAModel

__all__ = ["FlagshipConfig", "fit_flagship_model", "run_flagship",
           "resume_flagship", "run_flagship_delta", "flagship_input_fps"]


@dataclass
class FlagshipConfig:
    grid: int = 8  # pixel feature = grid*grid*3 dims
    k: int = 16  # PCA components
    mode: str = "pca_whiten"
    session_gap: str = "30min"
    lag_k: int = 1
    rolling_window: str = "1h"
    # None → adaptive: ceil(rows / 250k), bounded — scales with the input
    # instead of a static constant (see partition.adaptive_num_buckets)
    num_buckets: int | None = None
    # hive-style entity_bucket=<id>/ output layout → entity-pruned reads
    # downstream (sources.io.read_entity_partitions)
    hive_layout: bool = False
    # decode AND transform default to stateless tasks (None): the whiten
    # model is tens of KB, so shipping it in the task closure costs
    # nothing, and a bounded actor pool CAPS the fused decode+transform
    # stage (Ray fuses the upstream task ops into the actor pool) at the
    # pool size regardless of cluster CPUs — measured as the flagship's
    # scaling ceiling in round 2.  Set an int/tuple to force a pool
    # (right only when per-worker model deserialization is expensive).
    decode_concurrency: tuple | int | None = None
    transform_concurrency: tuple | int | None = None
    # None → whole-block decode batches: Ray already sizes blocks by
    # BYTES (target_max_block_size), so block-sized batches self-regulate
    # for any image size, decode tasks follow read blocks 1:1 (fusable),
    # and no cross-block bundling stalls the stage (round-3 measured:
    # 5.1 s vs 8.4 s median at 32 cpus for the fixed 4096-row bundling)
    decode_batch_size: int | None = None
    # moments of a p≈192-dim covariance converge long before 10^5 rows;
    # fitting on a bounded sample keeps E2 O(1) while the transform pass
    # streams everything.  None = fit on the full table.
    fit_sample_rows: int | None = 100_000

    @property
    def fingerprint(self) -> str:
        return (
            f"flagship/g{self.grid}/k{self.k}/{self.mode}/gap{self.session_gap}"
            f"/lag{self.lag_k}/roll{self.rolling_window}/b{self.num_buckets}"
        )


def _resolve_cfg(cfg: FlagshipConfig | None, images) -> FlagshipConfig:
    """Fill the adaptive bucket count (needed before fingerprint use)."""
    cfg = cfg or FlagshipConfig()
    if cfg.num_buckets is None:
        from dataclasses import replace

        from ..stages.partition import adaptive_num_buckets

        cfg = replace(cfg, num_buckets=adaptive_num_buckets(images.count()))
    return cfg


def fit_flagship_model(images, cfg: FlagshipConfig) -> PCAModel:
    """E2: images → decode/downsample → distributed moments → eigh → model."""
    if cfg.fit_sample_rows is not None:
        # random_sample is a parallel per-block filter; limit() would pull
        # blocks SEQUENTIALLY and invert cpu scaling of the fit pass
        total = images.count()  # parquet metadata, cheap
        if total > cfg.fit_sample_rows:
            images = images.random_sample(cfg.fit_sample_rows / total, seed=42)
    pix = with_pixel_features(
        images.select_columns(["bytes", "w", "h", "fmt"]),
        grid=cfg.grid,
        concurrency=cfg.decode_concurrency,
        batch_size=cfg.decode_batch_size,
    )
    m = fit_moments(pix, "pix")
    return PCAModel.from_moments(m).select(k=cfg.k)


def _features(images, captions, cfg: FlagshipConfig, *, bucket_sink=None):
    # as-of join + ALL window features inside ONE bucketed exchange
    # (window_fn hook — a second groupby shuffle would double the
    # exchange volume for zero semantic gain)
    window_fn = make_windows_frame_fn(
        "entity_id",
        "ts",
        lag_cols=["phash"],
        lag_k=cfg.lag_k,
        backfill_cols=["caption_state", "phash_state"],
        session_gap=cfg.session_gap,
        rolling={"value_col": "phash", "window": cfg.rolling_window, "aggs": ("count",),
                 "prefix": "roll_"},
    )
    # known output schema of the decode→transform chain: avoids asof_join
    # partially executing the lazy upstream just to discover types
    left_types = {
        "image_id": pa.string(),
        "entity_id": pa.string(),
        "w": pa.int32(),
        "h": pa.int32(),
        "fmt": pa.string(),
        "caption": pa.string(),
        "phash": pa.int64(),
        "ts": pa.timestamp("us"),
        "z": pa.list_(pa.float32(), cfg.k),
    }
    right_types = {
        "entity_id": pa.string(),
        "ts": pa.timestamp("us"),
        "caption_state": pa.string(),
        "phash_state": pa.int64(),
    }
    return asof_join(
        images,
        captions,
        on="ts",
        by="entity_id",
        right_cols=["caption_state", "phash_state"],
        num_buckets=cfg.num_buckets,
        left_tiebreak=("image_id",),
        window_fn=window_fn,
        left_types=left_types,
        right_types_in=right_types,
        bucket_sink=bucket_sink,
    )


def run_flagship(
    images,
    captions,
    *,
    cfg: FlagshipConfig | None = None,
    model: PCAModel | None = None,
    out_dir: str | None = None,
    skip_partitions: set[int] | None = None,
    input_fps: dict | None = None,
):
    """E1: full pipeline.  Returns (Dataset, model) when out_dir is None,
    else ((manifest_records, model)) after a checkpointed write.
    ``input_fps`` lets a caller that already fingerprinted the inputs
    (run_flagship_delta) skip the second scan."""
    cfg = _resolve_cfg(cfg, images)
    if model is None:
        model = fit_flagship_model(images, cfg)
    # per-bucket input fingerprints ride the manifest so a later
    # run_flagship_delta can skip partitions whose input set is
    # unchanged; computed on the UNPRUNED inputs (one cheap
    # column-pruned scan) so the record describes the full input
    fps = input_fps if input_fps is not None else (
        flagship_input_fps(images, captions, cfg.num_buckets)
        if out_dir is not None else None)
    # Stage order is deliberate: decode + PCA-transform BEFORE the as-of/
    # window exchange, so the shuffle moves (ids, ts, caption, phash, z≈64B)
    # instead of the raw `bytes` payload — at 100 TB the payload never
    # crosses the wire, only k floats per row do.
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
    decoded = with_pixel_features(
        images,
        grid=cfg.grid,
        concurrency=cfg.decode_concurrency,
        batch_size=cfg.decode_batch_size,
    )
    transformed = apply_pca_transform(
        decoded,
        model,
        "pix",
        out_col="z",
        mode=cfg.mode,
        concurrency=cfg.transform_concurrency,
        drop_input=True,
    )
    if out_dir is None:
        return _features(transformed, captions, cfg), model
    # FUSED write (round-3): the as-of/window exchange groups by the SAME
    # entity hash the writer buckets on, so the partition files are
    # written INSIDE merge_bucket via bucket_sink — ds.stats() shows ONE
    # all-to-all where round 2 paid two (merge, then re-bucket to write).
    # Completed partitions were already pruned upstream (skip_partitions),
    # so no extra skip handling is needed at the sink.
    writer = make_bucket_writer(out_dir, key_col="image_id",
                                hive_layout=cfg.hive_layout)
    manifest_ds = _features(transformed, captions, cfg, bucket_sink=writer)
    records = collect_manifest_records(
        manifest_ds, out_dir,
        op_fingerprint=cfg.fingerprint, num_buckets=cfg.num_buckets,
        extra_per_partition=fps,
    )
    return records, model


def flagship_input_fps(images, captions, num_buckets: int) -> dict[int, dict]:
    """Per-entity-bucket fingerprint of the flagship's two inputs
    (images keyed by image_id, captions by (ts, caption_state)) in
    manifest-field form: {bucket: {"input_fp", "input_rows"}}."""
    df = input_fingerprints(
        [(images, "entity_id", ["image_id"]),
         (captions, "entity_id", ["ts", "caption_state"])],
        num_buckets,
    )
    return {int(r.bucket): {"input_fp": int(r.fp), "input_rows": int(r.n)}
            for r in df.itertuples()}


def resume_flagship(images, captions, *, out_dir: str, cfg: FlagshipConfig | None = None,
                    model: PCAModel | None = None):
    """E3: skip partitions already in the manifest, run the rest.

    The manifest's recorded ``num_buckets`` PINS the partitioning: the
    adaptive bucket count floors at 2× cluster CPUs, so a resume on a
    different cluster size would otherwise resolve a different count
    (and fingerprint) and refuse to resume — the manifest, not the
    ambient cluster, owns the layout of a partially-written output.
    """
    from ..sources.io import load_manifest

    cfg = cfg or FlagshipConfig()
    if cfg.num_buckets is None:
        recs = load_manifest(out_dir)
        if recs:
            from dataclasses import replace

            cfg = replace(cfg, num_buckets=int(recs[0]["num_buckets"]))
    cfg = _resolve_cfg(cfg, images)
    done = completed_partitions(out_dir, op_fingerprint=cfg.fingerprint)
    return run_flagship(
        images, captions, cfg=cfg, model=model, out_dir=out_dir, skip_partitions=done
    )


def run_flagship_delta(images, captions, *, out_dir: str,
                       cfg: FlagshipConfig | None = None,
                       model: PCAModel | None = None):
    """Incremental run over GROWN inputs (VERDICT r3 missing #5): skip
    every completed partition whose recorded per-bucket input
    fingerprint matches the CURRENT inputs; rerun (and atomically
    overwrite) only the buckets whose input set changed.

    Valid because the job is entity-partitioned end to end: a bucket's
    output depends only on that bucket's input rows, so rewriting the
    changed buckets reproduces a from-scratch run byte-for-byte (pytest
    asserts the union).  Partitions from manifests written before
    fingerprints existed count as changed (conservative).  The manifest
    is append-only; the newest record per partition wins
    (``latest_manifest_records``)."""
    from ..sources.io import load_manifest

    cfg = cfg or FlagshipConfig()
    if cfg.num_buckets is None:
        recs = load_manifest(out_dir)
        if recs:
            from dataclasses import replace

            cfg = replace(cfg, num_buckets=int(recs[0]["num_buckets"]))
    cfg = _resolve_cfg(cfg, images)
    done = completed_partitions(out_dir, op_fingerprint=cfg.fingerprint)
    latest = latest_manifest_records(out_dir)
    current = flagship_input_fps(images, captions, cfg.num_buckets)
    unchanged = {
        pid for pid in done
        if "input_fp" in latest.get(pid, {})
        and latest[pid]["input_fp"] == current[pid]["input_fp"]
        and latest[pid].get("input_rows") == current[pid]["input_rows"]
    }
    return run_flagship(images, captions, cfg=cfg, model=model,
                        out_dir=out_dir, skip_partitions=unchanged,
                        input_fps=current)
