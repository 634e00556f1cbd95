"""Entity-bucketed, ts-sorted partition harness — the shared substrate for
every windowed operator and the as-of join (SURVEY.md §2-B R1, §7 Phase 3,
hard-part 1: per-entity contiguity).

Scale shape
-----------
The engine's ONE wide exchange per pipeline is here: rows are bucketed by
a stable hash of the entity key (``functions.hashing.bucket_of`` — the
same function everywhere, so co-partitioned stages align), packed into
per-bucket compressed IPC blobs (``stages/blobshuffle.py`` — the shuffle
moves a few blob rows per batch, not every data row) and shuffled with
``groupby(_BUCKET).map_groups``.  Inside a bucket the scan callback
receives a pandas DataFrame sorted by (entity, ts, tiebreak); per-entity
work is then vectorized with pandas' C groupby kernels — never a Python
loop over rows.  An entity never crosses a bucket, so window state never
crosses a node; bucket count scales with the cluster (SURVEY.md §4).

Determinism: bucket ids come from a seeded SipHash (no PYTHONHASHSEED),
and ties on ts are broken by an explicit tiebreak column, so resume runs
reproduce partition contents bit-for-bit (SURVEY.md §7 hard-part 2).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow

_BUCKET = "__fx_bucket"

__all__ = ["add_bucket_column", "sorted_scan", "bucketed_map_groups",
           "adaptive_num_buckets", "_BUCKET"]


def _cluster_cpus() -> int:
    """Logical CPUs of the (single- or multi-node) cluster; cheap, safe
    before ray.init (falls back to the host count)."""
    try:
        import ray

        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or 1
    except Exception:
        pass
    import os

    return os.cpu_count() or 1


def adaptive_num_buckets(
    n_rows: int,
    *,
    target_rows_per_bucket: int = 250_000,
    min_buckets: int = 8,
    max_buckets: int = 65_536,
) -> int:
    """Bucket count scaled to the INPUT and the CLUSTER, not a constant
    (round-1 VERDICT: a static 64 means per-task memory = dataset/64 —
    1.5 TB/task at 100 TB).  Two forces:

    - memory: every ``groupby(bucket).map_groups`` stage materializes one
      bucket as a single in-memory frame, so per-task memory ≈
      target_rows_per_bucket × row_width; 250k rows of ~200 B ≈ 50 MB.
    - parallelism: the merge wave runs one task per bucket, so buckets
      must be ≥ ~2× cluster cores or the wave under-fills the cluster
      (round-3 finding: at small inputs the rows-based count alone left
      the exchange running 8-wide on a 32-core budget).

    The max of the two wins; at 100 TB the memory term dominates by
    orders of magnitude and the parallelism floor is inert.  Bounded
    above so the shuffle's partition metadata stays sane."""
    import math

    floor = max(min_buckets, 2 * _cluster_cpus())
    if n_rows <= 0:
        return min(max_buckets, floor)
    return max(floor, min(max_buckets, math.ceil(n_rows / target_rows_per_bucket)))


def add_bucket_column(ds, entity_col: str, num_buckets: int, seed: int = 0):
    """ds + deterministic ``__fx_bucket`` column (vectorized, stateless)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(entity_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            _BUCKET, pa.array(bucket_of(col, num_buckets, seed=seed), type=pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sorted_scan(
    ds,
    entity_col: str,
    ts_col: str,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
    seed: int = 0,
    max_bucket_bytes: int = 2_000_000_000,
):
    """Run ``fn`` over each entity-bucket, sorted by (entity, ts, tiebreak).

    ``fn``: DataFrame → DataFrame, already sorted, all rows of any entity
    present and contiguous.  This is where backfill / lag / sessionize /
    rolling implement themselves as vectorized per-entity segment ops.

    Hot-entity ceiling: window semantics need an entity's FULL history in
    one bucket, so a single entity larger than a worker's heap cannot be
    split (as-of joins without a window_fn can salt the left side
    instead — ``stages/asof.py``).  That failure must be a loud error
    naming the entity, not an OOM: ``max_bucket_bytes`` guards each
    materialized bucket (arrow bytes, BEFORE the pandas conversion
    roughly doubles it).
    """
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs

    def tag(batch: pa.Table) -> pa.Table:
        col = batch.column(entity_col).to_numpy(zero_copy_only=False)
        return pack_by_bucket(batch, bucket_of(col, num_buckets, seed=seed))

    # batch_size=None → whole-block tagging: blob slices of block/buckets
    # rows amortize the per-blob IPC header (1024-row default batches
    # would shred a 64-bucket exchange into ~16-row blobs)
    bucketed = ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    sort_cols = [entity_col, ts_col, *tiebreak_cols]

    # map_groups runs in pyarrow format and we convert ourselves: the
    # default pandas conversion would turn nullable int64 (e.g. 64-bit
    # phash after a lag) into lossy float64 (functions/pdconv.py).
    def run_bucket(tbl: pa.Table) -> pa.Table:
        # every group has ≥1 blob row (groups come from blob rows), so no
        # fallback schema is needed
        data = unpack_blobs(tbl.column(_BLOB))
        if data.nbytes > max_bucket_bytes:
            ent = data.column(entity_col)
            vc = ent.value_counts()
            top = max(vc.to_pylist(), key=lambda r: r["counts"])
            raise RuntimeError(
                f"sorted_scan: bucket of {data.num_rows} rows / {data.nbytes} "
                f"bytes exceeds max_bucket_bytes={max_bucket_bytes} "
                f"(hottest entity {top['values']!r}: {top['counts']} rows). "
                "Window semantics cannot split an entity's history — raise "
                "num_buckets if the bucket holds many entities, or trim / "
                "pre-aggregate the hot entity upstream."
            )
        df = arrow_to_pandas_safe(data)
        df = df.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        return pandas_to_arrow(fn(df))

    return bucketed.groupby(_BUCKET).map_groups(run_bucket, batch_format="pyarrow")


def entity_segments(df: pd.DataFrame, entity_col: str) -> np.ndarray:
    """Boolean mask: True where a new entity run starts (df pre-sorted)."""
    ent = df[entity_col].to_numpy()
    new = np.empty(len(ent), dtype=bool)
    if len(ent):
        new[0] = True
        new[1:] = ent[1:] != ent[:-1]
    return new


def bucketed_map_groups(
    ds,
    key_cols,
    fn: Callable[[pa.Table], pa.Table],
    *,
    num_buckets: int = 64,
    seed: int = 0,
):
    """Generic co-partitioned custom operator (X2 UDF hook): ``fn``
    receives ONE Arrow table per key-hash bucket holding every row of
    every key that hashes there (keys never split; a bucket usually
    holds many keys — iterate them with a pandas/pyarrow groupby inside
    ``fn``).  The exchange is the engine-standard blob-packed shuffle;
    this is the building block the named operators (dedup, topn,
    aggregates, minhash …) are written on, exposed for user-defined
    per-key logic that the aggregate surface doesn't cover.

    Unsorted sibling of :func:`sorted_scan` (which additionally sorts
    each bucket by (entity, ts) for window semantics).
    """
    from ..functions.hashing import bucket_of_multi
    from .blobshuffle import pack_by_bucket, unpack_table

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def tag(batch: pa.Table) -> pa.Table:
        b = bucket_of_multi(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols],
            num_buckets,
            seed=seed,
        )
        return pack_by_bucket(batch, b)

    bucketed = ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed.groupby(_BUCKET).map_groups(
        lambda t: fn(unpack_table(t)), batch_format="pyarrow"
    )
