"""Persisted fingerprint store for INCREMENTAL dedup — the cross-run
operator behind "dedup tonight's crawl against the 100 TB historical
corpus without touching the corpus": the history lives on disk as a
hash-partitioned store of (fingerprint, key) rows, 8 bytes of content
identity per document, and a new batch probes it reading ONLY the
partitions its own fingerprints hash to.

Layout: ``store_dir/fp_bucket=<b>/part.parquet`` with columns
``(__fp uint64-as-int64, <key_col>)``, one file per bucket, written
atomically (tmp + rename) so a crashed update never leaves a torn
partition.  At 100 TB the store is ~0.8 GB per 50 B docs and the probe
exchange is NEW-BATCH-sized; the corpus itself never shuffles and
only len(batch buckets)/num_buckets of the store is read.

Fingerprints are the engine-standard stable SipHash
(functions/hashing.py) of the content column — identical across
processes, runs and store generations.  A 64-bit fingerprint equates
documents with collision probability ~n²/2⁶⁵ (~1e-9 at 10 M docs);
that tradeoff is the point of a fingerprint store — callers needing
exactness verify survivors' raw content downstream.
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import bucket_of, stable_hash_array

__all__ = ["with_fingerprint", "fingerprint_store_update",
           "dedup_against_store", "fingerprint_store_stats"]

_FP = "__fp"


def with_fingerprint(ds, content_col: str, *, out_col: str = _FP,
                     seed: int = 0):
    """Append the stable 64-bit content fingerprint (as int64 — parquet
    and Arrow group keys want a signed type; the bit pattern is what
    matters)."""

    def fn(batch: pa.Table) -> pa.Table:
        vals = batch.column(content_col).to_numpy(zero_copy_only=False)
        fp = stable_hash_array(vals, seed=seed).view(np.int64)
        return batch.append_column(out_col, pa.array(fp, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _bucket_file(store_dir: str, bucket: int) -> str:
    return os.path.join(store_dir, f"fp_bucket={bucket}", "part.parquet")


def fingerprint_store_update(ds, store_dir: str, key_col: str,
                             content_col: str, *, num_buckets: int = 64,
                             seed: int = 0) -> int:
    """Merge a dataset's fingerprints into the store (create or extend).

    One bucketed exchange of (fp, key) rows — 16 B/doc, never content.
    Each bucket task reads ITS existing partition (if any), unions,
    keeps the FIRST key per fingerprint (existing store rows win, so
    re-running an update is idempotent and never rewrites history),
    and atomically replaces the file.  Returns the number of NEW
    fingerprints added across buckets.
    """
    from .partition import bucketed_map_groups

    os.makedirs(store_dir, exist_ok=True)
    fps = with_fingerprint(ds.select_columns([key_col, content_col]),
                           content_col, seed=seed)

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select([_FP, key_col])

    fps = fps.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(t: pa.Table) -> pa.Table:
        b = int(bucket_of(t.column(_FP).to_numpy(zero_copy_only=False)[:1],
                          num_buckets, seed=seed)[0])
        path = _bucket_file(store_dir, b)
        new = t.select([_FP, key_col])
        if os.path.exists(path):
            old = pq.read_table(path)
            merged = pa.concat_tables([old, new.cast(old.schema)])
        else:
            old = None
            merged = new
        df = merged.to_pandas()
        df = df.drop_duplicates(_FP, keep="first")
        added = len(df) - (old.num_rows if old is not None else 0)
        if added > 0:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           tmp)
            os.replace(tmp, path)
        return pa.table({"bucket": pa.array([b], type=pa.int64()),
                         "added": pa.array([added], type=pa.int64())})

    report = bucketed_map_groups(fps, _FP, merge_bucket,
                                 num_buckets=num_buckets, seed=seed)
    return int(sum(r["added"] for r in report.take_all()))


def dedup_against_store(ds, store_dir: str, content_col: str, *,
                        num_buckets: int = 64, seed: int = 0,
                        invert: bool = False):
    """Keep the rows whose content fingerprint is NOT in the store
    (``invert=True`` keeps the matches instead — the "what have we seen
    before" audit).  One new-batch-sized bucketed exchange; each bucket
    task reads ONLY its own store partition (missing partition = no
    history = everything survives).  Row content rides the exchange as
    engine-standard packed blobs, so wide rows cost one shuffle, and
    the store side never moves at all."""
    from .partition import bucketed_map_groups

    fps = with_fingerprint(ds, content_col, seed=seed)

    def probe_bucket(t: pa.Table) -> pa.Table:
        fp = t.column(_FP).to_numpy(zero_copy_only=False)
        b = int(bucket_of(fp[:1], num_buckets, seed=seed)[0])
        path = _bucket_file(store_dir, b)
        if os.path.exists(path):
            seen = pq.read_table(path, columns=[_FP]).column(_FP).to_numpy(
                zero_copy_only=False)
            hit = np.isin(fp, seen)
        else:
            hit = np.zeros(len(fp), dtype=bool)
        keep = hit if invert else ~hit
        return t.filter(pa.array(keep)).drop_columns([_FP])

    return bucketed_map_groups(fps, _FP, probe_bucket,
                               num_buckets=num_buckets, seed=seed)


def fingerprint_store_stats(store_dir: str) -> dict:
    """Driver-side store audit: partition count, total fingerprints,
    bytes — reads parquet FOOTERS only, never row data."""
    files = sorted(glob.glob(os.path.join(store_dir, "fp_bucket=*",
                                          "part.parquet")))
    rows = sum(pq.read_metadata(f).num_rows for f in files)
    return {"partitions": len(files), "fingerprints": rows,
            "bytes": sum(os.path.getsize(f) for f in files)}


# ---------------------------------------------------------------- phash store


def _phash_bucket_file(store_dir: str, band: int, bucket: int) -> str:
    return os.path.join(store_dir, f"band={band}", f"bb={bucket}",
                        "part.parquet")


def _explode_bands(key_col: str, phash_col: str, num_bands: int,
                   num_buckets: int, seed: int):
    """(band, band-value, store-bucket, phash, key) rows — num_bands per
    input row, 32 B each; ``__sb`` is the SAME bucket the store files
    are laid out by, so the exchange key equals the partition id."""
    from .dedup import _bands

    def explode(batch: pa.Table) -> pa.Table:
        ph = batch.column(phash_col).to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        bv = _bands(ph, num_bands).T.reshape(-1)          # band-major
        n = len(ph)
        return pa.table({
            "__band": pa.array(
                np.repeat(np.arange(num_bands, dtype=np.int64), n),
                type=pa.int64()),
            "__bv": pa.array(bv, type=pa.int64()),
            "__sb": pa.array(bucket_of(bv, num_buckets, seed=seed),
                             type=pa.int64()),
            "__ph": pa.array(np.tile(ph, num_bands), type=pa.int64()),
            key_col: pa.array(np.tile(keys, num_bands)),
        })

    return explode


def phash_store_update(ds, store_dir: str, key_col: str, phash_col: str, *,
                       num_bands: int = 4, num_buckets: int = 32,
                       seed: int = 11) -> int:
    """Banded NEAR-duplicate fingerprint store — the incremental sibling
    of :func:`fingerprint_store_update` for perceptual hashes: history
    images index under ``band=<i>/bb=<bucket of band value>`` so a new
    batch probes only the partitions its own band values hash to
    (pigeonhole: Hamming ≤ d with num_bands ≥ d+1 guarantees ≥1
    IDENTICAL band, so band-equality candidates are exhaustive).

    Each history row lands in num_bands partitions (~32 B each); the
    exchange and the store are both O(num_bands · rows), never pixel
    data.  Same idempotent first-entry-wins merge and atomic
    tmp+rename writes as the exact store.  Returns new (band, value,
    phash) entries added."""
    from .partition import bucketed_map_groups

    os.makedirs(store_dir, exist_ok=True)
    rows = ds.select_columns([key_col, phash_col]).map_batches(
        _explode_bands(key_col, phash_col, num_bands, num_buckets, seed),
        batch_format="pyarrow", zero_copy_batch=True)

    def merge_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        # one task = one hash bucket of (band, sb) keys; a key never
        # splits, so each (band, sb) subgroup here owns its file
        df = t.select(["__band", "__bv", "__sb", "__ph", key_col]).to_pandas()
        total = 0
        for (band, b), grp in df.groupby(["__band", "__sb"], sort=False):
            path = _phash_bucket_file(store_dir, int(band), int(b))
            new = grp[["__bv", "__ph", key_col]]
            if os.path.exists(path):
                old = pq.read_table(path).to_pandas()
                merged = pd.concat([old, new], ignore_index=True)
                old_rows = len(old)
            else:
                merged, old_rows = new, 0
            out = merged.drop_duplicates(["__bv", "__ph"], keep="first")
            added = len(out) - old_rows
            if added > 0:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
                pq.write_table(
                    pa.Table.from_pandas(out, preserve_index=False), tmp)
                os.replace(tmp, path)
            total += added
        return pa.table({"added": pa.array([total], type=pa.int64())})

    report = bucketed_map_groups(rows, ["__band", "__sb"], merge_bucket,
                                 num_buckets=num_buckets, seed=seed)
    return int(sum(r["added"] for r in report.take_all()))


def phash_store_hits(ds, store_dir: str, key_col: str, phash_col: str, *,
                     max_distance: int = 2, num_bands: int = 4,
                     num_buckets: int = 32, seed: int = 11):
    """Probe the banded store: one row per input image whose phash is
    within ``max_distance`` of ANY stored phash — ``(key, min_dist)``.
    The probe exchange carries (band, value, bucket, phash, key) rows
    for the NEW batch only; each (band, bucket) subgroup reads ITS
    store partition, joins on band value (candidates), verifies with a
    vectorized popcount, and emits hits.  Keys hit in several bands
    dedupe to their min distance in a tiny second aggregation.
    ``num_bands`` must exceed ``max_distance`` (pigeonhole) and match
    the store's — loud error otherwise."""
    from .dedup import popcount64
    from .groupagg import grouped_aggregate
    from .partition import bucketed_map_groups

    if num_bands <= max_distance:
        raise ValueError(
            f"phash_store_hits: num_bands={num_bands} must exceed "
            f"max_distance={max_distance} for exhaustive candidates")

    rows = ds.select_columns([key_col, phash_col]).map_batches(
        _explode_bands(key_col, phash_col, num_bands, num_buckets, seed),
        batch_format="pyarrow", zero_copy_batch=True)

    def probe_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["__band", "__bv", "__sb", "__ph", key_col]).to_pandas()
        outs = []
        for (band, b), grp in df.groupby(["__band", "__sb"], sort=False):
            path = _phash_bucket_file(store_dir, int(band), int(b))
            if not os.path.exists(path):
                continue
            store = pq.read_table(path, columns=["__bv", "__ph"]).to_pandas()
            cand = grp[["__bv", "__ph", key_col]].merge(
                store, on="__bv", suffixes=("", "_s"))
            if cand.empty:
                continue
            d = popcount64(np.bitwise_xor(
                cand["__ph"].to_numpy().astype(np.uint64),
                cand["__ph_s"].to_numpy().astype(np.uint64)))
            hit = d <= max_distance
            if not hit.any():
                continue
            h = cand.loc[hit, [key_col]].copy()
            h["__d"] = d[hit]
            outs.append(h)
        if not outs:
            return pa.table({key_col: pa.array(
                [], t.schema.field(key_col).type),
                "__d": pa.array([], type=pa.int64())})
        hits = (pd.concat(outs, ignore_index=True)
                .groupby(key_col, sort=False)["__d"].min().reset_index())
        return pa.Table.from_pandas(hits, preserve_index=False)

    hits = bucketed_map_groups(rows, ["__band", "__sb"], probe_bucket,
                               num_buckets=num_buckets, seed=seed)
    return grouped_aggregate(hits, key_col, {"min_dist": ("__d", "min")},
                             num_buckets=8)


__all__ += ["phash_store_update", "phash_store_hits"]
