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
