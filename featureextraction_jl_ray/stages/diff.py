"""Snapshot diff (table-version delta / CDC-style change detection):
given two versions of a keyed table, emit the rows that were ADDED,
REMOVED or CHANGED between them — the operator behind incremental
re-processing ("which docs changed since the last crawl?"), feature-
store delta publishing, and data-quality regression checks.

Distributed shape: both sides project to (key, compare) columns only,
tag with the SAME key-tuple hash and exchange (bucket, side, blob) rows
via the engine-standard compressed-IPC blob shuffle — ONE all-to-all,
side-specific schemas, no null-padded union.  Inside a bucket the diff
is a single pandas outer merge (C hash join) + vectorized null-safe
column compares.  Unchanged rows are dropped in the bucket, so the
output is bounded by the delta, never the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of_multi
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from .blobshuffle import _BLOB, _BUCKET, _SIDE, pack_by_bucket, unpack_blobs

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old_ds,
    new_ds,
    key_cols,
    *,
    compare_cols,
    num_buckets: int = 64,
    seed: int = 29,
):
    """Diff two versions of a keyed table.

    Returns a Dataset with the key columns, ``change`` ∈
    ``('added', 'removed', 'changed')`` and, for every compare column
    ``c``, its ``old_<c>`` / ``new_<c>`` values (null on the absent
    side).  ``changed`` means ≥1 compare column differs under NULL-SAFE
    equality (null vs null = equal — SQL ``IS DISTINCT FROM``); rows
    equal on every compare column are dropped.

    Keys must be unique within each side — a duplicate is a loud
    per-bucket error naming the key, not a silent wrong answer.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    compare_cols = ([compare_cols] if isinstance(compare_cols, str)
                    else list(compare_cols))
    proj = key_cols + compare_cols

    def make_tag(side: int):
        def tag(batch: pa.Table) -> pa.Table:
            batch = batch.select(proj)
            keys = [batch.column(c).to_numpy(zero_copy_only=False)
                    for c in key_cols]
            return pack_by_bucket(
                batch, bucket_of_multi(keys, num_buckets, seed=seed),
                side=side)

        return tag

    # Fallback schemas type EMPTY bucket sides only (blobs are
    # self-describing IPC); ray reports Python `object` for pandas object
    # columns — coerce those to string, which is what pandas_to_arrow
    # yields for them downstream anyway.
    sides = []
    for ds in (old_ds, new_ds):
        s = ds.schema()
        types = {
            n: (t if isinstance(t, pa.DataType) else pa.string())
            for n, t in zip(s.names, s.types)
        }
        sides.append(pa.schema([pa.field(c, types[c]) for c in proj]))
    old_schema, new_schema = sides

    tagged = (
        old_ds.map_batches(make_tag(0), batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
        .union(new_ds.map_batches(make_tag(1), batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None))
    )

    def diff_bucket(tbl: pa.Table) -> pa.Table:
        sd = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        blobs = tbl.column(_BLOB)
        old = arrow_to_pandas_safe(
            unpack_blobs((blobs[i] for i in np.flatnonzero(sd == 0)),
                         old_schema))
        new = arrow_to_pandas_safe(
            unpack_blobs((blobs[i] for i in np.flatnonzero(sd == 1)),
                         new_schema))
        for name, frame in (("old", old), ("new", new)):
            dup = frame.duplicated(key_cols)
            if dup.any():
                bad = frame.loc[dup, key_cols].iloc[0].tolist()
                raise ValueError(
                    f"snapshot_diff: duplicate key {bad!r} on the {name} "
                    "side — keys must be unique per snapshot")
        m = old.merge(new, on=key_cols, how="outer", indicator=True,
                      suffixes=("_old", "_new"))
        added = (m["_merge"] == "right_only").to_numpy()
        removed = (m["_merge"] == "left_only").to_numpy()
        differs = np.zeros(len(m), dtype=bool)
        for c in compare_cols:
            a, b = m[f"{c}_old"], m[f"{c}_new"]
            differs |= (~((a == b) | (a.isna() & b.isna()))).to_numpy()
        changed = (m["_merge"] == "both").to_numpy() & differs
        keep = added | removed | changed
        change = np.select([added[keep], removed[keep]],
                           ["added", "removed"], "changed")
        out = m.loc[keep, key_cols].reset_index(drop=True)
        out["change"] = change
        for c in compare_cols:
            out[f"old_{c}"] = m.loc[keep, f"{c}_old"].reset_index(drop=True)
            out[f"new_{c}"] = m.loc[keep, f"{c}_new"].reset_index(drop=True)
        return pandas_to_arrow(out)

    return tagged.groupby(_BUCKET).map_groups(diff_bucket,
                                              batch_format="pyarrow")
