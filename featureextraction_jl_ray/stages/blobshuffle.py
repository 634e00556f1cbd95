"""Blob-packed bucket exchange — the wire format of the engine's wide
shuffles (as-of join, sorted_scan).

Instead of shipping data rows through ``groupby(bucket).map_groups``
(which null-pads a tagged union's schemas and sort-shuffles every row),
each upstream batch is split by bucket id and every slice is serialized
as ONE compressed Arrow-IPC blob.  The exchange then moves a tiny table
``(__fx_bucket:int64, __fx_side:int8, __fx_blob:large_binary)`` — a few
rows per input batch — and the per-bucket consumer deserializes back to
fully-typed Arrow tables:

- zero null-padding: each side keeps its own schema inside its blobs;
- LZ4-frame IPC compression: measured 187→146 B/row on the flagship's
  left side and 174→49 B/row on the right (sf-bench row mix), i.e. the
  exchange ships roughly HALF the bytes;
- the shuffle's sort touches ~batch_count×buckets rows instead of every
  data row (64× fewer at the bench shape).

The blob is self-describing (IPC streams embed the schema), so empty
sides fall back to a caller-supplied schema only when a bucket received
no blob at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

from .partition import _BUCKET

_SIDE = "__fx_side"
_BLOB = "__fx_blob"

__all__ = ["pack_by_bucket", "unpack_blobs", "blob_schema", "pack_pandas",
           "unpack_table", "_SIDE", "_BLOB"]


def _ipc_write_options():
    # lz4_frame ships with the standard pyarrow wheel; fall back to
    # uncompressed IPC if a stripped build lacks it (still correct,
    # still un-padded — just fatter on the wire)
    try:
        if pa.Codec.is_available("lz4_frame"):
            return ipc.IpcWriteOptions(compression="lz4")
    except Exception:
        pass
    return ipc.IpcWriteOptions()


_WRITE_OPTS = _ipc_write_options()


def blob_schema(with_side: bool = True) -> pa.Schema:
    fields = [pa.field(_BUCKET, pa.int64())]
    if with_side:
        fields.append(pa.field(_SIDE, pa.int8()))
    fields.append(pa.field(_BLOB, pa.large_binary()))
    return pa.schema(fields)


def _serialize(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, tbl.schema, options=_WRITE_OPTS) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def pack_by_bucket(
    tbl: pa.Table,
    bucket_ids: np.ndarray,
    *,
    side: int | None = None,
) -> pa.Table:
    """Split ``tbl`` into per-bucket slices and serialize each as one IPC
    blob row.  ``side`` tags the rows (two-sided exchanges); ``None``
    omits the side column (single-input scans)."""
    with_side = side is not None
    if tbl.num_rows == 0:
        return blob_schema(with_side).empty_table()
    order = np.argsort(bucket_ids, kind="stable")
    sorted_ids = bucket_ids[order]
    tbl = tbl.take(pa.array(order))
    bounds = np.flatnonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1], True])
    buckets, blobs = [], []
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        buckets.append(int(sorted_ids[lo]))
        blobs.append(_serialize(tbl.slice(lo, hi - lo)))
    cols = {_BUCKET: pa.array(buckets, type=pa.int64())}
    if with_side:
        cols[_SIDE] = pa.array(np.full(len(buckets), side, dtype=np.int8))
    cols[_BLOB] = pa.array(blobs, type=pa.large_binary())
    return pa.table(cols)


def unpack_blobs(blob_values, fallback_schema: pa.Schema | None = None) -> pa.Table:
    """Deserialize + concat blob rows back into one typed table.

    ``blob_values``: iterable of binary scalars / bytes.  When empty, the
    ``fallback_schema`` provides the (otherwise unknowable) schema of the
    empty result — REQUIRED by consumers whose downstream output schema
    must stay stable across empty buckets.
    """
    tabs = []
    for b in blob_values:
        buf = b.as_buffer() if hasattr(b, "as_buffer") else pa.py_buffer(b)
        tabs.append(ipc.open_stream(buf).read_all())
    if not tabs:
        if fallback_schema is None:
            raise ValueError("unpack_blobs: empty input and no fallback_schema")
        return fallback_schema.empty_table()
    if len(tabs) == 1:
        return tabs[0]
    return pa.concat_tables(tabs, promote_options="none")


def pack_pandas(df, bucket_ids) -> pa.Table:
    """pandas → arrow → per-bucket blobs (producer-side convenience)."""
    from ..functions.pdconv import pandas_to_arrow

    return pack_by_bucket(pandas_to_arrow(df), np.asarray(bucket_ids))


def unpack_table(tbl: pa.Table) -> pa.Table:
    """Consumer-side convenience: a ``groupby(_BUCKET).map_groups`` input
    of blob rows → the concatenated data table (groups always hold ≥1
    blob row, so no fallback schema is needed)."""
    return unpack_blobs(tbl.column(_BLOB))
