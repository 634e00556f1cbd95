"""Zero-copy-ish bridging between Arrow list columns and NumPy matrices.

Feature vectors live in Arrow as ``list<float>`` or
``fixed_size_list<float, p>`` columns (SURVEY.md §1.2).  The numeric
kernels (moments, PCA transform) want a dense (n, p) ndarray.  These
helpers do the conversion without per-row Python loops: a ListArray's
values buffer is one contiguous child array, so for constant-length lists
a reshape suffices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_numpy(
    table_or_col, name: str | None = None, dtype=np.float64
) -> np.ndarray:
    """(n, p) ndarray view/copy of a list-typed column with uniform lengths.

    Accepts a pyarrow Table + column name, or a ChunkedArray/Array.
    Raises ValueError on ragged lists (they indicate schema corruption —
    feature vectors must be fixed-width).
    """
    col = table_or_col.column(name) if name is not None else table_or_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if isinstance(col.type, pa.ExtensionType):
        # e.g. Ray's ArrowTensorArray (from_pandas of ndarray columns):
        # its to_numpy yields the dense (n, p) array directly
        mat = np.asarray(col.to_numpy(zero_copy_only=False))
        if mat.dtype == object:
            mat = np.stack(mat)
        return mat.astype(dtype) if mat.dtype != dtype else mat
    if pa.types.is_fixed_size_list(col.type):
        p = col.type.list_size
        # flatten() is offset-aware for sliced arrays; .values is NOT (it
        # returns the whole child buffer — round-1 ADVICE finding)
        flat = col.flatten()
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        p = int(widths[0])
        if not (widths == p).all():
            raise ValueError("ragged list column; expected fixed-width vectors")
        flat = col.values
        # slice off any leading offset (sliced arrays)
        if offsets[0] != 0:
            flat = flat.slice(offsets[0], n * p)
    mat = flat.to_numpy(zero_copy_only=False).reshape(n, p)
    if mat.dtype != dtype:
        mat = mat.astype(dtype)
    return mat


def numpy_to_fixed_list_column(mat: np.ndarray, value_type=pa.float32()) -> pa.Array:
    """(n, p) ndarray → Arrow fixed_size_list<value_type, p> array."""
    n, p = mat.shape
    np_dtype = value_type.to_pandas_dtype()
    flat = np.ascontiguousarray(mat, dtype=np_dtype).reshape(-1)
    return pa.FixedSizeListArray.from_arrays(pa.array(flat, type=value_type), p)
