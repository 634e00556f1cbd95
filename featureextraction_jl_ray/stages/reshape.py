"""Wide ↔ long reshaping.

``melt`` (unpivot) is embarrassingly parallel — each batch explodes
independently (rows × len(value_cols) output, zero exchange); the wide
direction lives in ``groupagg.pivot_aggregate`` because widening is an
aggregate in a distributed setting (rows of one key may span blocks).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["melt", "explode_list"]


def melt(ds, id_cols, value_cols, *, var_name: str = "variable",
         value_name: str = "value", value_type: pa.DataType | None = None):
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``) long
    rows, repeating ``id_cols`` — one output row per (input row ×
    value column), dictionary-encoded measure names kept as plain utf8
    for a stable driver-contract schema.  Values cast to a common type
    (float64 unless ``value_type`` is given) like SQL UNPIVOT does."""
    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    vt = value_type if value_type is not None else pa.float64()

    def fn(t: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, type=pa.string())
            cols[value_name] = pc.cast(t.column(c), vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def explode_list(ds, list_col: str, id_cols, *, value_name: str = "value",
                 pos_name: str = "pos"):
    """Explode a list column to one row per element with its 1-based
    ordinal — vectorized flatten (list offsets → repeated ids + aranges),
    zero exchange, the generic form of the token explode."""
    import numpy as np

    id_cols = [id_cols] if isinstance(id_cols, str) else list(id_cols)

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(list_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_per = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        n_per = np.nan_to_num(n_per.astype(np.float64)).astype(np.int64)
        total = int(n_per.sum())
        starts = np.cumsum(n_per) - n_per
        ords = np.arange(total, dtype=np.int64) - np.repeat(starts, n_per) + 1
        cols = {}
        for c in id_cols:
            vals = t.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.repeat(vals, n_per))
        cols[pos_name] = pa.array(ords)
        cols[value_name] = pc.list_flatten(col)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
