"""Wide ↔ long reshaping.

``melt`` (unpivot) is embarrassingly parallel — each batch explodes
independently (rows × len(value_cols) output, zero exchange); the wide
direction lives in ``groupagg.pivot_aggregate`` because widening is an
aggregate in a distributed setting (rows of one key may span blocks).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["melt"]


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
