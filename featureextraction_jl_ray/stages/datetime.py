"""Calendar / event-time feature extraction — the datetime companions
to the window family.

`with_datetime_features` is pure ``pyarrow.compute`` (zero-copy Arrow
kernels, no pandas round-trip, stateless tasks, zero exchange) and
emits exact integers, so the SQL oracle (``date_part``) matches
bit-for-bit.  ``isodow`` follows ISO-8601 (Monday=1 … Sunday=7),
matching DuckDB's ``isodow``.

`with_time_since_prev` is a window op (needs per-entity order): seconds
since the entity's previous event, computed inside the shared
``sorted_scan`` exchange; first event of an entity → null.  Strictly
backward-looking — leakage-safe by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .partition import sorted_scan

__all__ = ["with_datetime_features", "with_time_since_prev"]

_PARTS = {
    "year": lambda a: pc.year(a),
    "month": lambda a: pc.month(a),
    "day": lambda a: pc.day(a),
    "hour": lambda a: pc.hour(a),
    "minute": lambda a: pc.minute(a),
    "second": lambda a: pc.second(a),
    "isodow": lambda a: pc.day_of_week(a, count_from_zero=False, week_start=1),
    "doy": lambda a: pc.day_of_year(a),
    "week": lambda a: pc.iso_week(a),
}


def with_datetime_features(ds, ts_col: str, *,
                           parts=("year", "month", "day", "hour", "isodow"),
                           weekend_col: str | None = None,
                           prefix: str | None = None):
    """Append int64 calendar parts of ``ts_col`` (named ``<prefix><part>``,
    default prefix ``<ts_col>_``) and optionally a bool is-weekend flag
    (ISO dow ≥ 6)."""
    bad = set(parts) - set(_PARTS)
    if bad:
        raise ValueError(f"unknown parts {sorted(bad)}; choose from {sorted(_PARTS)}")
    prefix = prefix if prefix is not None else f"{ts_col}_"

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(ts_col)
        for p in parts:
            batch = batch.append_column(
                f"{prefix}{p}", pc.cast(_PARTS[p](arr), pa.int64())
            )
        if weekend_col:
            dow = pc.day_of_week(arr, count_from_zero=False, week_start=1)
            batch = batch.append_column(
                weekend_col, pc.greater_equal(dow, pa.scalar(6))
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def with_time_since_prev(ds, entity_col: str, ts_col: str, *,
                         out_col: str = "secs_since_prev",
                         num_buckets: int = 64,
                         tiebreak_cols: tuple[str, ...] = ()):
    """Append float64 seconds since the SAME entity's previous event
    (microsecond-exact integer diff / 1e6 — the same arithmetic as SQL's
    ``epoch(ts − lag(ts))``); the entity's first event gets null."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = pd.factorize(df[entity_col], use_na_sentinel=False)[0]
        d = np.empty(len(df), dtype=np.float64)
        if len(df):
            d[0] = np.nan
            same = codes[1:] == codes[:-1]
            d[1:] = np.where(same, (ts[1:] - ts[:-1]) / 1e6, np.nan)
        df[out_col] = d
        return df

    return sorted_scan(
        ds, entity_col, ts_col, fn,
        num_buckets=num_buckets, tiebreak_cols=tiebreak_cols,
    )


_CYCLES = {"hour": 24, "dow": 7, "month": 12}


def with_cyclical_features(ds, ts_col: str, *,
                           cycles=("hour", "dow", "month"),
                           prefix: str | None = None):
    """Append SIN/COS cyclical encodings of calendar parts — the
    standard fix for the midnight/Sunday/December wrap-around that
    integer parts feed a model as a discontinuity: hour → angle
    2π·hour/24, ISO dow → 2π·(dow−1)/7, month → 2π·(month−1)/12, each
    emitted as ``<prefix><part>_sin`` / ``_cos`` float64.  One Arrow
    extract + two numpy ufuncs per part; mirrors the SQL oracle's
    ``sin(2·pi()·part/period)`` exactly (1e-6 grid)."""
    bad = set(cycles) - set(_CYCLES)
    if bad:
        raise ValueError(
            f"unknown cycles {sorted(bad)}; choose from {sorted(_CYCLES)}")
    prefix = prefix if prefix is not None else f"{ts_col}_"

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(ts_col)
        for c in cycles:
            if c == "hour":
                v = pc.hour(arr)
                off = 0
            elif c == "dow":
                v = pc.day_of_week(arr, count_from_zero=False, week_start=1)
                off = 1
            else:
                v = pc.month(arr)
                off = 1
            x = (v.to_numpy(zero_copy_only=False).astype(np.float64) - off)
            ang = 2.0 * np.pi * x / _CYCLES[c]
            batch = batch.append_column(f"{prefix}{c}_sin",
                                        pa.array(np.sin(ang)))
            batch = batch.append_column(f"{prefix}{c}_cos",
                                        pa.array(np.cos(ang)))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


__all__.append("with_cyclical_features")
