"""Deterministic, vectorized hashing for partitioning / salting / sketches.

Determinism matters (SURVEY.md §7 hard-part 2): partition and salt
assignments must be identical across processes and across resume runs, so
Python's ``hash()`` (PYTHONHASHSEED-randomized) is forbidden.  We use
pandas' stable SipHash-based ``hash_array`` (fixed default ``hash_key``),
which is vectorized in C for both integer and object (string) arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio mixer for combining


def stable_hash_array(values, seed: int = 0) -> np.ndarray:
    """Stable uint64 hash of a 1-D array-like of ints / strings.

    Identical output across processes and runs (no PYTHONHASHSEED
    dependence).  ``seed`` decorrelates independent uses (salting vs
    bucketing vs minhash permutations).
    """
    arr = np.asarray(values)
    if arr.dtype.kind in "iuf":
        h = pd.util.hash_array(arr)
    else:
        obj = arr.astype(object)
        # pandas' string hash table truncates at embedded NUL bytes
        # ("a\x00b" hashes like "a" — pandas 2.2 khash uses C-string
        # semantics), which would equate distinct contents in every
        # fingerprint / dedup identity.  Escape affected values
        # injectively before hashing: \x01 → \x01\x01, \x00 → \x01\x02
        # (no output contains NUL; distinct inputs stay distinct).
        # The scan is one vectorized pass; the rewrite touches only
        # rows that actually contain NUL/SOH (approximately none).
        s = pd.Series(obj)
        try:
            has = s.str.contains("[\x00\x01]", regex=True)
            mask = has.fillna(False).to_numpy(dtype=bool)
        except (AttributeError, TypeError):
            # non-string object array (dates, tuples, …): nothing to
            # escape — the C-string truncation only bites str values
            mask = np.zeros(len(s), dtype=bool)
        if mask.any():
            fixed = (s[mask].str.replace("\x01", "\x01\x01", regex=False)
                     .str.replace("\x00", "\x01\x02", regex=False))
            obj = obj.copy()
            obj[mask] = fixed.to_numpy(dtype=object)
        h = pd.util.hash_array(obj)
    if seed:
        h = (h ^ np.uint64(seed)) * _MIX
        h ^= h >> np.uint64(33)
    return h


def combine_hashes(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combination of two uint64 hash arrays."""
    out = (a ^ (b * _MIX)) * _MIX
    out ^= out >> np.uint64(29)
    return out


def bucket_of(values, num_buckets: int, seed: int = 0) -> np.ndarray:
    """Deterministic bucket id in [0, num_buckets) for each value.

    This is THE partitioning primitive: every co-partitioned stage
    (windows, as-of join, dedup) must derive buckets through here so the
    same entity lands in the same bucket in every stage of a pipeline.
    """
    return (stable_hash_array(values, seed=seed) % np.uint64(num_buckets)).astype(
        np.int64
    )


def bucket_of_multi(columns, num_buckets: int, seed: int = 0) -> np.ndarray:
    """Bucket id for composite keys (list of equal-length arrays)."""
    h = stable_hash_array(columns[0], seed=seed)
    for col in columns[1:]:
        h = combine_hashes(h, stable_hash_array(col, seed=seed))
    return (h % np.uint64(num_buckets)).astype(np.int64)
