"""Deterministic hash-based dataset splitting / sampling — the
train/val/test assignment and row-sampling primitives a training-data
pipeline needs.

Why hash, not random: assignment must be (a) reproducible across runs,
processes and resumes with no RNG state, (b) stable under repartitioning
and input reordering, and (c) consistent for the same key across
DIFFERENT datasets (a user's events land in the same split everywhere).
A keyed hash gives all three; `ds.random_sample` gives none.

The integer-key hash is a murmur3-style 32-bit finalizer (fmix32 —
public-domain constants) over the two's-complement uint64 key, chosen
deliberately because every step is expressible in portable SQL integer
arithmetic (UBIGINT xor/shift/multiply mod 2³²) — the driver's DuckDB
oracle reproduces the ENGINE's assignment bit-for-bit, so the split is
gate-verified, not just statistically plausible.  String keys hash via
the engine-wide SipHash (`functions.hashing.stable_hash_array`) and are
pytest-verified instead.

Scale shape: stateless vectorized ``map_batches``, zero exchange, O(1)
state per task.  Split labels are dictionary-encodable strings; filters
push down to a boolean mask per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash_array
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow

__all__ = ["hash_u32", "split_thresholds", "hash_split", "hash_sample",
           "weighted_sample_by_key", "negative_samples", "time_split",
           "sql_hash_cte", "sample_k_per_key", "mixture_plan",
           "mixture_sample", "sample_global_k"]

_M32 = np.uint64(0xFFFFFFFF)
_DEFAULT_SEED = 0x9E3779B9  # nonzero: kills the x=0 / x=-1 fixpoint of the fold


def hash_u32(keys, *, seed: int = _DEFAULT_SEED) -> np.ndarray:
    """Vectorized keyed hash of a key array → uint64 values in [0, 2³²).

    Integer keys: fmix32 finalizer over (uint64(key) XOR seed), folded
    hi^lo to 32 bits — bit-reproducible in SQL (see module docstring).
    Other dtypes: SipHash via :func:`stable_hash_array`, folded to 32
    bits (not SQL-expressible; pytest-verified).
    """
    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        x = arr.astype(np.int64).view(np.uint64) ^ np.uint64(seed)
    else:
        x = stable_hash_array(arr, seed=seed)
    h = (x ^ (x >> np.uint64(32))) & _M32
    h = h ^ (h >> np.uint64(16))
    with np.errstate(over="ignore"):
        h = (h * np.uint64(0x85EBCA6B)) & _M32
        h = h ^ (h >> np.uint64(13))
        h = (h * np.uint64(0xC2B2AE35)) & _M32
    return h ^ (h >> np.uint64(16))


def split_thresholds(fractions: dict) -> list[tuple[str, int]]:
    """(label, exclusive-upper-bound) integer thresholds on [0, 2³²)
    from {label: fraction} (insertion order; fractions must sum to 1).
    Integer thresholds make the assignment exact — no float comparison
    at apply time, and the SQL oracle uses the same literals."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    for label, f in fractions.items():
        acc += f
        out.append((label, min(int(acc * 2**32), 2**32)))
    out[-1] = (out[-1][0], 2**32)  # fp-acc safety: last bound is exact
    return out


def hash_split(ds, key_col: str, fractions: dict | None = None, *,
               seed: int = _DEFAULT_SEED, out_col: str = "split"):
    """Append a deterministic split label per row keyed on ``key_col``.

    ``fractions``: ordered {label: fraction} summing to 1 (default
    80/10/10 train/val/test).  All rows sharing a key share a label, so
    group-level leakage across splits is impossible by construction.
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    bounds = split_thresholds(fractions)
    labels = [b[0] for b in bounds]
    uppers = np.array([b[1] for b in bounds], dtype=np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch.column(key_col).to_numpy(zero_copy_only=False), seed=seed)
        idx = np.searchsorted(uppers, h, side="right")
        lab = np.array(labels, dtype=object)[idx]
        return batch.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample(ds, key_col: str, fraction: float, *,
                seed: int = _DEFAULT_SEED):
    """Keep rows whose key hashes below fraction·2³² — a deterministic,
    repartition-stable Bernoulli sample by KEY (all rows of a kept key
    are kept; sample the row id to sample rows)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = np.uint64(min(int(fraction * 2**32), 2**32 - 1)) if fraction < 1.0 else None

    def fn(batch: pa.Table) -> pa.Table:
        if bound is None:
            return batch
        h = hash_u32(batch.column(key_col).to_numpy(zero_copy_only=False), seed=seed)
        return batch.filter(pa.array(h < bound))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sql_hash_cte(source: str, key_col: str, carry_cols: str, *,
                 seed: int = _DEFAULT_SEED, out: str = "h") -> str:
    """DuckDB CTE chain computing exactly :func:`hash_u32` of integer
    ``key_col`` from ``source`` (table or subquery), carrying
    ``carry_cols`` through; exposes the hash as ``{out}`` in a relation
    named ``__hx``.  Kept next to the numpy implementation so the two
    mixes cannot drift apart silently; oracle queries embed this text."""
    s = np.uint64(seed)
    return f"""
__h0 AS (
  SELECT {carry_cols},
         xor(CAST((CAST({key_col} AS HUGEINT) + 18446744073709551616)
                  % 18446744073709551616 AS UBIGINT), {s}) AS __x
  FROM {source}
),
__h1 AS (SELECT {carry_cols}, xor(__x, __x >> 32) % 4294967296 AS __h FROM __h0),
__h2 AS (SELECT {carry_cols}, (xor(__h, __h >> 16) * 2246822507) % 4294967296 AS __h FROM __h1),
__h3 AS (SELECT {carry_cols}, (xor(__h, __h >> 13) * 3266489909) % 4294967296 AS __h FROM __h2),
__hx AS (SELECT {carry_cols}, xor(__h, __h >> 16) AS {out} FROM __h3)
"""


def weighted_sample_by_key(ds, key_col: str, id_col: str, weight_col: str,
                           *, k: int, seed: int = _DEFAULT_SEED,
                           keep_priority: bool = False):
    """Deterministic weighted sample WITHOUT replacement of ``k`` rows
    per key (Efraimidis–Spirakis A-Res): each row draws the
    hash-derived uniform u = (fmix32(id)+0.5)/2³² and ranks by
    priority = ln(u)/w (monotone in u^(1/w)); the per-key top-k by
    priority is exactly an A-Res reservoir — MERGEABLE, so it reuses
    the grouped-topn pair-bounded exchange.  P(row in sample) ∝ weight
    in the k=1 case; deterministic across runs/resumes/repartitions
    (no RNG state).  Rows with weight ≤ 0 are excluded (zero mass).
    The identical priority is SQL-expressible via ``sql_hash_cte`` —
    oracle queries embed it."""
    from .groupagg import grouped_topn

    def pri(batch: pa.Table) -> pa.Table:
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mask = w > 0
        if not mask.all():
            batch = batch.filter(pa.array(mask))
            w = w[mask]
        h = hash_u32(batch.column(id_col).to_numpy(zero_copy_only=False),
                     seed=seed)
        u = (h.astype(np.float64) + 0.5) / 4294967296.0
        return batch.append_column("__pri", pa.array(np.log(u) / w))

    with_pri = ds.map_batches(pri, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topn(with_pri, key_col, ["__pri", id_col], n=k,
                       ascending=[False, True], num_buckets=32)
    if keep_priority:
        return out

    def drop(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(["__pri"])

    return out.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True)


def sample_k_per_key(ds, key_col: str, id_col: str, *, k: int,
                     seed: int = _DEFAULT_SEED, keep_hash: bool = False):
    """Deterministic UNIFORM sample of at most ``k`` rows per key (cap
    each user/domain at k examples): rank rows within a key by the
    fmix32 hash of ``id_col`` (ascending, id tiebreak) and keep the
    bottom-k — a fixed-size per-key reservoir that is MERGEABLE (reuses
    the grouped-topn pair-bounded exchange), deterministic across runs /
    resumes / repartitions, and ROW-exactly SQL-expressible via
    ``sql_hash_cte`` (oracle queries embed it)."""
    from .groupagg import grouped_topn

    def hx(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch.column(id_col).to_numpy(zero_copy_only=False),
                     seed=seed)
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    with_h = ds.map_batches(hx, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_topn(with_h, key_col, ["__h", id_col], n=k,
                       ascending=True, num_buckets=32)
    if keep_hash:
        return out
    return out.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def mixture_plan(counts: dict, parts: dict) -> dict:
    """Per-group keep thresholds for :func:`mixture_sample`, all in
    EXACT integer arithmetic (Python bigints; the SQL oracle repeats the
    same ``//`` expressions in BIGINT, so the two can never drift by a
    float ulp — the round-2 grid lesson, designed out).

    ``counts``: available rows per group.  ``parts``: target mixture as
    INTEGER parts per group (e.g. ``{"web": 5, "code": 3, "books": 2}``
    = 50/30/20) — integers, not floats, are what make bit-exact parity
    possible.  Groups missing from either side are ignored (inner-join
    semantics).  Returns {group: exclusive uint32 hash bound}; the
    implied total T = min over groups of floor(n_g·P / p_g) is the
    largest mixture-honoring corpus the data supports.
    """
    P = sum(parts.values())
    if P <= 0 or any(p < 0 or p != int(p) for p in parts.values()):
        raise ValueError("parts must be non-negative integers, sum > 0")
    both = {g: (int(counts[g]), int(p)) for g, p in parts.items()
            if p > 0 and counts.get(g)}
    if not both:
        return {}
    T = min((n * P) // p for n, p in both.values())
    # bound = r_g·2³² with r_g = T·p_g / (P·n_g) ≤ 1 by construction of T
    return {g: (T * p * 2**32) // (P * n) for g, (n, p) in both.items()}


def mixture_sample(ds, group_col: str, id_col: str, parts: dict, *,
                   seed: int = _DEFAULT_SEED, max_groups: int = 100_000):
    """Deterministic DATA-MIXING sample: downsample each group (source /
    domain / language) so the kept corpus matches a target mixture given
    as integer ``parts`` (DoReMi/Pile-style mixture weights), sized to
    the largest total the data supports without oversampling any group.

    Two passes, both scale-shaped: a tiny ``groupby().count()`` (≤ one
    row per group, loud ``max_groups`` guard) to compute per-group hash
    bounds via :func:`mixture_plan`, then one stateless zero-exchange
    ``map_batches`` filter keeping rows with ``hash_u32(id) < bound`` —
    reproducible across runs/resumes/repartitions, and row-exactly
    SQL-expressible through ``sql_hash_cte`` for integer ids.  Realized
    per-group counts are Bernoulli around T·p_g/P (±√n); compose
    ``sample_k_per_key`` with per-group k for exact-count quotas.
    Groups absent from ``parts`` are dropped (rate 0).
    """
    try:
        # one execution; to_pandas(limit=) raises past the guard
        cdf = ds.groupby(group_col).count().to_pandas(limit=max_groups)
    except ValueError as e:
        raise RuntimeError(
            f"mixture_sample saw > {max_groups} distinct {group_col!r} "
            f"groups — the plan is driver-side and assumes group "
            f"cardinality ≪ rows; raise max_groups if that truly "
            f"holds.") from e
    # fully-empty input: Ray elides empty blocks and the pulled frame
    # loses its schema — an empty plan is the correct answer
    counts = ({} if group_col not in cdf.columns
              else dict(zip(cdf[group_col], cdf["count()"])))
    bounds = mixture_plan(counts, parts)

    def fn(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(grp, return_inverse=True)
        per_uniq = np.array([bounds.get(u, 0) for u in uniq],
                            dtype=np.uint64)
        h = hash_u32(batch.column(id_col).to_numpy(zero_copy_only=False),
                     seed=seed)
        return batch.filter(pa.array(h < per_uniq[codes]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def negative_samples(ds, id_col: str, *, k: int = 4, n_ids: int | None = None,
                     seed: int = _DEFAULT_SEED):
    """Deterministic NEGATIVE SAMPLING for contrastive training: each row
    draws k pseudo-random partner ids from the CONTIGUOUS id space
    [0, n_ids) via the pinned fmix32 hash of (id·k + j) — reproducible
    across runs/resumes, no RNG state, and the identical draw is
    SQL-expressible through ``sql_hash_cte`` (the oracle matches
    row-exactly).  Self-collisions (neg == id) are dropped on both
    sides, so rows emit ≤ k negatives; ids must be dense integers (use a
    dictionary-encode pass otherwise)."""
    import pyarrow as pa

    if n_ids is None:
        n_ids = ds.count()
    n = np.uint64(n_ids)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rep = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.int64), len(ids))
        hk = rep * k + j
        neg = (hash_u32(hk, seed=seed).astype(np.uint64) % n).astype(np.int64)
        keep = neg != rep
        return pa.table({id_col: pa.array(rep[keep]),
                         "j": pa.array(j[keep]),
                         "neg_id": pa.array(neg[keep])})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def time_split(ds, ts_col: str, *, cutoff, embargo: str | None = None,
               out_col: str = "split"):
    """Temporal train/test split with an optional EMBARGO gap: train =
    ts < cutoff, test = ts ≥ cutoff + embargo, rows inside the gap are
    DROPPED — the leakage-aware split for temporally-correlated data
    (a hash split would leak near-boundary information both ways
    through windowed features).  Stateless vectorized filter."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    cutoff = pd.Timestamp(cutoff)
    hi = cutoff + pd.Timedelta(embargo) if embargo else cutoff

    def fn(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        is_train = pc.less(ts, pa.scalar(cutoff))
        is_test = pc.greater_equal(ts, pa.scalar(hi))
        keep = pc.or_(is_train, is_test)
        batch = batch.append_column(
            out_col, pc.if_else(is_train, pa.scalar("train"),
                                pa.scalar("test")))
        return batch.filter(pc.fill_null(keep, False))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_global_k(ds, id_col: str, *, k: int, seed: int = _DEFAULT_SEED,
                    keep_hash: bool = False):
    """Deterministic UNIFORM sample of exactly ``min(k, n)`` rows from
    the WHOLE dataset — the global form of :func:`sample_k_per_key`.

    Bottom-k by the fmix32 hash of ``id_col`` (id tiebreak): each block
    keeps its local bottom-k (one vectorized argpartition), a single
    tiny reduce merges the ≤ k·num_blocks survivors — no global sort,
    no shuffle of the data, deterministic across runs / resumes /
    repartitions, and ROW-exactly SQL-expressible via ``sql_hash_cte``
    (ORDER BY h, id LIMIT k)."""

    def local_bottomk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__h", pa.array([], type=pa.int64()))
        h = hash_u32(batch.column(id_col).to_numpy(zero_copy_only=False),
                     seed=seed).astype(np.int64)
        batch = batch.append_column("__h", pa.array(h))
        if batch.num_rows <= k:
            return batch
        # bottom-k by (h, id): argpartition on h, then exact sort of the
        # k+ties slice — C-speed, no full-block sort
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return batch.take(pa.array(np.sort(order)))

    def merge(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        df = df.sort_values(["__h", id_col], kind="mergesort").head(k)
        return pandas_to_arrow(df)

    partials = ds.map_batches(local_bottomk, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    # single-wave coalesce then one final merge (k rows per partial ⇒
    # the reduce input is bounded by k·num_blocks, tiny by construction)
    out = partials.map_batches(merge, batch_format="pyarrow", batch_size=None)
    out = out.repartition(1).map_batches(merge, batch_format="pyarrow",
                                         batch_size=None)
    if keep_hash:
        return out
    return out.map_batches(lambda b: b.drop_columns(["__h"]),
                           batch_format="pyarrow", zero_copy_batch=True)


def weighted_thin(ds, id_col: str, p_col: str, *, seed: int = _DEFAULT_SEED,
                  keep_p: bool = True):
    """Quality-weighted Bernoulli THINNING (DCLM/FineWeb-style soft
    filtering): keep each row independently with ITS OWN probability
    ``p_col`` (a float in [0, 1] the caller computed from a quality
    signal), deterministically — row survives iff
    ``hash_u32(id) < floor(p · 2³²)``.

    Hard filters throw away everything below a threshold; soft
    filtering keeps a score-proportional sample, preserving
    distribution tails.  Zero exchange, stateless, reproducible across
    runs/resumes (same id ⇒ same draw), and bit-exact in SQL: the
    oracle compares the same fmix32 hash against the same integer
    threshold (``sql_hash_cte`` + ``floor(p * 4294967296)``).  p ≤ 0
    drops always, p ≥ 1 keeps always; null p drops."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def thin(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        p = batch.column(p_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        p = np.nan_to_num(p, nan=0.0)
        thr = np.floor(np.clip(p, 0.0, 1.0) * float(2**32)).astype(np.uint64)
        keep = hash_u32(ids, seed=seed) < thr
        out = batch.filter(pa.array(keep))
        if not keep_p:
            out = out.drop_columns([p_col])
        return out

    return ds.map_batches(thin, batch_format="pyarrow", zero_copy_batch=True)


__all__.append("weighted_thin")
