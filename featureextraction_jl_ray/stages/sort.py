"""Range-partition sort with sampled quantile boundaries (SURVEY.md R1,
A5) — the "range-partition shuffle on (entity_id, ts)" of the
north-star, with the boundary sketch made explicit and PERSISTABLE so a
resumed run reuses identical partition ranges (SURVEY.md §7 hard-part 2).

``ray.data.Dataset.sort`` already range-partitions internally by
sampling; this wrapper exists for the cases where the engine must OWN
the boundaries: deterministic resume, co-partitioning two datasets on
the same ranges, and writing range-labelled output directories.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

__all__ = ["sample_boundaries", "range_partition_sort", "with_global_rank"]


def sample_boundaries(
    ds,
    key: str,
    num_partitions: int,
    *,
    sample_frac: float = 0.02,
    max_sample: int = 100_000,
    seed: int = 42,
) -> list:
    """num_partitions−1 quantile boundaries of ``key`` from a seeded sample."""
    sample = ds.select_columns([key]).random_sample(sample_frac, seed=seed)
    df = sample.to_pandas()
    if key not in df.columns:      # empty sample loses the schema
        return []
    vals = df[key].dropna()
    if len(vals) > max_sample:
        vals = vals.iloc[:max_sample]
    if len(vals) == 0:
        return []
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = vals.quantile(qs, interpolation="nearest").tolist()
    # dedupe while preserving order (heavy skew can repeat quantiles)
    out, prev = [], object()
    for b in bounds:
        if b != prev:
            out.append(b)
            prev = b
    return out


def save_boundaries(bounds: list, path: str | Path) -> None:
    Path(path).write_text(json.dumps({"boundaries": bounds}))


def load_boundaries(path: str | Path) -> list:
    return json.loads(Path(path).read_text())["boundaries"]


def range_partition_sort(
    ds,
    keys: list[str] | str,
    *,
    num_partitions: int = 64,
    boundaries: list | None = None,
    boundaries_path: str | None = None,
    descending: bool = False,
    seed: int = 42,
):
    """Globally sort ``ds`` by ``keys`` with explicit range boundaries on
    the FIRST key (sampled here unless provided); optionally persist the
    boundary artifact for deterministic re-partitioning on resume."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if boundaries is None:
        if boundaries_path and Path(boundaries_path).exists():
            boundaries = load_boundaries(boundaries_path)
        else:
            boundaries = sample_boundaries(ds, keys[0], num_partitions, seed=seed)
            if boundaries_path:
                save_boundaries(boundaries, boundaries_path)
    return ds.sort(keys, descending=descending, boundaries=boundaries or None)


def with_global_rank(
    ds,
    key: str,
    *,
    tiebreak_cols: tuple[str, ...] = (),
    rank_col: str = "global_rank",
    num_partitions: int = 64,
    seed: int = 42,
):
    """Dense global ROW_NUMBER over the whole dataset ordered by
    ``(key, *tiebreak_cols)`` — distributed order statistics without a
    single-node sort.

    Scale shape: range-partition on sampled ``key`` boundaries (ALL rows
    with an equal key value land in the SAME partition, so the tiebreak
    order never crosses a partition edge), count rows per partition in
    one cheap column-pruned pre-pass (np.bincount partials → a
    num_partitions-long driver array), then one bucketed exchange where
    each partition sorts locally and adds its prefix offset.  Ranks are
    1-based and unique when ``(key, *tiebreak_cols)`` is a total order —
    pass a unique id as the last tiebreak for deterministic output.
    Null keys rank LAST (DuckDB ``ORDER BY key`` ASC default).
    """
    import pandas as pd

    from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET

    # three passes read ds (boundary sample, count pre-pass, tag shuffle):
    # pin the blocks once so a nondeterministic upstream (sampling,
    # unseeded UDF) can't make the counts disagree with the shuffled
    # contents — duplicated/skipped ranks — and a deterministic-but-
    # expensive upstream isn't recomputed per pass (ADVICE r3)
    ds = ds.materialize()
    bounds = sample_boundaries(ds, key, num_partitions, seed=seed)
    barr = np.asarray(bounds)

    def part_of(batch: pa.Table) -> np.ndarray:
        v = batch.column(key).to_numpy(zero_copy_only=False)
        if len(barr):
            p = np.searchsorted(barr, v, side="right")
        else:
            p = np.zeros(len(v), dtype=np.int64)
        # nulls (NaN/NaT) rank last: their searchsorted position is
        # comparison-dependent, pin them to the final partition
        null = pd.isna(v)
        if null.any():
            p = np.where(null, len(barr), p)
        return p.astype(np.int64)

    # pre-pass: per-partition row counts (column-pruned, no shuffle)
    nparts = len(barr) + 1

    def count_parts(batch: pa.Table) -> pa.Table:
        c = np.bincount(part_of(batch), minlength=nparts)
        return pa.table({"c": pa.array(c, type=pa.int64())})

    counts = np.zeros(nparts, dtype=np.int64)
    for b in ds.select_columns([key]).map_batches(
        count_parts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = b.column("c").to_numpy(zero_copy_only=False)
        counts += arr.reshape(-1, nparts).sum(axis=0)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def tag(batch: pa.Table) -> pa.Table:
        return pack_by_bucket(batch, part_of(batch))

    sort_cols = [key, *tiebreak_cols]

    def rank_bucket(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        df = df.sort_values(sort_cols, kind="mergesort", ignore_index=True,
                            na_position="last")
        df[rank_col] = offsets[pid] + 1 + np.arange(len(df), dtype=np.int64)
        return pandas_to_arrow(df)

    bucketed = ds.map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return bucketed.groupby(_BUCKET).map_groups(rank_bucket, batch_format="pyarrow")


def zorder_key(arrays, *, bits: int = 16) -> np.ndarray:
    """Morton / Z-order key: interleave the low ``bits`` bits of each
    column round-robin (column 0 owns the least-significant lane) —
    the space-filling-curve clustering key behind multi-column data
    layout (Delta OPTIMIZE ZORDER class): sorting by it co-locates rows
    close in EVERY keyed dimension, so range predicates on any of the
    columns prune contiguous runs of row groups instead of scattering.

    ``arrays``: list of non-negative integer arrays; values must fit in
    ``bits`` bits (loud error otherwise — a silently-masked high bit
    would interleave garbage).  d columns × ``bits`` ≤ 64.  Vectorized:
    d·bits shift-or passes over the whole array, no per-row Python."""
    arrays = [np.asarray(a) for a in arrays]
    d = len(arrays)
    if d * bits > 64:
        raise ValueError(f"zorder_key: {d} cols × {bits} bits > 64")
    z = np.zeros(len(arrays[0]), dtype=np.uint64)
    for j, a in enumerate(arrays):
        if a.dtype.kind not in "iu":
            raise TypeError(f"zorder_key: column {j} is not integer")
        if len(a) and (a.min() < 0 or a.max() >= (1 << bits)):
            raise ValueError(
                f"zorder_key: column {j} outside [0, 2^{bits}) — quantize "
                "or bucket it first")
        av = a.astype(np.uint64)
        for i in range(bits):
            z |= ((av >> np.uint64(i)) & np.uint64(1)) << np.uint64(i * d + j)
    return z.view(np.int64)


def with_zorder(ds, cols, *, bits: int = 16, out_col: str = "zkey"):
    """Append the Z-order key of integer columns (see :func:`zorder_key`);
    feed the result to :func:`range_partition_sort` / the bucket writer
    to produce Z-clustered output files."""

    def fn(batch: pa.Table) -> pa.Table:
        z = zorder_key(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in cols],
            bits=bits)
        return batch.append_column(out_col, pa.array(z, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def zorder_sql_expr(cols, *, bits: int = 16) -> str:
    """The DuckDB expression computing exactly :func:`zorder_key` of the
    given integer column expressions — kept next to the numpy
    implementation so the two cannot drift (the sql_hash_cte pattern,
    stages/split.py)."""
    d = len(cols)
    # CAST everything to BIGINT: DuckDB's << on INTEGER overflows at 31
    terms = [f"(((CAST({c} AS BIGINT) >> {i}) & CAST(1 AS BIGINT)) "
             f"<< {i * d + j})"
             for i in range(bits) for j, c in enumerate(cols)]
    return "(" + " + ".join(terms) + ")"


__all__ += ["zorder_key", "with_zorder", "zorder_sql_expr"]


def with_watermark(ds, order_col: str, ts_col: str, *,
                   lateness: str = "1h", late_col: str = "is_late",
                   wm_col: str = "watermark", num_partitions: int = 64,
                   seed: int = 42):
    """Event-time WATERMARK / late-data detection in batch — the
    streaming-semantics audit ("which rows arrived after the watermark
    had passed their event time?") that sizes allowed-lateness before a
    pipeline goes online: row i is late iff

        ts_i < max(ts over rows STRICTLY BEFORE i in arrival order) − lateness

    with arrival order given by ``order_col`` (an ingest sequence /
    id).  ``wm_col`` carries the per-row watermark (null before any
    predecessor exists — the first arrival is never late).

    Scale shape — a distributed ORDERED PREFIX-MAX, two cheap passes +
    one exchange: range-partition on sampled ``order_col`` boundaries,
    a column-pruned pre-pass takes each partition's max ts
    (np.maximum partials → a num_partitions driver array) whose
    EXCLUSIVE prefix max seeds each partition, then one bucketed
    exchange where each partition sorts locally and runs a vectorized
    shift+cummax.  No global sort, no single-node scan.
    """
    import pandas as pd

    from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET

    NEG = np.iinfo(np.int64).min
    lateness_us = int(pd.Timedelta(lateness).value // 1000)

    ds = ds.materialize()  # 3 reads: boundaries, max pre-pass, shuffle
    bounds = sample_boundaries(ds, order_col, num_partitions, seed=seed)
    barr = np.asarray(bounds)
    nparts = len(barr) + 1

    def part_of(batch: pa.Table) -> np.ndarray:
        v = batch.column(order_col).to_numpy(zero_copy_only=False)
        if len(barr):
            return np.searchsorted(barr, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    def max_parts(batch: pa.Table) -> pa.Table:
        p = part_of(batch)
        t = (batch.column(ts_col).to_numpy()
             .astype("datetime64[us]").astype(np.int64))
        out = np.full(nparts, NEG, dtype=np.int64)
        np.maximum.at(out, p, t)
        return pa.table({"m": pa.array(out, type=pa.int64())})

    gmax = np.full(nparts, NEG, dtype=np.int64)
    for b in ds.select_columns([order_col, ts_col]).map_batches(
        max_parts, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        arr = b.column("m").to_numpy(zero_copy_only=False)
        gmax = np.maximum(gmax, arr.reshape(-1, nparts).max(axis=0))
    # exclusive prefix max: what partitions BEFORE pid have seen
    prefix_excl = np.concatenate(
        [[NEG], np.maximum.accumulate(gmax)[:-1]])

    def tag(batch: pa.Table) -> pa.Table:
        return pack_by_bucket(batch, part_of(batch))

    def wm_bucket(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        df = df.sort_values(order_col, kind="mergesort", ignore_index=True)
        t = (df[ts_col].to_numpy().astype("datetime64[us]")
             .astype(np.int64))
        prev = np.concatenate(
            [[NEG], np.maximum.accumulate(t)[:-1]]) if len(t) else t
        combined = np.maximum(prev, prefix_excl[pid])
        has = combined != NEG
        wm_us = combined - lateness_us
        wm = pd.Series(wm_us.view("datetime64[us]"))
        wm[~has] = pd.NaT
        df[wm_col] = wm
        df[late_col] = (has & (t < wm_us)).astype(np.int64)
        return pandas_to_arrow(df)

    bucketed = ds.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return bucketed.groupby(_BUCKET).map_groups(wm_bucket,
                                                batch_format="pyarrow")


__all__.append("with_watermark")


def with_group_percent_rank(
    ds,
    group_col: str,
    value_col: str,
    *,
    rank_col: str = "pct_rank",
    num_partitions: int = 64,
    seed: int = 42,
):
    """Per-row PERCENT_RANK within each group — the rank-based
    normalization transform ((min-tie-rank − 1)/(n − 1), SQL
    ``PERCENT_RANK()`` semantics): maps any value distribution onto
    [0, 1] per group, robust to outliers where z-scoring is not, and
    the first half of a rank-gauss transform.

    Same partition-prefix shape as :func:`with_global_rank` but GROUPED
    and tie-aware without a tiebreak column: a no-shuffle
    (group, partition) count pre-pass gives each partition its rank
    offset, one exchange sorts locally and assigns every tie block its
    MIN rank (RANK(), not ROW_NUMBER, so no tiebreak order leaks into
    the output).  Division of exact integers ⇒ bit-identical to the SQL
    window at any layout.  Single-row groups get 0.0 (DuckDB's
    convention).  Null values rank last.
    """
    import pandas as pd

    from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET

    ds = ds.materialize()
    bounds = sample_boundaries(ds, value_col, num_partitions, seed=seed)
    barr = np.asarray(bounds, dtype=np.float64)
    nparts = len(barr) + 1

    def _part(batch: pa.Table) -> np.ndarray:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if len(barr):
            p = np.searchsorted(barr, v, side="right")
        else:
            p = np.zeros(len(v), dtype=np.int64)
        null = pd.isna(v)
        if null.any():
            p = np.where(null, len(barr), p)
        return p.astype(np.int64)

    # pre-pass: (group, partition) counts → rank offsets + group totals
    cnt: dict = {}

    def counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(),
                                   use_na_sentinel=False)
        cell = codes * nparts + _part(t)
        c = np.bincount(cell, minlength=len(uniq) * nparts)
        nz = np.flatnonzero(c)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "c": pa.array(c[nz], type=pa.int64()),
        })

    for b in ds.select_columns([group_col, value_col]).map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        for g, p, c in zip(b.column(group_col).to_pylist(),
                           b.column("p").to_pylist(),
                           b.column("c").to_pylist()):
            a = cnt.setdefault(g, np.zeros(nparts, dtype=np.int64))
            a[p] += c
    off = {g: np.concatenate([[0], np.cumsum(a)[:-1]])
           for g, a in cnt.items()}
    tot = {g: int(a.sum()) for g, a in cnt.items()}

    def tag(batch: pa.Table) -> pa.Table:
        return pack_by_bucket(batch, _part(batch))

    def rank_bucket(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return pandas_to_arrow(df)
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        v = df[value_col].to_numpy()
        order = np.lexsort((v, codes))   # NaN sorts last within group
        codes_s, v_s = codes[order], v[order]
        new = np.empty(len(v_s), dtype=bool)
        new[0] = True
        vne = (v_s[1:] != v_s[:-1]) & ~(pd.isna(v_s[1:]) & pd.isna(v_s[:-1]))
        new[1:] = (codes_s[1:] != codes_s[:-1]) | vne
        gstart = np.empty(len(v_s), dtype=bool)
        gstart[0] = True
        gstart[1:] = codes_s[1:] != codes_s[:-1]
        idx = np.arange(len(v_s), dtype=np.int64)
        gfirst = idx[gstart][np.cumsum(gstart) - 1]
        local = idx - gfirst                      # 0-based within group
        # min tie rank: the local index at each tie-block start
        blk_start_local = local[new][np.cumsum(new) - 1]
        offs = np.array([off[g][pid] for g in
                         np.asarray(uniq, dtype=object)], dtype=np.int64)
        rank = offs[codes_s] + blk_start_local + 1   # 1-based RANK()
        n = np.array([tot[g] for g in np.asarray(uniq, dtype=object)],
                     dtype=np.int64)[codes_s]
        pct = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        out = df.iloc[order].reset_index(drop=True)
        out[rank_col] = pct
        return pandas_to_arrow(out)

    return (ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
              .groupby(_BUCKET)
              .map_groups(rank_bucket, batch_format="pyarrow"))


__all__.append("with_group_percent_rank")


def _ndtri(p: np.ndarray) -> np.ndarray:
    """Vectorized inverse normal CDF (Acklam's rational approximation,
    |relative error| < 1.15e-9 over (0,1) — published constants; scipy
    is not in this environment).  Vectorized numpy throughout."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    p = np.asarray(p, dtype=np.float64)
    out = np.empty_like(p)
    plow, phigh = 0.02425, 1 - 0.02425
    lo = p < plow
    hi = p > phigh
    mid = ~(lo | hi)
    if mid.any():
        q = p[mid] - 0.5
        r = q * q
        out[mid] = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r
                      + a[4]) * r + a[5]) * q
                    / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r
                        + b[4]) * r + 1))
    if lo.any():
        q = np.sqrt(-2 * np.log(p[lo]))
        out[lo] = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                     + c[4]) * q + c[5])
                   / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    if hi.any():
        q = np.sqrt(-2 * np.log(1 - p[hi]))
        out[hi] = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q
                      + c[4]) * q + c[5])
                    / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    return out


def with_rank_gauss(
    ds,
    group_col: str,
    value_col: str,
    *,
    out_col: str = "rank_gauss",
    eps: float = 1e-6,
    num_partitions: int = 64,
    seed: int = 42,
):
    """RankGauss transform per group: value → percent_rank → inverse
    normal CDF, the rank-based Gaussianization that made gradient-
    boosted/NN tabular pipelines famous — any input distribution maps
    to ≈N(0,1) per group, outliers land at bounded z instead of
    dominating, and the transform is monotonic (order-preserving).

    Composition: :func:`with_group_percent_rank` (distributed min-tie
    RANK, bit-deterministic) → clip to [eps, 1−eps] (so extreme ranks
    stay finite) → Acklam's inverse-normal approximation, vectorized
    per batch.  Not SQL-expressible (DuckDB has no inverse normal) —
    pinned by property tests instead (monotone, moments, round-trip).
    """
    ranked = with_group_percent_rank(
        ds, group_col, value_col, rank_col="__pct",
        num_partitions=num_partitions, seed=seed)

    def fin(t: pa.Table) -> pa.Table:
        p = t.column("__pct").to_numpy(zero_copy_only=False)
        z = _ndtri(np.clip(p, eps, 1.0 - eps))
        cols = {c: t.column(c) for c in t.column_names if c != "__pct"}
        cols[out_col] = pa.array(z)
        return pa.table(cols)

    return ranked.map_batches(fin, batch_format="pyarrow",
                              zero_copy_batch=True)


__all__ += ["with_rank_gauss"]
