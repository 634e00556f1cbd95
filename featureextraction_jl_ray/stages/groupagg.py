"""Grouped aggregation helpers (SURVEY.md §2-B A2/A4/R2-per-group).

``grouped_aggregate`` pre-aggregates inside ``map_batches`` (one partial
row per key per batch) before the keyed shuffle, so the exchange moves
per-key partials instead of raw rows — the combiner pattern the Ray guide
mandates for scale.  ``grouped_topn`` co-buckets keys and takes the top-n
per key with vectorized pandas inside each bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of_multi
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from .blobshuffle import pack_by_bucket, pack_pandas, unpack_table

# the blob exchange hardwires the partition column name — share it
from .blobshuffle import _BUCKET  # "__fx_bucket"

__all__ = ["grouped_aggregate", "grouped_topn", "grouped_count_distinct",
           "grouped_quantile", "grouped_quantile_sketch",
           "grouped_count_distinct_hll", "grouped_heavy_hitters",
           "pivot_aggregate", "rollup_aggregate", "cube_aggregate",
           "grouped_vector_mean", "grouped_ols", "grouped_string_agg"]

_PARTIALIZABLE = {"sum", "count", "min", "max", "mean", "var", "std",
                  "skew", "kurt"}


def grouped_aggregate(ds, key_cols, aggs: dict[str, tuple[str, str]], *, num_buckets: int = 64):
    """Grouped aggregates with map-side partial aggregation.

    ``aggs``: {out_name: (col, fn)} with fn ∈ sum/count/min/max/mean/
    var/std/skew/kurt (var/std are SAMPLE variance/stddev, ddof=1;
    skew/kurt are the sample-adjusted G1 / excess-G2 statistics — the
    Excel/pandas/DuckDB convention, NULL below n=3 / n=4 or at zero
    variance — composed from centered-moment partials (n, mean, M2, M3,
    M4) shifted to the grand mean with the exact binomial expansion;
    pin outputs to a rounding grid when hash-comparing).
    Example: {"sum_qty": ("l_quantity", "sum"), "n": ("l_orderkey", "count")}

    3-tuple form {out_name: (value_col, "argmin"|"argmax", order_col)}
    gives the value at the key's min/max ``order_col`` (first/last-touch
    features) — a MERGEABLE (order, value) pair partial, so it shuffles
    one pair per key per batch like every other agg here.  Ties on
    order resolve to the smallest value (lexicographic (order, value)
    min / (−order, value) min), which an SQL oracle mirrors with
    ``FIRST_VALUE(v) OVER (ORDER BY o [DESC], v)``.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    arg_aggs: dict[str, tuple[str, str, str]] = {}
    plain: dict[str, tuple[str, str]] = {}
    for name, spec in aggs.items():
        if len(spec) == 3:
            vcol, fn, ocol = spec
            if fn not in ("argmin", "argmax"):
                raise ValueError(f"3-tuple agg must be argmin/argmax, got {fn!r}")
            arg_aggs[name] = (vcol, ocol, "min" if fn == "argmin" else "max")
        else:
            col, fn = spec
            if fn not in _PARTIALIZABLE:
                raise ValueError(f"unsupported agg {fn!r} for {name}")
            plain[name] = (col, fn)

    # mean = Σx/n from (Σx, n) partials (int sums stay bit-exact for the
    # integer-microsecond gate contract); var/std from (n, mean, M2)
    # partials merged with the exact Chan et al. (1979) decomposition
    # M2 = Σ M2_i + Σ n_i (mean_i − mean)² — immune to the int64 Σx²
    # wrap AND to the |mean| ≫ std cancellation of the Σx² form.
    partial_cols: dict[str, tuple[str, str]] = {}
    for name, (col, fn) in plain.items():
        if fn == "mean":
            partial_cols[f"__s_{name}"] = (col, "sum")
            partial_cols[f"__c_{name}"] = (col, "count")
        elif fn in ("var", "std"):
            partial_cols[f"__m_{name}"] = (col, "mean")
            partial_cols[f"__w_{name}"] = (col, "m2")
            partial_cols[f"__c_{name}"] = (col, "count")
        elif fn in ("skew", "kurt"):
            partial_cols[f"__m_{name}"] = (col, "mean")
            partial_cols[f"__w_{name}"] = (col, "m2")
            partial_cols[f"__h_{name}"] = (col, "m3")
            if fn == "kurt":
                partial_cols[f"__k_{name}"] = (col, "m4")
            partial_cols[f"__c_{name}"] = (col, "count")
        else:
            partial_cols[name] = (col, fn)

    def _arg_select(df: pd.DataFrame, out: pd.DataFrame, name: str,
                    ocol: str, vcol: str, kind: str):
        """Lexicographic (order, value) extremum per key → __o_/value cols."""
        srt = df.sort_values([ocol, vcol], ascending=[kind == "min", True],
                             kind="mergesort")
        fo = srt.groupby(key_cols, sort=False, dropna=False)[[ocol, vcol]].first()
        out[f"__o_{name}"] = fo[ocol]
        out[name] = fo[vcol]

    def partial(batch: pa.Table) -> pa.Table:
        # pandas' string hash table truncates at embedded NUL (2.2 khash
        # C-string semantics): groupby would silently MERGE distinct
        # keys like "a\x00b" and "a\x00c".  Keys are short — one C scan;
        # a loud error beats a silently wrong aggregate.
        for kc in key_cols:
            col = batch.column(kc)
            if pa.types.is_string(col.type) or pa.types.is_large_string(
                    col.type):
                import pyarrow.compute as _pc

                bad = _pc.any(_pc.match_substring(col, "\x00")).as_py()
                if bad:
                    raise ValueError(
                        f"grouped_aggregate: key column {kc!r} contains an "
                        "embedded NUL byte — pandas groupby merges such "
                        "keys (C-string hash table); strip or escape NULs "
                        "upstream")
        df = arrow_to_pandas_safe(batch)
        g = df.groupby(key_cols, sort=False, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        for name, (col, fn) in partial_cols.items():
            if fn == "m2":
                # within-batch centered sum of squares: n·var(ddof=0)
                out[name] = g[col].var(ddof=0) * g[col].count()
            elif fn in ("m3", "m4"):
                # within-batch centered power sums Σ(x−mean)^p — one C
                # transform + one C groupby-sum, no Python per group
                d = (df[col] - g[col].transform("mean")).to_numpy(
                    dtype=np.float64)
                p = 3 if fn == "m3" else 4
                out[name] = (
                    pd.Series(d ** p, index=df.index)
                    .groupby([df[k] for k in key_cols], sort=False,
                             dropna=False)
                    .sum()
                )
            else:
                out[name] = getattr(g[col], fn)()
        for name, (vcol, ocol, kind) in arg_aggs.items():
            _arg_select(df, out, name, ocol, vcol, kind)
        out = out.reset_index()
        b = bucket_of_multi(
            [out[c].to_numpy() for c in key_cols], num_buckets, seed=29
        )
        return pack_pandas(out, b)

    _MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def final(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        g = df.groupby(key_cols, sort=False, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        for name, (_, fn) in partial_cols.items():
            if fn in ("mean", "m2", "m3", "m4"):
                continue  # var/std/skew/kurt components — merged below
            out[name] = getattr(g[name], _MERGE[fn])()
        # Chan merge needs per-partial-row group means → compute while out
        # is still indexed by the group keys (alignment by index)
        gk = [df[k] for k in key_cols]
        for name, (col, fn) in plain.items():
            if fn not in ("var", "std"):
                continue
            c = df[f"__c_{name}"].to_numpy(dtype=np.float64)
            m = df[f"__m_{name}"].to_numpy(dtype=np.float64)
            w = df[f"__w_{name}"].to_numpy(dtype=np.float64)
            nm = pd.Series(np.where(c > 0, c * m, 0.0), index=df.index)
            cs = pd.Series(c, index=df.index)
            with np.errstate(invalid="ignore", divide="ignore"):
                grand = (
                    nm.groupby(gk, sort=False, dropna=False).transform("sum")
                    / cs.groupby(gk, sort=False, dropna=False).transform("sum")
                ).to_numpy()
                contrib = pd.Series(
                    np.where(c > 0, w + c * (m - grand) ** 2, 0.0),
                    index=df.index,
                )
                m2 = contrib.groupby(gk, sort=False, dropna=False).sum()
                n = out[f"__c_{name}"].to_numpy().astype(np.float64)
                v = np.where(n > 1, m2.to_numpy() / (n - 1), np.nan)
            out[name] = pd.Series(np.sqrt(v) if fn == "std" else v,
                                  index=m2.index)
        for name, (col, fn) in plain.items():
            if fn not in ("skew", "kurt"):
                continue
            c = df[f"__c_{name}"].to_numpy(dtype=np.float64)
            m = df[f"__m_{name}"].to_numpy(dtype=np.float64)
            w = df[f"__w_{name}"].to_numpy(dtype=np.float64)
            h = df[f"__h_{name}"].to_numpy(dtype=np.float64)
            nm = pd.Series(np.where(c > 0, c * m, 0.0), index=df.index)
            cs = pd.Series(c, index=df.index)
            with np.errstate(invalid="ignore", divide="ignore"):
                grand = (
                    nm.groupby(gk, sort=False, dropna=False).transform("sum")
                    / cs.groupby(gk, sort=False, dropna=False).transform("sum")
                ).to_numpy()
                d = m - grand
                # shift each partial's centered moments to the grand mean
                # (binomial expansion: Σ(x−g)^p = Σ_q C(p,q) δ^(p−q) Σ(x−m)^q)
                s2 = np.where(c > 0, w + c * d ** 2, 0.0)
                if fn == "skew":
                    sp = np.where(c > 0, h + 3.0 * d * w + c * d ** 3, 0.0)
                else:
                    k4 = df[f"__k_{name}"].to_numpy(dtype=np.float64)
                    sp = np.where(
                        c > 0,
                        k4 + 4.0 * d * h + 6.0 * d ** 2 * w + c * d ** 4,
                        0.0,
                    )
                g2 = pd.Series(s2, index=df.index).groupby(
                    gk, sort=False, dropna=False).sum()
                gp = pd.Series(sp, index=df.index).groupby(
                    gk, sort=False, dropna=False).sum()
                n = out[f"__c_{name}"].to_numpy().astype(np.float64)
                m2t = g2.to_numpy()
                mpt = gp.to_numpy()
                if fn == "skew":
                    ok = (n >= 3) & (m2t > 0)
                    g1 = np.where(ok, (mpt / n) / np.maximum(m2t / n, 1e-300) ** 1.5, np.nan)
                    val = np.where(ok, g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0), np.nan)
                else:
                    ok = (n >= 4) & (m2t > 0)
                    pg2 = np.where(ok, (mpt / n) / np.maximum(m2t / n, 1e-300) ** 2 - 3.0, np.nan)
                    val = np.where(
                        ok,
                        ((n + 1.0) * pg2 + 6.0) * (n - 1.0) / ((n - 2.0) * (n - 3.0)),
                        np.nan,
                    )
            out[name] = pd.Series(val, index=g2.index)
        for name, (_, __, kind) in arg_aggs.items():
            # merge = same lexicographic extremum over the partial pairs
            _arg_select(df, out, name, f"__o_{name}", name, kind)
        out = out.reset_index()
        out = out.drop(columns=[f"__o_{n}" for n in arg_aggs])
        for name, (col, fn) in plain.items():
            if fn == "mean":
                out[name] = out[f"__s_{name}"] / out[f"__c_{name}"]
                out = out.drop(columns=[f"__s_{name}", f"__c_{name}"])
            elif fn in ("var", "std", "skew", "kurt"):
                out = out.drop(columns=[f"__c_{name}"])
        return pandas_to_arrow(out)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
    return partials.groupby(_BUCKET).map_groups(final, batch_format="pyarrow")


def grouped_count_distinct(ds, key_cols, col: str, *, out_name: str = "n_distinct",
                           num_buckets: int = 64):
    """Exact per-key COUNT(DISTINCT col) in two exchanges.

    Exchange 1 partitions on hash(key, col) — duplicates of the same
    (key, value) land together and collapse, and a hot KEY still spreads
    over buckets because the value participates in the hash (no salting
    needed).  Exchange 2 moves one row per surviving distinct pair and
    counts per key.  Map-side drop_duplicates shrinks both exchanges.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = key_cols + [col]

    def local_distinct(batch: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(batch)[cols].drop_duplicates()
        b = bucket_of_multi(
            [df[c].to_numpy() for c in cols], num_buckets, seed=37
        )
        return pack_pandas(df, b)

    def dedup_pairs(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))[cols].drop_duplicates()
        b = bucket_of_multi(
            [df[c].to_numpy() for c in key_cols], num_buckets, seed=41
        )
        return pack_pandas(df, b)

    def count_per_key(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        out = (
            df.groupby(key_cols, sort=False, dropna=False)
            .size()
            .rename(out_name)
            .reset_index()
        )
        return pandas_to_arrow(out)

    return (
        ds.map_batches(local_distinct, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(dedup_pairs, batch_format="pyarrow")
        .groupby(_BUCKET)
        .map_groups(count_per_key, batch_format="pyarrow")
    )


def grouped_quantile(ds, key_cols, value_col: str, qs=(0.5,), *,
                     num_buckets: int = 64, prefix: str = "q"):
    """EXACT per-key quantiles (linear interpolation, same convention as
    pandas.quantile / DuckDB quantile_cont).

    Exact quantiles need every value of a key in one place, so the
    exchange moves (key, value) pairs co-bucketed by key — unlike the
    partialized aggregates above there is no map-side shrink.  At corpus
    scale prefer a mergeable sketch (t-digest / KLL) if ±ε is
    acceptable; this operator is the exact path and says so.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(batch)[key_cols + [value_col]]
        b = bucket_of_multi(
            [df[c].to_numpy() for c in key_cols], num_buckets, seed=43
        )
        return pack_pandas(df, b)

    def quantiles(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        g = df.groupby(key_cols, sort=False, dropna=False)[value_col]
        out = pd.DataFrame(index=g.size().index)
        for q in qs:
            out[f"{prefix}{int(q * 100)}"] = g.quantile(q)
        return pandas_to_arrow(out.reset_index())

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(quantiles, batch_format="pyarrow")
    )


def grouped_topn(
    ds,
    key_cols,
    order_cols,
    *,
    n: int,
    ascending: bool | list[bool] = False,
    num_buckets: int = 64,
):
    """Top-n rows per key ordered by ``order_cols`` (deterministic: make
    the last order col a unique tiebreak)."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of_multi(
            [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols],
            num_buckets,
            seed=31,
        )
        return pack_by_bucket(batch, b)

    def local_prune(batch: pa.Table) -> pa.Table:
        # map-side prune: keep at most n rows per key per batch before the
        # shuffle — the exchange then moves ≤ n rows per (key, batch)
        df = arrow_to_pandas_safe(batch)
        pruned = (
            df.sort_values(order_cols, ascending=ascending, kind="mergesort")
            .groupby(key_cols, sort=False, dropna=False)
            .head(n)
        )
        return pandas_to_arrow(pruned)

    def topn(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        out = (
            df.sort_values(order_cols, ascending=ascending, kind="mergesort")
            .groupby(key_cols, sort=False, dropna=False)
            .head(n)
        )
        return pandas_to_arrow(out)

    pruned = ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True)
    bucketed = pruned.map_batches(add_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
    return bucketed.groupby(_BUCKET).map_groups(topn, batch_format="pyarrow")


def grouped_string_agg(ds, key_cols, value_col: str, *, sep: str = ",",
                       out_col: str | None = None, distinct: bool = False,
                       num_buckets: int = 64):
    """Per-key ORDERED string concatenation — SQL's
    ``string_agg(x, sep ORDER BY x)`` (value order, ascending; nulls
    skipped like the SQL aggregate).

    Ordered concatenation is not partially mergeable as strings, so the
    (key, value) rows ride ONE blob-packed exchange — column-pruned to
    exactly those columns — and each bucket sorts + joins its keys with
    pandas C kernels.  ``distinct=True`` additionally drops duplicate
    (key, value) rows per batch BEFORE the shuffle (map-side combiner:
    the exchange then moves distinct pairs per batch, the bucket side
    dedups globally), mirroring ``string_agg(DISTINCT x, sep ORDER BY
    x)``."""
    from .partition import bucketed_map_groups

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    out_col = out_col or f"{value_col}_agg"
    cols = [*key_cols, value_col]

    pruned = ds.select_columns(cols)
    if distinct:
        def local_distinct(batch: pa.Table) -> pa.Table:
            df = arrow_to_pandas_safe(batch)
            return pandas_to_arrow(df.drop_duplicates(ignore_index=True))

        pruned = pruned.map_batches(local_distinct, batch_format="pyarrow",
                                    zero_copy_batch=True)

    def concat(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        df = df[df[value_col].notna()]
        if distinct:
            df = df.drop_duplicates(ignore_index=True)
        df = df.sort_values(value_col, kind="mergesort")
        out = (df.groupby(key_cols, sort=False, dropna=False)[value_col]
               .agg(sep.join).reset_index().rename(columns={value_col: out_col}))
        return pandas_to_arrow(out)

    return bucketed_map_groups(pruned, key_cols, concat,
                               num_buckets=num_buckets)


def grouped_quantile_sketch(ds, key_cols, value_col: str, qs=(0.5,), *,
                            sketch_size: int = 1024, num_buckets: int = 64,
                            prefix: str = "q", seed: int = 47):
    """APPROXIMATE per-key quantiles via a mergeable bottom-k sample —
    the corpus-scale path ``grouped_quantile`` points at.

    Each (key, value) row gets a deterministic hash priority; keeping the
    ``sketch_size`` smallest priorities per key is a mergeable uniform
    sample (bottom-k / KMV):  min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)),
    so partials combine associatively.  Map-side partials bound the
    exchange at sketch_size rows per key per batch (vs every row for the
    exact operator); the reduce merges partials and reads quantiles off
    the sample.  Error is the usual sampling error O(1/√k) in rank —
    assert tolerance, not equality, against exact oracles.
    """
    from ..functions.hashing import stable_hash_array

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = key_cols + [value_col]

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values("__prio", kind="mergesort")
            .groupby(key_cols, sort=False, dropna=False)
            .head(sketch_size)
        )

    def partial(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import combine_hashes

        df = arrow_to_pandas_safe(batch)[cols]
        # priority = hash(value) mixed with the value's occurrence index,
        # so duplicate VALUES keep distinct priorities (a pure value-hash
        # would sample distinct values, not rows, skewing quantiles of
        # heavy-duplicate distributions).  The occurrence index is
        # batch-local: deterministic for a fixed input layout, approximate
        # across relayouts — fine for a ±O(1/√k)-rank estimator.
        dup = (
            df.groupby(key_cols + [value_col], sort=False, dropna=False)
            .cumcount()
            .to_numpy()
        )
        df["__prio"] = combine_hashes(
            stable_hash_array(df[value_col].to_numpy(), seed=seed),
            stable_hash_array(dup, seed=seed + 1),
        )
        df = bottomk(df)
        b = bucket_of_multi(
            [df[c].to_numpy() for c in key_cols], num_buckets, seed=53
        )
        return pack_pandas(df, b)

    def final(tbl: pa.Table) -> pa.Table:
        df = bottomk(arrow_to_pandas_safe(unpack_table(tbl)))
        g = df.groupby(key_cols, sort=False, dropna=False)[value_col]
        out = pd.DataFrame(index=g.size().index)
        for q in qs:
            out[f"{prefix}{int(q * 100)}"] = g.quantile(q)
        return pandas_to_arrow(out.reset_index())

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_count_distinct_hll(ds, key_cols, col: str, *,
                               out_name: str = "n_distinct",
                               precision: int = 12, num_buckets: int = 64,
                               seed: int = 59):
    """APPROXIMATE per-key COUNT(DISTINCT) via HyperLogLog — the
    corpus-scale path beside the exact two-exchange operator.

    Per batch, each key gets a 2^precision-register sketch (register =
    max leading-zero rank of the hashed value within its register slot);
    register-wise max is associative, so partials merge in one keyed
    exchange of 2^precision bytes per key per batch — independent of row
    count.  Estimator: Flajolet et al. 2007 with the small-range
    linear-counting correction; standard error ≈ 1.04/√2^precision
    (≈1.6% at precision 12).
    """
    from ..functions.hashing import stable_hash_array

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    m = 1 << precision
    alpha = 0.7213 / (1.0 + 1.079 / m)  # bias constant for m ≥ 128

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(batch)[key_cols + [col]]
        h = stable_hash_array(df[col].to_numpy(), seed=seed)
        slot = (h >> np.uint64(64 - precision)).astype(np.int64)
        rest = (h << np.uint64(precision)) | np.uint64((1 << precision) - 1)
        # rank = 1 + number of leading zeros of the remaining 64-p bits
        nz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):  # branchless clz
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            nz[mask] += shift
            v[mask] <<= np.uint64(shift)
        rank = nz.astype(np.int64) + 1
        keys, inv = np.unique(
            pd.MultiIndex.from_frame(df[key_cols]).to_numpy() if len(key_cols) > 1
            else df[key_cols[0]].to_numpy(),
            return_inverse=True,
        )
        regs = np.zeros((len(keys), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, slot), rank.astype(np.uint8))
        out = pd.DataFrame({key_cols[0] if len(key_cols) == 1 else "__key": keys})
        if len(key_cols) > 1:
            out[key_cols] = pd.DataFrame(list(keys), columns=key_cols)
            out = out.drop(columns="__key")
        out["__hll"] = [r.tobytes() for r in regs]
        b = bucket_of_multi(
            [out[c].to_numpy() for c in key_cols], num_buckets, seed=61
        )
        return pack_pandas(out, b)

    def merge_estimate(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        rows = []
        for key, g in df.groupby(key_cols, sort=False, dropna=False):
            regs = np.zeros(m, dtype=np.uint8)
            for b in g["__hll"]:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
            zeros = int((regs == 0).sum())
            if est <= 2.5 * m and zeros:
                est = m * np.log(m / zeros)  # linear counting, small range
            row = dict(zip(key_cols, key if isinstance(key, tuple) else (key,)))
            row[out_name] = int(round(est))
            rows.append(row)
        return pandas_to_arrow(pd.DataFrame(rows))

    return (
        ds.map_batches(sketch_batch, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(merge_estimate, batch_format="pyarrow")
    )


def _mg_compress(cnt: pd.DataFrame, key_cols, weight_col: str,
                 capacity: int) -> pd.DataFrame:
    """Misra–Gries compress: per key, keep ≤ ``capacity`` (value, weight)
    entries by subtracting the (capacity+1)-th largest weight from every
    entry and dropping the non-positive remainder.  Each surviving weight
    under-counts its true frequency by at most n_key/(capacity+1)
    (Misra & Gries 1982; mergeability per Agarwal et al. 2013,
    "Mergeable Summaries").
    """
    cnt = cnt.sort_values(weight_col, ascending=False, kind="mergesort")
    pos = cnt.groupby(key_cols, sort=False, dropna=False).cumcount()
    over = cnt.loc[pos == capacity, key_cols + [weight_col]].rename(
        columns={weight_col: "__thr"}
    )
    if not len(over):
        return cnt
    cnt = cnt.merge(over, on=key_cols, how="left")
    cnt["__thr"] = cnt["__thr"].fillna(0)
    cnt[weight_col] = cnt[weight_col] - cnt["__thr"]
    return cnt.loc[cnt[weight_col] > 0].drop(columns="__thr")


def grouped_heavy_hitters(ds, key_cols, col: str, *, k: int = 10,
                          capacity: int = 4096, num_buckets: int = 64,
                          count_name: str = "n", rank_name: str = "rank"):
    """Per-key top-k most frequent values via a mergeable Misra–Gries
    summary — the heavy-hitters member of the sketch family (beside the
    KMV quantile and HLL distinct-count sketches).

    Per batch, per key: exact value counts (a pandas groupby), then MG
    compress to ``capacity`` entries, so the keyed exchange is bounded at
    capacity rows per key per batch — independent of row count.  The
    reduce sums weights per (key, value), compresses once more, and emits
    the top ``k`` by (count desc, value asc) with a 1-based ``rank``.

    EXACT whenever no compress triggers (every batch and the merged
    summary hold ≤ capacity distinct values per key) — the driver oracle
    runs in that regime.  Otherwise each reported count under-counts by
    at most n_key/(capacity+1), and any value with true frequency above
    that bound is guaranteed present (the classical MG guarantee) —
    assert containment + tolerance, not equality, in that regime.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(batch)[key_cols + [col]]
        cnt = (
            df.groupby(key_cols + [col], sort=False, dropna=False)
            .size()
            .reset_index(name=count_name)
        )
        cnt = _mg_compress(cnt, key_cols, count_name, capacity)
        b = bucket_of_multi(
            [cnt[c].to_numpy() for c in key_cols], num_buckets, seed=67
        )
        return pack_pandas(cnt, b)

    def final(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        cnt = (
            df.groupby(key_cols + [col], sort=False, dropna=False)[count_name]
            .sum()
            .reset_index()
        )
        cnt = _mg_compress(cnt, key_cols, count_name, capacity)
        cnt = cnt.sort_values(
            [*key_cols, count_name, col],
            ascending=[*(True,) * len(key_cols), False, True],
            kind="mergesort",
        )
        cnt[rank_name] = cnt.groupby(key_cols, sort=False, dropna=False).cumcount() + 1
        cnt = cnt.loc[cnt[rank_name] <= k]
        cnt[count_name] = cnt[count_name].astype(np.int64)
        cnt[rank_name] = cnt[rank_name].astype(np.int64)
        return pandas_to_arrow(cnt)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pyarrow")
    )


def pivot_aggregate(ds, key_cols, pivot_col: str, value_col: str, *,
                    aggs: tuple[str, ...] = ("count", "sum"),
                    categories=None, prefix: str | None = None,
                    num_buckets: int = 64):
    """Wide per-key aggregate (pivot): one column per (category × agg)
    of ``value_col``, grouped by ``key_cols``.

    Scale shape: the pivot happens BATCH-SIDE — each batch appends the
    category-indicator partials (vectorized one-hot multiply), then the
    ordinary partial-aggregated exchange sums them, so the shuffle
    carries ONE wide partial row per key per batch regardless of the
    category fan-out, and the category column itself never shuffles.
    Vocabulary from a distributed distinct pass when not pinned (tiny by
    definition of "categorical"); pass ``categories`` to fix the output
    schema across datasets (the train/serve contract).

    ``aggs`` ⊆ {"count", "sum"}: count = rows of that category per key
    (int64), sum = Σ value over them (value nulls contribute 0).  Column
    names: ``{prefix}_{category}_n`` / ``{prefix}_{category}_sum``.
    """
    import pyarrow.compute as pc

    from .scale import _sanitize

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for a in aggs:
        if a not in ("count", "sum"):
            raise ValueError(f"pivot agg must be count/sum, got {a!r}")
    if categories is None:
        categories = sorted(ds.unique(pivot_col))
    categories = list(categories)
    prefix = prefix if prefix is not None else pivot_col

    names: dict[str, tuple[str, str]] = {}

    def widen(t: pa.Table) -> pa.Table:
        piv = t.column(pivot_col)
        val = pc.cast(pc.fill_null(t.column(value_col), 0.0), pa.float64())
        cols, arrs = [], []
        for cat in categories:
            flag = pc.fill_null(pc.equal(piv, pa.scalar(cat)), False)
            if "count" in aggs:
                cols.append(f"{prefix}_{_sanitize(cat)}_n")
                arrs.append(pc.cast(flag, pa.int64()))
            if "sum" in aggs:
                cols.append(f"{prefix}_{_sanitize(cat)}_sum")
                arrs.append(pc.if_else(flag, val, pa.scalar(0.0)))
        out = t.select(key_cols)
        for c, a in zip(cols, arrs):
            out = out.append_column(c, a)
        return out

    for cat in categories:
        s = _sanitize(cat)
        if "count" in aggs:
            names[f"{prefix}_{s}_n"] = (f"{prefix}_{s}_n", "sum")
        if "sum" in aggs:
            names[f"{prefix}_{s}_sum"] = (f"{prefix}_{s}_sum", "sum")

    wide = ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(wide, key_cols, names, num_buckets=num_buckets)


def _coarser_level_ds(finest, keep, key_cols, merged, num_buckets):
    """One coarser grouping-set level as a DISTRIBUTED re-aggregation of
    the finest-level Dataset; dropped keys padded with typed nulls."""
    schema = finest.schema()
    types = dict(zip(schema.names, schema.types))
    out_cols = list(schema.names)

    if keep:
        up = grouped_aggregate(finest, keep,
                               {n: (src, fn) for n, (src, fn) in merged.items()},
                               num_buckets=num_buckets)
    else:
        const = "__fx_all"

        def tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                const, pa.array(np.zeros(len(batch), dtype=np.int64)))

        up = grouped_aggregate(
            finest.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True),
            [const], {n: (src, fn) for n, (src, fn) in merged.items()},
            num_buckets=1,
        ).drop_columns([const])

    dropped = [c for c in key_cols if c not in keep]

    def pad(batch: pa.Table) -> pa.Table:
        for c in dropped:
            batch = batch.append_column(c, pa.nulls(len(batch), type=types[c]))
        return batch.select(out_cols)

    return up.map_batches(pad, batch_format="pyarrow", zero_copy_batch=True)


def _grouping_sets(ds, key_cols, aggs, subsets, *, num_buckets, max_rows,
                   output):
    """Shared rollup/cube skeleton: ONE distributed exchange at the
    finest level, then either a bounded driver-side re-aggregation
    (pandas, below ``max_rows``) or fully distributed re-aggregation of
    the finest Dataset per coarser level (above it / on request).

    The driver pull is the one place a grouping-set cardinality bound
    can silently not hold (e.g. a user_id rollup at corpus scale), so it
    is guarded: ``output='auto'`` switches to the Dataset path instead
    of materializing, ``output='pandas'`` raises loudly past the guard.
    """
    remerge = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for name, (col, fn) in aggs.items():
        if fn not in remerge:
            raise ValueError(
                f"grouping-set agg {name!r}: {fn!r} is not re-aggregatable; "
                "use sum/count/min/max (derive mean = sum/count downstream)")
    merged = {name: (name, remerge[fn]) for name, (_, fn) in aggs.items()}

    finest = grouped_aggregate(ds, key_cols, aggs,
                               num_buckets=num_buckets).materialize()
    n_finest = finest.count()
    if output == "auto":
        output = "pandas" if n_finest <= max_rows else "dataset"
    if output == "pandas" and n_finest > max_rows:
        raise RuntimeError(
            f"rollup/cube: finest level has {n_finest} keys > "
            f"max_rows={max_rows}; pass output='dataset' (distributed "
            "re-aggregation, no driver materialization) or raise max_rows")

    if output == "dataset":
        out = finest
        for keep in subsets:
            out = out.union(_coarser_level_ds(finest, keep, key_cols, merged,
                                              num_buckets))
        return out
    return finest.to_pandas(), merged


def rollup_aggregate(ds, key_cols, aggs: dict[str, tuple[str, str]], *,
                     num_buckets: int = 64, max_rows: int = 1_000_000,
                     output: str = "auto"):
    """ROLLUP grouping sets: aggregates at every key-prefix level
    ((k1..kn), (k1..kn−1), …, ()) with dropped keys as NULL.

    Scale shape: the FINEST level runs the ordinary partial-aggregated
    distributed exchange ONCE; every coarser level re-aggregates the
    finest RESULT.  Below ``max_rows`` finest keys that re-aggregation
    is driver-side pandas (returns a DataFrame); above it — or with
    ``output='dataset'`` — each level is its own distributed
    ``grouped_aggregate`` over the finest Dataset and a Dataset is
    returned (no driver materialization anywhere).  Only
    re-aggregatable fns (sum/count/min/max) are allowed — count
    partials merge by sum, like the distributed combiner itself.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    prefixes = [key_cols[:lvl] for lvl in range(len(key_cols) - 1, -1, -1)]
    res = _grouping_sets(ds, key_cols, aggs, prefixes,
                         num_buckets=num_buckets, max_rows=max_rows,
                         output=output)
    if not isinstance(res, tuple):
        return res
    df, merged = res
    levels = [df]
    cur = df
    for lvl in range(len(key_cols) - 1, -1, -1):
        keep = key_cols[:lvl]
        if keep:
            g = cur.groupby(keep, sort=False, dropna=False)
            up = pd.DataFrame(index=g.size().index)
            for name, (src, fn) in merged.items():
                up[name] = getattr(g[src], fn)()
            up = up.reset_index()
        else:
            up = pd.DataFrame({name: [getattr(cur[src], fn)()]
                               for name, (src, fn) in merged.items()})
        for c in key_cols[lvl:]:
            up[c] = pd.Series([None] * len(up), dtype=df[c].dtype
                              if df[c].dtype == object else object)
        levels.append(up[list(df.columns)])
        cur = up
    return pd.concat(levels, ignore_index=True)


def cube_aggregate(ds, key_cols, aggs: dict[str, tuple[str, str]], *,
                   num_buckets: int = 64, max_rows: int = 1_000_000,
                   output: str = "auto"):
    """CUBE grouping sets: aggregates at EVERY subset of ``key_cols``
    (2^k levels), dropped keys NULL — same scale shape and ``max_rows``
    / ``output`` contract as :func:`rollup_aggregate` (one distributed
    exchange at the finest level; coarser subsets re-aggregate the
    finest result driver-side below the guard, distributed above it)."""
    from itertools import combinations

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    subsets = [list(c) for r in range(len(key_cols) - 1, -1, -1)
               for c in combinations(key_cols, r)]
    res = _grouping_sets(ds, key_cols, aggs, subsets,
                         num_buckets=num_buckets, max_rows=max_rows,
                         output=output)
    if not isinstance(res, tuple):
        return res
    df, merged = res
    levels = [df]
    for keep in subsets:
        if keep:
            g = df.groupby(keep, sort=False, dropna=False)
            up = pd.DataFrame(index=g.size().index)
            for name, (src, fn) in merged.items():
                up[name] = getattr(g[src], fn)()
            up = up.reset_index()
        else:
            up = pd.DataFrame({name: [getattr(df[src], fn)()]
                               for name, (src, fn) in merged.items()})
        for c in key_cols:
            if c not in keep:
                up[c] = pd.Series([None] * len(up), dtype=object)
        levels.append(up[list(df.columns)])
    return pd.concat(levels, ignore_index=True)


def grouped_vector_mean(ds, key_col: str, vector_col: str, *,
                        num_buckets: int = 16, long_form: bool = False):
    """Per-key centroid of an embedding column: one (Σvec, n) partial
    row per key per batch through the exchange (the vector analog of the
    scalar mean combiner), merged and divided at the end.  ``long_form``
    explodes the result to (key, pos, mean_val) rows — the
    SQL-comparable shape (list-valued outputs don't hash stably through
    the driver gate)."""
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_of
    from ..functions.veccol import list_column_to_numpy, numpy_to_fixed_list_column

    def partial(t: pa.Table) -> pa.Table:
        X = list_column_to_numpy(t, vector_col)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": keys})
        g = df.groupby("k", sort=False)
        uk = g.size()
        sums = np.zeros((len(uk), X.shape[1] if X.ndim == 2 else 0))
        codes = g.ngroup().to_numpy()
        np.add.at(sums, codes, X)
        out = pa.table({
            key_col: pa.array(uk.index.to_numpy()),
            "__n": pa.array(uk.to_numpy().astype(np.int64)),
            "__sum": numpy_to_fixed_list_column(sums, pa.float64()),
        })
        return pack_by_bucket(
            out, bucket_of(uk.index.to_numpy(), num_buckets, seed=23))

    def final(t: pa.Table) -> pa.Table:
        S = list_column_to_numpy(t, "__sum")
        n = t.column("__n").to_numpy(zero_copy_only=False)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": keys})
        g = df.groupby("k", sort=False)
        uk = g.size()
        codes = g.ngroup().to_numpy()
        sums = np.zeros((len(uk), S.shape[1]))
        np.add.at(sums, codes, S)
        counts = np.zeros(len(uk), dtype=np.int64)
        np.add.at(counts, codes, n)
        means = sums / counts[:, None]
        if long_form:
            p = means.shape[1]
            return pa.table({
                key_col: pa.array(np.repeat(uk.index.to_numpy(), p)),
                "pos": pa.array(np.tile(np.arange(1, p + 1, dtype=np.int64),
                                        len(uk))),
                "mean_val": pa.array(means.reshape(-1)),
            })
        return pa.table({
            key_col: pa.array(uk.index.to_numpy()),
            "n": pa.array(counts),
            "centroid": numpy_to_fixed_list_column(means, pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
    return parts.groupby(_BUCKET).map_groups(
        lambda t: final(unpack_table(t)), batch_format="pyarrow")


def grouped_ols(ds, key_cols, x_col: str, y_col: str, *,
                slope_col: str = "slope", r2_col: str = "r2",
                num_buckets: int = 16):
    """Per-key simple linear regression (y on x) from PARTIALIZABLE
    co-moments: each batch contributes (n, Σx, Σy, Σxy, Σx², Σy²) per
    key, one bounded exchange merges them, and slope/R² come out of the
    closed form.  The per-entity TREND feature (e.g. value vs time).

    Numerical note: callers should CENTER x near the data origin (e.g.
    seconds since the corpus start, not epoch seconds) — slope and R²
    are shift-invariant, and centering keeps Σx² in the exactly-
    representable float64 range; SQL oracles can keep raw epochs because
    regr_slope/regr_r2 are computed stably.  Keys with zero x-variance
    (or < 2 rows) yield null, matching SQL."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def widen(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = pc.cast(t.column(x_col), pa.float64())
        y = pc.cast(t.column(y_col), pa.float64())
        out = t.select(key_cols)
        out = out.append_column("__x", x)
        out = out.append_column("__y", y)
        out = out.append_column("__xy", pc.multiply(x, y))
        out = out.append_column("__xx", pc.multiply(x, x))
        out = out.append_column("__yy", pc.multiply(y, y))
        return out

    sums = grouped_aggregate(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        key_cols,
        {"__n": ("__x", "count"), "__sx": ("__x", "sum"),
         "__sy": ("__y", "sum"), "__sxy": ("__xy", "sum"),
         "__sxx": ("__xx", "sum"), "__syy": ("__yy", "sum")},
        num_buckets=num_buckets)

    def final(t: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(t)
        n = df["__n"].to_numpy(dtype=float)
        sx, sy = df["__sx"].to_numpy(dtype=float), df["__sy"].to_numpy(dtype=float)
        sxy = df["__sxy"].to_numpy(dtype=float)
        sxx, syy = df["__sxx"].to_numpy(dtype=float), df["__syy"].to_numpy(dtype=float)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        cov = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(vx > 0, cov / vx, np.nan)
            r2 = np.where((vx > 0) & (vy > 0), (cov * cov) / (vx * vy), np.nan)
        out = df[key_cols].copy()
        out[slope_col] = slope
        out[r2_col] = r2
        return pandas_to_arrow(out)

    return sums.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def cohort_retention(ds, entity_col: str, ts_col: str, *,
                     num_buckets: int = 64):
    """Cohort RETENTION matrix — the classic activation analytics view:
    entities cohorted by the week of their FIRST activity, counted as
    retained in every later week they reappear.  Emits one row per
    (cohort_week, week_offset): distinct active entities.

    Scale shape: ONE blob-packed exchange keyed on the entity (an
    entity's whole history lands in one bucket, so its cohort and
    activity weeks compute locally and the per-bucket distinct-entity
    counts are EXACT partials — an entity lives in exactly one bucket,
    partials sum without double-counting), then a tiny
    (cohort, offset)-keyed groupby-sum.  No broadcast of the entity
    table, no count-distinct exchange.  Weeks are Monday-start
    (``date_trunc('week')``)."""
    import pyarrow as pa

    from .partition import bucketed_map_groups

    def per_bucket(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        d = df[ts_col].dt.floor("D")
        week = d - pd.to_timedelta(d.dt.weekday, unit="D")  # Monday start
        act = pd.DataFrame({entity_col: df[entity_col],
                            "w": week}).drop_duplicates()
        cohort = act.groupby(entity_col, sort=False)["w"].transform("min")
        off = ((act["w"] - cohort).dt.days // 7).astype(np.int64)
        cnt = (pd.DataFrame({"cohort_week": cohort, "week_offset": off})
               .groupby(["cohort_week", "week_offset"], sort=False)
               .size().rename("n").reset_index())
        return pa.Table.from_pandas(cnt, preserve_index=False)

    pruned = ds.select_columns([entity_col, ts_col])
    partials = bucketed_map_groups(pruned, entity_col, per_bucket,
                                   num_buckets=num_buckets, seed=23)
    return grouped_aggregate(partials, ["cohort_week", "week_offset"],
                             {"n_entities": ("n", "sum")},
                             num_buckets=max(4, num_buckets // 8))


__all__.append("cohort_retention")


def association_lift(ds, entity_col: str, item_col: str, *,
                     min_count: int = 1, num_buckets: int = 16) -> pd.DataFrame:
    """Pairwise item co-occurrence with lift — market-basket association
    over (entity, item) events: which event types / products / sources
    co-occur in the same entity's history more than independence
    predicts?

        lift(a,b) = N · n_ab / (n_a · n_b)

    over DISTINCT (entity, item) incidence (an entity counts once per
    item no matter how many raw events).  Exchange plan, all bounded:
    (1) distinct (entity, item) via the grouped-count exchange —
    bounded by incidence, not raw rows; (2) a co-partitioned pass
    groups each entity's items and PARTIAL-COUNTS its unordered pairs
    inside the bucket, so the second exchange ships (a, b, partial)
    rows bounded by buckets × distinct-pairs; (3) the per-item totals
    ride the same incidence table.  The driver sees one row per ITEM
    PAIR — with m distinct items that is ≤ m(m−1)/2 rows, never
    entity- or row-scale.  Entities with huge item sets make step 2
    quadratic per entity: this operator is for bounded vocabularies
    (event types, product categories), not free-text tokens.

    Returns (item_a, item_b, n_ab, lift) with item_a < item_b, filtered
    to n_ab ≥ ``min_count``, sorted by (item_a, item_b)."""
    from .partition import bucketed_map_groups

    incidence = grouped_aggregate(
        ds.select_columns([entity_col, item_col]),
        [entity_col, item_col],
        {"__n": (item_col, "count")},
        num_buckets=num_buckets,
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(t.select([entity_col, item_col]))
        rows_a, rows_b = [], []
        for _, items in df.groupby(entity_col, sort=False)[item_col]:
            vals = np.sort(items.to_numpy())
            if len(vals) < 2:
                continue
            ia, ib = np.triu_indices(len(vals), k=1)
            rows_a.append(vals[ia])
            rows_b.append(vals[ib])
        if not rows_a:
            it = t.schema.field(item_col).type
            return pa.table({"item_a": pa.array([], type=it),
                             "item_b": pa.array([], type=it),
                             "__c": pa.array([], type=pa.int64())})
        pairs = pd.DataFrame({"item_a": np.concatenate(rows_a),
                              "item_b": np.concatenate(rows_b)})
        cnt = (pairs.groupby(["item_a", "item_b"], sort=False)
                    .size().rename("__c").reset_index())
        return pandas_to_arrow(cnt)

    pair_counts = grouped_aggregate(
        bucketed_map_groups(incidence, entity_col, pair_partials,
                            num_buckets=num_buckets),
        ["item_a", "item_b"],
        {"n_ab": ("__c", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()

    inc = grouped_aggregate(
        incidence, item_col, {"__n": (item_col, "count")},
        num_buckets=num_buckets,
    ).to_pandas()
    totals = dict(zip(inc[item_col], inc["__n"].astype(np.int64)))
    n_entities = int(
        grouped_aggregate(incidence, entity_col,
                          {"__n": (entity_col, "count")},
                          num_buckets=num_buckets).count()
    )
    if pair_counts.empty:
        return pd.DataFrame({"item_a": pd.Series(dtype=object),
                             "item_b": pd.Series(dtype=object),
                             "n_ab": pd.Series(dtype=np.int64),
                             "lift": pd.Series(dtype=np.float64)})
    pair_counts = pair_counts[pair_counts["n_ab"] >= min_count]
    na = pair_counts["item_a"].map(totals).to_numpy(dtype=np.float64)
    nb = pair_counts["item_b"].map(totals).to_numpy(dtype=np.float64)
    nab = pair_counts["n_ab"].to_numpy(dtype=np.float64)
    out = pair_counts[["item_a", "item_b"]].copy()
    out["n_ab"] = pair_counts["n_ab"].astype(np.int64).to_numpy()
    out["lift"] = n_entities * nab / (na * nb)
    return out.sort_values(["item_a", "item_b"], ignore_index=True)


__all__.append("association_lift")
