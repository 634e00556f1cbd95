"""Category encoders — target (mean) encoding and frequency encoding,
the workhorse categorical features of tabular ML.

Shape: FIT = one partial-aggregated ``grouped_aggregate`` exchange
producing one row per category (bounded by the category cardinality —
that is what "categorical" means; a key with corpus-scale cardinality
belongs in :mod:`.split`-style hashing, not here).  APPLY = the fitted
map broadcast once via ``ray.put`` and hash-probed per batch by the
Arrow-native :func:`.joins.broadcast_join` — zero additional exchange
over the big side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupagg import grouped_aggregate
from .joins import broadcast_join

__all__ = ["fit_target_encoding", "target_encode", "frequency_encode",
           "cross_encode", "hashed_cross", "group_share"]


def _collect_small(ds) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    )


def fit_target_encoding(ds, key_col: str, target_col: str, *,
                        smoothing: float = 0.0,
                        num_buckets: int = 64) -> pa.Table:
    """Per-category encoding table ``(key, __te, __freq)``.

    ``__te`` = (Σ target + m·prior) / (n + m) with m = ``smoothing`` and
    prior = the GLOBAL target mean (computed exactly from the same
    partials) — m = 0 is the plain per-category mean; m > 0 shrinks rare
    categories toward the prior (standard leave-prior smoothing).
    """
    stats = _collect_small(
        grouped_aggregate(
            ds,
            key_col,
            {"__s": (target_col, "sum"), "__n": (target_col, "count")},
            num_buckets=num_buckets,
        )
    )
    s = stats.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
    n = stats.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
    if smoothing:
        prior = s.sum() / n.sum()
        te = (s + smoothing * prior) / (n + smoothing)
    else:
        te = s / n
    return pa.table(
        {
            key_col: stats.column(key_col),
            "__te": pa.array(te, type=pa.float64()),
            "__freq": pa.array(n.astype(np.int64), type=pa.int64()),
        }
    )


def target_encode(ds, key_col: str, target_col: str, *,
                  smoothing: float = 0.0, out_col: str | None = None,
                  freq_col: str | None = None, enc: pa.Table | None = None,
                  num_buckets: int = 64):
    """Append the per-category target mean (and optionally frequency).

    Pass a pre-fitted ``enc`` table to apply a TRAIN-fitted encoding to
    val/test — fitting on the same rows you transform leaks the target;
    the two-argument form is provided for stats pipelines, the
    train/apply split for modeling ones.  Unseen categories get null
    (left join) — impute downstream with the prior if needed.
    """
    out_col = out_col or f"{key_col}_te"
    if enc is None:
        enc = fit_target_encoding(ds, key_col, target_col,
                                  smoothing=smoothing, num_buckets=num_buckets)
    keep = [key_col, "__te"] + (["__freq"] if freq_col else [])
    joined = broadcast_join(ds, enc.select(keep), on=key_col, how="left")
    rename = {"__te": out_col, **({"__freq": freq_col} if freq_col else {})}
    return joined.map_batches(
        lambda b: b.rename_columns([rename.get(c, c) for c in b.column_names]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def frequency_encode(ds, key_col: str, *, out_col: str | None = None,
                     num_buckets: int = 64):
    """Append the per-category row count — the frequency feature."""
    out_col = out_col or f"{key_col}_freq"
    counts = _collect_small(
        grouped_aggregate(
            ds, key_col, {"__freq": (key_col, "count")}, num_buckets=num_buckets
        )
    )
    joined = broadcast_join(ds, counts, on=key_col, how="left")
    return joined.map_batches(
        lambda b: b.rename_columns(
            [out_col if c == "__freq" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def cross_encode(ds, col_a: str, col_b: str, *, out_col: str | None = None,
                 categories_a=None, categories_b=None):
    """Categorical feature CROSS with an explicit dense vocabulary:
    cross_id = index_a · |V_b| + index_b (sorted vocabularies, so the id
    is stable and SQL-mirrorable — the oracle reproduces it with
    DISTINCT + row_number).  Vocabularies from distributed distinct
    passes when not pinned; unknown categories → null (handle-unknown
    ='ignore', the serve-time contract).  The cross id feeds one-hot /
    hashed embedding layers downstream."""
    import pyarrow.compute as pc

    out_col = out_col if out_col is not None else f"{col_a}_x_{col_b}"
    if categories_a is None:
        categories_a = sorted(ds.unique(col_a))
    if categories_b is None:
        categories_b = sorted(ds.unique(col_b))
    va = pa.array(list(categories_a))
    vb = pa.array(list(categories_b))
    nb = len(vb)

    def fn(t: pa.Table) -> pa.Table:
        ia = pc.index_in(t.column(col_a), value_set=va)
        ib = pc.index_in(t.column(col_b), value_set=vb)
        cross = pc.add(pc.multiply(pc.cast(ia, pa.int64()), pa.scalar(nb)),
                       pc.cast(ib, pa.int64()))
        return t.append_column(out_col, cross)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hashed_cross(ds, cols, radices, *, num_buckets: int,
                 out_col: str | None = None, seed: int | None = None):
    """HASHED feature cross — :func:`cross_encode`'s scale sibling for
    unbounded-cardinality key combinations (wide-and-deep
    ``crossed_column``): ``bucket = fmix32(mixed-radix fold) %
    num_buckets``.  No vocabulary pass, O(1) state, one stateless
    zero-exchange ``map_batches``; collisions are the accepted trade
    (size ``num_buckets`` ≫ active crosses).

    ``cols`` are INT columns; ``radices[i]`` bounds ``cols[i+1]``
    (``0 ≤ v < radix``, checked LOUDLY per batch — a silent out-of-range
    value would alias a different cross), so the fold
    ``((c0·r1 + c1)·r2 + c2)…`` is collision-free before the hash and
    the SQL oracle reproduces the bucket bit-exactly through the shared
    fmix32 CTE (`split.sql_hash_cte`).  String categories: dictionary-
    encode to ints first, or use `cross_encode`."""
    from .split import _DEFAULT_SEED, hash_u32

    cols = list(cols)
    radices = list(radices)
    if len(radices) != len(cols) - 1:
        raise ValueError("need one radix per column after the first")
    if float(np.prod([float(r) for r in radices or [1]])) > 2**40:
        # leaves ≥ 2²³ of int64 headroom for the leading key's values
        raise ValueError("radix product too large — fold could overflow "
                         "int64 once multiplied by the leading key")
    out_col = out_col or ("_x_".join(cols) + "_bucket")
    seed = _DEFAULT_SEED if seed is None else seed

    def fn(t: pa.Table) -> pa.Table:
        key = t.column(cols[0]).to_numpy(zero_copy_only=False).astype(np.int64)
        for c, r in zip(cols[1:], radices):
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(v) and ((v < 0).any() or (v >= r).any()):
                raise ValueError(
                    f"hashed_cross: column {c!r} has values outside "
                    f"[0, {r}) — wrong radix silently aliases crosses")
            key = key * np.int64(r) + v
        b = (hash_u32(key, seed=seed) %
             np.uint64(num_buckets)).astype(np.int64)
        return t.append_column(out_col, pa.array(b))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def group_share(ds, key_col: str, value_col: str, *,
                out_col: str | None = None, num_buckets: int = 64):
    """Append each row's SHARE of its key's value total (the
    ratio-to-report feature): per-key sums via one partial-aggregated
    exchange bounded by key cardinality, broadcast once and probed per
    batch — the fact rows never shuffle.  Zero-total keys yield null."""
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    out_col = out_col or f"{value_col}_share"
    sums = _collect_small(
        grouped_aggregate(
            ds, key_col, {"__tot": (value_col, "sum")}, num_buckets=num_buckets
        )
    )
    joined = broadcast_join(ds, sums, on=key_col, how="left")

    def fn(b: pa.Table) -> pa.Table:
        tot = b.column("__tot")
        share = pc.if_else(
            pc.equal(tot, pa.scalar(0.0)), pa.scalar(None, pa.float64()),
            pc.divide(pc.cast(b.column(value_col), pa.float64()), tot))
        return b.drop_columns(["__tot"]).append_column(out_col, share)

    return joined.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fit_woe(ds, key_col: str, label_col: str, *,
            smoothing: float = 0.5, num_buckets: int = 64) -> pa.Table:
    """Weight-of-evidence encoding table + information value — the
    credit-scoring-standard categorical screen: per category c of
    ``key_col`` against a BINARY ``label_col`` (0/1 or bool),

        woe_c = ln( (pos_c / pos_tot) / (neg_c / neg_tot) )
        iv_term_c = (pos_c/pos_tot − neg_c/neg_tot) · woe_c

    with add-``smoothing`` on both cells (default 0.5, the standard
    Laplace guard — a category that is all-positive or all-negative
    would otherwise emit ±inf).  The totals in the denominators are the
    RAW totals, so smoothing perturbs only the zero-cell hazard, not
    well-populated categories.  Σ iv_term over categories is the
    information value of the feature (rule of thumb: < 0.02 useless,
    > 0.5 suspicious).

    One bounded exchange: per-(category) pos/total counts partial-
    aggregate inside ``map_batches`` (the combiner pattern); the driver
    sees one row per category, never row-scale data.  Returns
    ``(key, pos, neg, woe, iv_term)`` sorted by key.
    """
    import pyarrow.compute as pc

    def widen(t: pa.Table) -> pa.Table:
        lab = pc.cast(pc.cast(t.column(label_col), pa.bool_()), pa.float64())
        return pa.table({key_col: t.column(key_col), "__y": lab})

    stats = _collect_small(
        grouped_aggregate(
            ds.map_batches(widen, batch_format="pyarrow",
                           zero_copy_batch=True),
            key_col,
            {"__pos": ("__y", "sum"), "__n": ("__y", "count")},
            num_buckets=num_buckets,
        )
    )
    pos = stats.column("__pos").to_numpy(zero_copy_only=False).astype(np.float64)
    n = stats.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
    neg = n - pos
    pos_tot, neg_tot = pos.sum(), neg.sum()
    if pos_tot == 0 or neg_tot == 0:
        raise ValueError(
            f"fit_woe: label {label_col!r} is single-class "
            f"(pos={int(pos_tot)}, neg={int(neg_tot)}) — WoE is undefined"
        )
    p = (pos + smoothing) / pos_tot
    q = (neg + smoothing) / neg_tot
    woe = np.log(p / q)
    iv_term = (p - q) * woe
    out = pa.table({
        key_col: stats.column(key_col),
        "pos": pa.array(pos.astype(np.int64), type=pa.int64()),
        "neg": pa.array(neg.astype(np.int64), type=pa.int64()),
        "woe": pa.array(woe, type=pa.float64()),
        "iv_term": pa.array(iv_term, type=pa.float64()),
    })
    return out.sort_by(key_col)


__all__.append("fit_woe")


def loo_target_encode(ds, key_col: str, target_col: str, *,
                      out_col: str | None = None, num_buckets: int = 64):
    """LEAVE-ONE-OUT target encoding — the leakage-safe sibling of
    :func:`target_encode` for training rows:

        te_i = (Σ_{j∈cat(i)} y_j − y_i) / (n_cat(i) − 1)

    i.e. the category mean computed WITHOUT row i's own target, so the
    feature carries no direct copy of the label (the classic
    target-leak).  Singleton categories (n = 1) have no "others" — they
    fall back to the GLOBAL target mean (computed exactly from the same
    per-category partials, no extra pass).

    Shape: identical to :func:`target_encode` — one bounded
    partial-aggregated exchange fits (Σ, n) per category, broadcast
    once, probed per batch; the per-row subtraction is vectorized
    NumPy.  An SQL oracle mirrors it with window sums:
    ``(SUM(y) OVER w − y) / (COUNT(*) OVER w − 1)`` and a global-AVG
    CASE fallback."""
    out_col = out_col or f"{key_col}_loo"
    stats = _collect_small(
        grouped_aggregate(
            ds, key_col,
            {"__s": (target_col, "sum"), "__n": (target_col, "count")},
            num_buckets=num_buckets,
        )
    )
    s_all = stats.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
    n_all = stats.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
    gmean = s_all.sum() / n_all.sum()
    joined = broadcast_join(ds, stats, on=key_col, how="left")

    def fn(b: pa.Table) -> pa.Table:
        y = b.column(target_col).to_numpy(zero_copy_only=False).astype(np.float64)
        s = b.column("__s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("__n").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            loo = (s - y) / (n - 1.0)
        loo = np.where(n > 1.0, loo, gmean)
        return b.drop_columns(["__s", "__n"]).append_column(
            out_col, pa.array(loo, type=pa.float64()))

    return joined.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def collapse_rare(ds, col: str, *, min_count: int, other: str = "__other__",
                  out_col: str | None = None, num_buckets: int = 64):
    """Collapse long-tail categories below ``min_count`` occurrences
    into a single ``other`` token — the standard cardinality guard
    before one-hot / embedding layers (rare levels carry no signal and
    explode the vocabulary; at corpus scale the tail IS the bulk of
    distinct values).

    FIT = one partial-aggregated count exchange (one row per distinct
    category); the KEEP set (categories at/above the threshold —
    typically small) broadcasts in the closure and is probed with
    Arrow ``is_in`` per batch — the fact rows never shuffle.  Returns
    the dataset with ``out_col`` (default: replaces ``col``)."""
    import pyarrow.compute as pc

    out_col = out_col or col
    counts = _collect_small(
        grouped_aggregate(
            ds, col, {"__n": (col, "count")}, num_buckets=num_buckets
        )
    )
    n = counts.column("__n").to_numpy(zero_copy_only=False)
    keep = counts.column(col).filter(pa.array(n >= min_count))
    keep_set = pa.array(keep.to_pylist(), type=keep.type)

    def fn(b: pa.Table) -> pa.Table:
        c = b.column(col)
        kept = pc.is_in(c, value_set=keep_set)
        out = pc.if_else(kept, c, pa.scalar(other, type=pa.string()))
        if out_col in b.column_names:
            return b.set_column(b.schema.get_field_index(out_col), out_col,
                                out)
        return b.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


__all__ += ["loo_target_encode", "collapse_rare"]
