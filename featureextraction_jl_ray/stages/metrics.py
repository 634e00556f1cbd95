"""Distributed evaluation metrics over label/score columns — the model-
QA layer of a training-data pipeline (did the planted labels separate?
is the score calibrated? do consecutive values autocorrelate?).

Scale shapes:

- ``group_auc`` — exact per-group ROC-AUC (Mann-Whitney rank-sum with
  tie averaging) WITHOUT a per-group single-task sort: range-partition
  on sampled SCORE boundaries (equal scores co-locate by construction),
  one narrow ``(group, score, label)`` exchange, per-partition tie-block
  partials — a bounded groups×partitions table back to the driver —
  then a cross-partition prefix combine.  No task ever holds a whole
  group; the exchange ships three narrow columns, the same cost any
  rank/order statistic pays.

- ``group_autocorr`` — lag-k serial correlation of a value series per
  entity: one ``with_lag`` bucketed exchange, then constant-size
  sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) partial-aggregated
  per entity.  Closed-form Pearson r from the partials; never holds a
  series in memory.

All arithmetic up to the final AUC division is exact in float64
(counts and half-integers), so the engine numerator matches a SQL
rank-sum oracle bit-for-bit at any summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["group_auc", "group_autocorr"]


def group_auc(
    ds,
    group_col: str,
    score_col: str,
    label_col: str,
    *,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Exact ROC-AUC of ``score_col`` against binary ``label_col`` (0/1)
    within each level of ``group_col``.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed as the
    tie-averaged Mann-Whitney statistic.  Within each score-range
    partition p (ascending), for every tie block b of equal
    (group, score):

        a_p(g) = Σ_b  npos_b · (negs_before_b_within_p + nneg_b / 2)

    and the cross-partition term adds ``npos_p(g) · Σ_{q<p} nneg_q(g)``.
    All terms are integers or exact halves, so the numerator is
    bit-identical to the SQL formulation
    ``Σ_{y=1} avg_rank − n⁺(n⁺+1)/2`` regardless of summation order
    (below 2⁵³ — at larger counts the ratio is still exact to ~1 ulp).

    Returns one row per group: ``(group_col, n_pos, n_neg, auc)`` with
    NaN AUC when a group lacks both classes.  Rows with a null score or
    label are dropped (mirror with a WHERE in the oracle).
    """
    from ..functions.pdconv import arrow_to_pandas_safe
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET
    from .sort import sample_boundaries

    ds = ds.select_columns([group_col, score_col, label_col])
    # two passes (boundary sample + exchange) must see identical rows
    ds = ds.materialize()
    bounds = np.asarray(sample_boundaries(ds, score_col, num_partitions,
                                          seed=seed), dtype=np.float64)

    def tag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.is_valid(batch.column(score_col)),
                       pc.is_valid(batch.column(label_col)))
        batch = batch.filter(keep)
        s = batch.column(score_col).to_numpy(zero_copy_only=False)
        if len(bounds):
            p = np.searchsorted(bounds, s, side="right").astype(np.int64)
        else:
            p = np.zeros(len(s), dtype=np.int64)
        return pack_by_bucket(batch, p)

    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "part": pa.array([], type=pa.int64()),
                      "a": pa.array([], type=pa.float64()),
                      "npos": pa.array([], type=pa.float64()),
                      "nneg": pa.array([], type=pa.float64())})

    def part_partials(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return empty
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        s = df[score_col].to_numpy(dtype=np.float64)
        y = df[label_col].to_numpy(dtype=np.float64)
        order = np.lexsort((s, codes))
        codes, s, y = codes[order], s[order], y[order]
        # tie blocks of equal (group, score)
        new = np.empty(len(s), dtype=bool)
        new[0] = True
        new[1:] = (codes[1:] != codes[:-1]) | (s[1:] != s[:-1])
        blk = np.cumsum(new) - 1
        npos_b = np.bincount(blk, weights=y)
        n_b = np.bincount(blk).astype(np.float64)
        nneg_b = n_b - npos_b
        gcode_b = codes[new]
        # negatives before each block, reset at group starts
        gstart = np.empty(len(gcode_b), dtype=bool)
        gstart[0] = True
        gstart[1:] = gcode_b[1:] != gcode_b[:-1]
        cum = np.cumsum(nneg_b) - nneg_b
        gseg = np.cumsum(gstart) - 1
        cum_within = cum - cum[np.flatnonzero(gstart)][gseg]
        a_b = npos_b * (cum_within + nneg_b / 2.0)
        ng = len(uniq)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)),
            "part": pa.array(np.full(ng, pid), type=pa.int64()),
            "a": pa.array(np.bincount(gcode_b, weights=a_b, minlength=ng)),
            "npos": pa.array(np.bincount(gcode_b, weights=npos_b,
                                         minlength=ng)),
            "nneg": pa.array(np.bincount(gcode_b, weights=nneg_b,
                                         minlength=ng)),
        })

    partials = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True,
                       batch_size=None)
          .groupby(_BUCKET)
          .map_groups(part_partials, batch_format="pyarrow")
          .to_pandas()
    )
    if partials.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_pos": pd.Series([], dtype=np.int64),
                             "n_neg": pd.Series([], dtype=np.int64),
                             "auc": pd.Series([], dtype=np.float64)})
    partials = partials.sort_values([group_col, "part"], ignore_index=True)
    out = []
    for g, part in partials.groupby(group_col, sort=True):
        nneg = part["nneg"].to_numpy()
        npos = part["npos"].to_numpy()
        cum_before = np.cumsum(nneg) - nneg
        num = part["a"].to_numpy().sum() + (npos * cum_before).sum()
        tp, tn = npos.sum(), nneg.sum()
        auc = num / (tp * tn) if tp > 0 and tn > 0 else np.nan
        out.append((g, int(tp), int(tn), auc))
    return pd.DataFrame(out, columns=[group_col, "n_pos", "n_neg", "auc"])


def group_autocorr(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    k: int = 1,
    min_pairs: int = 3,
    num_buckets: int = 32,
    tiebreak_cols: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Lag-k serial (Pearson) correlation of ``value_col`` within each
    entity's ``(ts, *tiebreak)``-ordered series — the burstiness /
    momentum screen ("does a high value predict the next one?").

    corr = (Σxy − ΣxΣy/n) / √((Σx²−(Σx)²/n)(Σy²−(Σy)²/n)) over the
    (value, lag-k value) pairs.  Entities with fewer than ``min_pairs``
    pairs or zero variance on either side are dropped (the SQL oracle's
    HAVING).  Returns ``(entity_col, n_pairs, autocorr)``.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate
    from .window import with_lag

    lagged = with_lag(
        ds, entity_col, ts_col, [value_col], k=k,
        num_buckets=num_buckets, tiebreak_cols=tiebreak_cols,
    )
    lag_col = f"lag{k}_{value_col}"

    def widen(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t.column(lag_col)))
        y = pc.cast(t.column(value_col), pa.float64())
        x = pc.cast(t.column(lag_col), pa.float64())
        return pa.table({
            entity_col: t.column(entity_col),
            "__x": x, "__y": y,
            "__xy": pc.multiply(x, y),
            "__xx": pc.multiply(x, x),
            "__yy": pc.multiply(y, y),
        })

    g = grouped_aggregate(
        lagged.map_batches(widen, batch_format="pyarrow",
                           zero_copy_batch=True),
        entity_col,
        {"n_pairs": ("__x", "count"),
         "__sx": ("__x", "sum"), "__sy": ("__y", "sum"),
         "__sxy": ("__xy", "sum"), "__sxx": ("__xx", "sum"),
         "__syy": ("__yy", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    n = g["n_pairs"].to_numpy(dtype=np.float64)
    sx, sy = g["__sx"].to_numpy(), g["__sy"].to_numpy()
    sxy = g["__sxy"].to_numpy()
    vx = g["__sxx"].to_numpy() - sx * sx / np.where(n > 0, n, 1.0)
    vy = g["__syy"].to_numpy() - sy * sy / np.where(n > 0, n, 1.0)
    cov = sxy - sx * sy / np.where(n > 0, n, 1.0)
    ok = (n >= min_pairs) & (vx > 0) & (vy > 0)
    g = g.loc[ok, [entity_col, "n_pairs"]].copy()
    g["autocorr"] = (cov[ok] / np.sqrt(vx[ok] * vy[ok]))
    return g.sort_values(entity_col, ignore_index=True)


def grouped_weighted_median(
    ds,
    group_col: str,
    value_col: str,
    weight_col: str | None = None,
    *,
    q: float = 0.5,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Exact weighted q-quantile per group (default median) — smallest v
    with W(≤ v) ≥ q·W_total — without sorting any group in one task.

    Two-pass distributed order statistic:

    1. NO-shuffle pass: per (group, value-range-partition) weight sums —
       a bounded groups×partitions table combined on the driver, which
       locates each group's CUT partition (where the cumulative crosses
       half) and the exact weight mass before it.
    2. Targeted pass: only rows in (group, its cut partition) survive a
       filter (~1/num_partitions of one group), collapse to per-distinct-
       value weight sums through the standard combiner exchange, and the
       driver walks the bounded cut-slice cumulative to the answer.

    Weights must be positive; null values/weights are dropped (mirror
    with a WHERE).  ``weight_col=None`` = unweighted median (w ≡ 1),
    which makes this an exact distributed median/quantile.  With
    integer-valued weights every cumulative is exact in float64, so the
    cut is bit-deterministic at any summation order.

    Returns ``(group_col, w_total, weighted_median)``.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate
    from .sort import sample_boundaries

    if not (0.0 < q <= 1.0):
        raise ValueError(f"q must be in (0, 1], got {q}")
    ds = ds.select_columns(
        [group_col, value_col] + ([weight_col] if weight_col else []))
    ds = ds.materialize()   # passes must agree row-for-row
    bounds = np.asarray(
        sample_boundaries(ds, value_col, num_partitions, seed=seed),
        dtype=np.float64)
    nparts = len(bounds) + 1

    def _clean(t: pa.Table) -> pa.Table:
        keep = pc.is_valid(t.column(value_col))
        if weight_col:
            keep = pc.and_(keep, pc.is_valid(t.column(weight_col)))
        return t.filter(keep)

    def _w(t: pa.Table) -> np.ndarray:
        if weight_col:
            return t.column(weight_col).to_numpy(
                zero_copy_only=False).astype(np.float64)
        return np.ones(t.num_rows, dtype=np.float64)

    def _part(v: np.ndarray) -> np.ndarray:
        if len(bounds):
            return np.searchsorted(bounds, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    # ---- pass 1: (group, partition) weight partials, driver-combined --
    def partials(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.float64())})
        codes, uniq = pd.factorize(
            t.column(group_col).to_pandas(), use_na_sentinel=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        cell = codes * nparts + _part(v)
        wsum = np.bincount(cell, weights=_w(t),
                           minlength=len(uniq) * nparts)
        nz = np.flatnonzero(wsum)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "w": pa.array(wsum[nz]),
        })

    agg = {}
    for b in ds.map_batches(partials, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
        gs = b.column(group_col).to_pylist()
        ps = b.column("p").to_numpy(zero_copy_only=False)
        ws = b.column("w").to_numpy(zero_copy_only=False)
        for g, p, w in zip(gs, ps, ws):
            key = (g, int(p))
            agg[key] = agg.get(key, 0.0) + float(w)
    if not agg:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "w_total": pd.Series([], dtype=np.float64),
                             "weighted_median": pd.Series(
                                 [], dtype=np.float64)})
    pg = pd.Series(agg).rename_axis([group_col, "p"]).sort_index()
    cut, before, totals = {}, {}, {}
    for g, sub in pg.groupby(level=0, sort=True):
        w = sub.droplevel(0)
        tot = w.sum()
        cum = w.cumsum()
        half = tot * q
        p_cut = int(w.index[np.searchsorted(cum.to_numpy(), half,
                                            side="left")])
        cut[g] = p_cut
        before[g] = float(cum.loc[:p_cut].iloc[-2]) if \
            (cum.index.get_loc(p_cut) > 0) else 0.0
        totals[g] = float(tot)

    # ---- pass 2: only the cut slices, collapsed per distinct value ----
    def in_cut(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "__v": pa.array([], type=pa.float64()),
                             "__w": pa.array([], type=pa.float64())})
        g = t.column(group_col).to_pandas()
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        p = _part(v)
        want = g.map(cut).to_numpy()
        m = p == want
        return pa.table({group_col: pa.array(g[m].to_numpy(dtype=object)),
                         "__v": pa.array(v[m]),
                         "__w": pa.array(_w(t)[m])})

    sl = grouped_aggregate(
        ds.map_batches(in_cut, batch_format="pyarrow",
                       zero_copy_batch=True),
        [group_col, "__v"], {"w": ("__w", "sum")},
        num_buckets=min(16, nparts),
    ).to_pandas().sort_values([group_col, "__v"], ignore_index=True)
    out = []
    for g, sub in sl.groupby(group_col, sort=True):
        cum = before[g] + sub["w"].cumsum().to_numpy()
        half = totals[g] * q
        idx = int(np.searchsorted(cum, half, side="left"))
        out.append((g, totals[g], float(sub["__v"].iloc[idx])))
    return pd.DataFrame(out, columns=[group_col, "w_total",
                                      "weighted_median"])


__all__.append("grouped_weighted_median")


def group_ks(
    ds,
    group_col: str,
    value_col: str,
    side_col: str,
    *,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group:
    D = max over values v of |F_A(v) − F_B(v)| between the rows with
    ``side_col`` = 1 (sample A) and = 0 (sample B) — the
    distribution-drift test with an exact answer, unlike the binned
    PSI/JS family (``population_stability``).

    Same partition-prefix exchange as :func:`group_auc`: range-partition
    on sampled value boundaries (equal values co-locate), one narrow
    (group, value, side) exchange; each partition computes its local max
    gap given the per-group cumulative counts of every EARLIER partition
    (a bounded groups×partitions pre-pass, no shuffle), and the driver
    takes the max of the bounded per-partition maxima.  All cumulatives
    are integers, so D is bit-deterministic.

    Returns ``(group_col, n_a, n_b, ks)``; groups missing either sample
    get NaN.
    """
    from ..functions.pdconv import arrow_to_pandas_safe
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET
    from .sort import sample_boundaries

    import pyarrow.compute as pc

    ds = ds.select_columns([group_col, value_col, side_col])
    ds = ds.materialize()
    bounds = np.asarray(
        sample_boundaries(ds, value_col, num_partitions, seed=seed),
        dtype=np.float64)
    nparts = len(bounds) + 1

    def _part(v: np.ndarray) -> np.ndarray:
        if len(bounds):
            return np.searchsorted(bounds, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    # pre-pass: per (group, partition) counts of each side (no shuffle)
    cnt: dict[tuple, np.ndarray] = {}

    def counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(value_col)),
                             pc.is_valid(t.column(side_col))))
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "ca": pa.array([], type=pa.int64()),
                             "cb": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(
            t.column(group_col).to_pandas(), use_na_sentinel=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        y = t.column(side_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        cell = codes * nparts + _part(v)
        size = len(uniq) * nparts
        ca = np.bincount(cell, weights=y, minlength=size)
        cb = np.bincount(cell, weights=1.0 - y, minlength=size)
        nz = np.flatnonzero(ca + cb)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "ca": pa.array(ca[nz].astype(np.int64)),
            "cb": pa.array(cb[nz].astype(np.int64)),
        })

    for b in ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
        for g, p, ca, cb in zip(b.column(group_col).to_pylist(),
                                b.column("p").to_pylist(),
                                b.column("ca").to_pylist(),
                                b.column("cb").to_pylist()):
            a = cnt.setdefault(g, np.zeros((nparts, 2), dtype=np.int64))
            a[p, 0] += ca
            a[p, 1] += cb
    if not cnt:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_a": pd.Series([], dtype=np.int64),
                             "n_b": pd.Series([], dtype=np.int64),
                             "ks": pd.Series([], dtype=np.float64)})
    # per-group prefix counts before each partition + totals
    pre = {g: np.concatenate([[[0, 0]], np.cumsum(a, axis=0)[:-1]])
           for g, a in cnt.items()}
    tot = {g: a.sum(axis=0) for g, a in cnt.items()}

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch.column(value_col)),
                                     pc.is_valid(batch.column(side_col))))
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
                 .astype(np.float64)
        return pack_by_bucket(batch, _part(v))

    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "d": pa.array([], type=pa.float64())})

    def part_max(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return empty
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        v = df[value_col].to_numpy(dtype=np.float64)
        y = df[side_col].to_numpy(dtype=np.float64)
        order = np.lexsort((v, codes))
        codes, v, y = codes[order], v[order], y[order]
        new = np.empty(len(v), dtype=bool)
        new[0] = True
        new[1:] = (codes[1:] != codes[:-1]) | (v[1:] != v[:-1])
        blk = np.cumsum(new) - 1
        ca_b = np.bincount(blk, weights=y)
        cb_b = np.bincount(blk) - ca_b
        gcode_b = codes[new]
        gstart = np.empty(len(gcode_b), dtype=bool)
        gstart[0] = True
        gstart[1:] = gcode_b[1:] != gcode_b[:-1]
        gseg = np.cumsum(gstart) - 1
        cum_a = np.cumsum(ca_b)
        cum_b = np.cumsum(cb_b)
        first = np.flatnonzero(gstart)
        cum_a = cum_a - np.concatenate([[0], cum_a[first[1:] - 1]])[gseg] \
            if len(first) > 1 else cum_a
        cum_b = cum_b - np.concatenate([[0], cum_b[first[1:] - 1]])[gseg] \
            if len(first) > 1 else cum_b
        out_g, out_d = [], []
        for gi, gname in enumerate(np.asarray(uniq, dtype=object)):
            na, nb = tot[gname]
            if na == 0 or nb == 0:
                continue
            m = gseg == gi
            fa = (pre[gname][pid, 0] + cum_a[m]) / float(na)
            fb = (pre[gname][pid, 1] + cum_b[m]) / float(nb)
            out_g.append(gname)
            out_d.append(float(np.abs(fa - fb).max()))
        return pa.table({group_col: pa.array(out_g, type=pa.string()),
                         "d": pa.array(out_d, type=pa.float64())})

    dmax = (ds.map_batches(tag, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None)
              .groupby(_BUCKET)
              .map_groups(part_max, batch_format="pyarrow")
              .to_pandas())
    rows = []
    for g in sorted(tot):
        na, nb = int(tot[g][0]), int(tot[g][1])
        sub = dmax.loc[dmax[group_col] == g, "d"]
        ks = float(sub.max()) if len(sub) and na > 0 and nb > 0 else np.nan
        rows.append((g, na, nb, ks))
    return pd.DataFrame(rows, columns=[group_col, "n_a", "n_b", "ks"])


__all__.append("group_ks")


def calibration_bins(
    ds,
    score_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    num_buckets: int = 8,
):
    """Reliability-diagram bins: clamp ``score_col`` onto ``n_bins``
    equal-width bins over [lo, hi) and report per bin the row count,
    mean label and mean score — is a probability-like score honest?
    One partial-aggregated exchange of (bin, n, Σy, Σs) rows.

    Returns a Dataset ``(bin, n, mean_label, mean_score)``; the bin id
    is ``clamp(floor((s − lo)/width), 0, n_bins−1)``, mirroring the
    GREATEST/LEAST construction the PSI/CCNet oracles use.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    width = (hi - lo) / n_bins

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(score_col)),
                             pc.is_valid(t.column(label_col))))
        s = t.column(score_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        b = np.clip(np.floor((s - lo) / width), 0, n_bins - 1) \
              .astype(np.int64)
        return pa.table({"bin": pa.array(b), "__y": pa.array(y),
                         "__s": pa.array(s)})

    g = grouped_aggregate(
        ds.select_columns([score_col, label_col])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        "bin",
        {"n": ("__y", "count"), "__sy": ("__y", "sum"),
         "__ss": ("__s", "sum")},
        num_buckets=num_buckets,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        return pa.table({
            "bin": t.column("bin"), "n": t.column("n"),
            "mean_label": pa.array(
                t.column("__sy").to_numpy(zero_copy_only=False) / n),
            "mean_score": pa.array(
                t.column("__ss").to_numpy(zero_copy_only=False) / n),
        })

    return g.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


__all__.append("calibration_bins")


def inequality_stats(
    ds,
    group_col: str,
    value_col: str,
    *,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Gini coefficient + Theil index of a non-negative value per group
    — concentration screens ("is 1% of users 90% of the value?"; for
    corpus curation: source/domain share concentration).

        Gini  = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·S) / (n·S)    (i = ascending rank)
        Theil = Σᵢ (xᵢ/S) · ln(xᵢ·n/S)              (x > 0 rows)

    The rank·value sum is tie-order invariant (equal x ⇒ equal
    contribution under any rank assignment), so the partition-prefix
    decomposition is exact: a no-shuffle (group, partition) count/sum
    pre-pass gives each partition its rank offset, one narrow row
    exchange computes local Σ(local_rank·x) + the Theil partials, and
    the driver combines the bounded groups×partitions table.  Rows with
    x ≤ 0 or null are dropped (mirror in the oracle's WHERE).

    Returns ``(group_col, n, gini, theil)``.
    """
    import pyarrow.compute as pc

    from ..functions.pdconv import arrow_to_pandas_safe
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET
    from .sort import sample_boundaries

    ds = ds.select_columns([group_col, value_col])
    ds = ds.materialize()
    bounds = np.asarray(
        sample_boundaries(ds, value_col, num_partitions, seed=seed),
        dtype=np.float64)
    nparts = len(bounds) + 1

    def _clean(t: pa.Table) -> pa.Table:
        v = t.column(value_col)
        return t.filter(pc.and_(pc.is_valid(v),
                                pc.greater(pc.cast(v, pa.float64()), 0.0)))

    def _part(v: np.ndarray) -> np.ndarray:
        if len(bounds):
            return np.searchsorted(bounds, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    # pre-pass: per (group, partition) counts (rank offsets), no shuffle
    cnt: dict[str, np.ndarray] = {}

    def counts(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(),
                                   use_na_sentinel=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        cell = codes * nparts + _part(v)
        c = np.bincount(cell, minlength=len(uniq) * nparts)
        nz = np.flatnonzero(c)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "c": pa.array(c[nz], type=pa.int64()),
        })

    for b in ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
        for g, p, c in zip(b.column(group_col).to_pylist(),
                           b.column("p").to_pylist(),
                           b.column("c").to_pylist()):
            a = cnt.setdefault(g, np.zeros(nparts, dtype=np.int64))
            a[p] += c
    if not cnt:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "gini": pd.Series([], dtype=np.float64),
                             "theil": pd.Series([], dtype=np.float64)})
    off = {g: np.concatenate([[0], np.cumsum(a)[:-1]])
           for g, a in cnt.items()}

    def tag(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
                 .astype(np.float64)
        return pack_by_bucket(batch, _part(v))

    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "rx": pa.array([], type=pa.float64()),
                      "sx": pa.array([], type=pa.float64()),
                      "xlx": pa.array([], type=pa.float64())})

    def part_partials(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return empty
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        v = df[value_col].to_numpy(dtype=np.float64)
        order = np.lexsort((v, codes))
        codes, v = codes[order], v[order]
        gstart = np.empty(len(codes), dtype=bool)
        gstart[0] = True
        gstart[1:] = codes[1:] != codes[:-1]
        # 1-based local rank within (group, this partition)
        idx = np.arange(len(codes), dtype=np.float64)
        local = idx - idx[np.flatnonzero(gstart)][np.cumsum(gstart) - 1] + 1
        glob_rank = local + np.array(
            [off[g][pid] for g in np.asarray(uniq, dtype=object)])[codes]
        ng = len(uniq)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)),
            "rx": pa.array(np.bincount(codes, weights=glob_rank * v,
                                       minlength=ng)),
            "sx": pa.array(np.bincount(codes, weights=v, minlength=ng)),
            "xlx": pa.array(np.bincount(codes, weights=v * np.log(v),
                                        minlength=ng)),
        })

    partials = (ds.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
                  .groupby(_BUCKET)
                  .map_groups(part_partials, batch_format="pyarrow")
                  .to_pandas())
    rows = []
    for g in sorted(cnt):
        n = int(cnt[g].sum())
        sub = partials[partials[group_col] == g]
        s = float(sub["sx"].sum())
        r = float(sub["rx"].sum())
        xlx = float(sub["xlx"].sum())
        gini = (2.0 * r - (n + 1.0) * s) / (n * s) if n > 0 and s > 0 \
            else np.nan
        theil = xlx / s - np.log(s / n) if n > 0 and s > 0 else np.nan
        rows.append((g, n, gini, theil))
    return pd.DataFrame(rows, columns=[group_col, "n", "gini", "theil"])


__all__.append("inequality_stats")


def ab_test_stats(
    ds,
    group_col: str,
    value_col: str,
    side_col: str,
    *,
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Welch two-sample test per group: mean difference, Welch t
    statistic and pooled-variance Cohen's d between the rows with
    ``side_col`` = 1 (treatment) and = 0 (control) — the experiment
    readout / planted-label effect-size screen beside the
    distribution-level :func:`group_ks`.

    One partial-aggregated (group, side) exchange of constant-size
    sufficient statistics (n, Σv, Σv²); closed form on the driver:

        vᵢ = (Σv² − (Σv)²/n) / (n−1)
        t  = (m₁ − m₀) / √(v₁/n₁ + v₀/n₀)
        d  = (m₁ − m₀) / √(((n₁−1)v₁ + (n₀−1)v₀) / (n₁+n₀−2))

    Groups missing a side, with nᵢ < 2, or with zero variance on both
    sides are dropped (the oracle's HAVING).  Returns
    ``(group_col, n_treat, n_ctrl, mean_diff, t_welch, cohen_d)``.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def widen(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t.column(value_col)),
                             pc.is_valid(t.column(side_col))))
        v = pc.cast(t.column(value_col), pa.float64())
        return pa.table({group_col: t.column(group_col),
                         "__side": pc.cast(t.column(side_col), pa.int64()),
                         "__v": v, "__vv": pc.multiply(v, v)})

    g = grouped_aggregate(
        ds.select_columns([group_col, value_col, side_col])
          .map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "__side"],
        {"__n": ("__v", "count"), "__s": ("__v", "sum"),
         "__ss": ("__vv", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    piv = g.pivot_table(index=group_col, columns="__side",
                        values=["__n", "__s", "__ss"], aggfunc="sum")
    rows = []
    for grp in sorted(piv.index):
        try:
            n1 = float(piv.loc[grp, ("__n", 1)])
            n0 = float(piv.loc[grp, ("__n", 0)])
        except KeyError:
            continue
        if not (n1 >= 2 and n0 >= 2):
            continue
        s1, s0 = float(piv.loc[grp, ("__s", 1)]), float(piv.loc[grp, ("__s", 0)])
        ss1, ss0 = float(piv.loc[grp, ("__ss", 1)]), float(piv.loc[grp, ("__ss", 0)])
        m1, m0 = s1 / n1, s0 / n0
        v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
        v0 = (ss0 - s0 * s0 / n0) / (n0 - 1)
        if v1 <= 0 and v0 <= 0:
            continue
        diff = m1 - m0
        t_w = diff / np.sqrt(v1 / n1 + v0 / n0)
        pooled = ((n1 - 1) * v1 + (n0 - 1) * v0) / (n1 + n0 - 2)
        d = diff / np.sqrt(pooled) if pooled > 0 else np.nan
        rows.append((grp, int(n1), int(n0), diff, t_w, d))
    return pd.DataFrame(rows, columns=[group_col, "n_treat", "n_ctrl",
                                       "mean_diff", "t_welch", "cohen_d"])


__all__.append("ab_test_stats")


def group_avg_precision(
    ds,
    group_col: str,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Exact average precision (PR-AUC under the step interpolation) per
    group: AP = (1/n⁺) · Σ_{k: rel_k=1} P@k over the ranking by
    (score DESC, id ASC) — the retrieval-quality twin of
    :func:`group_auc`.  The explicit ``id_col`` tiebreak makes the
    ranking a TOTAL order, so (unlike AUC) no tie-averaging convention
    is needed and both sides evaluate the identical k / cum⁺(k)
    integers.

    Same partition-prefix shape as :func:`group_ks`: a no-shuffle
    (group, partition) rows/positives pre-pass gives every partition the
    DESC-order offsets (counts in higher-score partitions), one narrow
    row exchange computes the local Σ cum⁺(k)/k terms, the driver sums
    the bounded partials.  Rows with null score/label drop.

    Returns ``(group_col, n_pos, n_rows, avg_precision)``; NaN when a
    group has no positives.
    """
    import pyarrow.compute as pc

    from ..functions.pdconv import arrow_to_pandas_safe
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET
    from .sort import sample_boundaries

    ds = ds.select_columns([group_col, score_col, label_col, id_col])
    ds = ds.materialize()
    bounds = np.asarray(
        sample_boundaries(ds, score_col, num_partitions, seed=seed),
        dtype=np.float64)
    nparts = len(bounds) + 1

    def _clean(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(score_col)),
                                pc.is_valid(t.column(label_col))))

    def _part(v: np.ndarray) -> np.ndarray:
        if len(bounds):
            return np.searchsorted(bounds, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    # pre-pass: per (group, partition) rows + positives, driver-combined
    cnt: dict[str, np.ndarray] = {}

    def counts(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "r": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(),
                                   use_na_sentinel=False)
        v = t.column(score_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        y = t.column(label_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        cell = codes * nparts + _part(v)
        size = len(uniq) * nparts
        r = np.bincount(cell, minlength=size)
        p_ = np.bincount(cell, weights=y, minlength=size)
        nz = np.flatnonzero(r)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "r": pa.array(r[nz], type=pa.int64()),
            "pos": pa.array(p_[nz].astype(np.int64)),
        })

    for b in ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
        for g, p, r, po in zip(b.column(group_col).to_pylist(),
                               b.column("p").to_pylist(),
                               b.column("r").to_pylist(),
                               b.column("pos").to_pylist()):
            a = cnt.setdefault(g, np.zeros((nparts, 2), dtype=np.int64))
            a[p, 0] += r
            a[p, 1] += po
    if not cnt:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_pos": pd.Series([], dtype=np.int64),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "avg_precision": pd.Series(
                                 [], dtype=np.float64)})
    # DESC-order offsets: rows/positives in HIGHER-score partitions
    suf = {}
    for g, a in cnt.items():
        rev = np.cumsum(a[::-1], axis=0)[::-1]
        s = np.zeros_like(a)
        s[:-1] = rev[1:]
        suf[g] = s

    def tag(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        v = batch.column(score_col).to_numpy(zero_copy_only=False) \
                 .astype(np.float64)
        return pack_by_bucket(batch, _part(v))

    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "s": pa.array([], type=pa.float64())})

    def part_sum(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return empty
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        v = df[score_col].to_numpy(dtype=np.float64)
        y = df[label_col].to_numpy(dtype=np.float64)
        i = df[id_col].to_numpy()
        # group-major, score DESC, id ASC
        order = np.lexsort((i, -v, codes))
        codes, y = codes[order], y[order]
        gstart = np.empty(len(codes), dtype=bool)
        gstart[0] = True
        gstart[1:] = codes[1:] != codes[:-1]
        idx = np.arange(len(codes), dtype=np.int64)
        local = idx - idx[np.flatnonzero(gstart)][np.cumsum(gstart) - 1] + 1
        cumy = np.cumsum(y)
        base = np.concatenate(
            [[0.0], cumy[np.flatnonzero(gstart)[1:] - 1]])
        local_pos = cumy - base[np.cumsum(gstart) - 1]
        offs = np.array([suf[g][pid] for g in
                         np.asarray(uniq, dtype=object)])
        k = local.astype(np.float64) + offs[codes, 0]
        cp = local_pos + offs[codes, 1]
        term = np.where(y == 1.0, cp / k, 0.0)
        ng = len(uniq)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)),
            "s": pa.array(np.bincount(codes, weights=term, minlength=ng)),
        })

    partials = (ds.map_batches(tag, batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
                  .groupby(_BUCKET)
                  .map_groups(part_sum, batch_format="pyarrow")
                  .to_pandas())
    rows = []
    for g in sorted(cnt):
        n_rows = int(cnt[g][:, 0].sum())
        n_pos = int(cnt[g][:, 1].sum())
        s = float(partials.loc[partials[group_col] == g, "s"].sum())
        ap = s / n_pos if n_pos > 0 else np.nan
        rows.append((g, n_pos, n_rows, ap))
    return pd.DataFrame(rows, columns=[group_col, "n_pos", "n_rows",
                                       "avg_precision"])


__all__.append("group_avg_precision")


def group_ndcg(
    ds,
    group_col: str,
    score_col: str,
    rel_col: str,
    id_col: str,
    *,
    k: int | None = None,
    num_partitions: int = 64,
    seed: int = 42,
) -> pd.DataFrame:
    """Exact NDCG@k per group over the (score DESC, id ASC) total order
    with INTEGER graded relevance — completes the retrieval-metric
    family beside :func:`group_auc` / :func:`group_avg_precision`.

        DCG@k  = Σ_{rank ≤ k} rel / log2(rank + 1)
        IDCG@k = the same over relevance sorted descending
        NDCG@k = DCG@k / IDCG@k        (NaN when IDCG = 0)

    log2 is evaluated as ``ln(rank+1)/ln(2)`` so a SQL mirror using the
    same expression is bit-identical per term.  Scale shape: the
    partition-prefix exchange gives every row its exact global DESC
    rank (rows in higher-score partitions counted by a no-shuffle
    pre-pass); IDCG needs NO ranking at all — it comes closed-form from
    the bounded per-(group, relevance) histogram, since ideal-order tie
    arrangement doesn't change the sum.

    Returns ``(group_col, n_rows, dcg, idcg, ndcg)``.
    """
    import pyarrow.compute as pc

    from ..functions.pdconv import arrow_to_pandas_safe
    from .blobshuffle import _BLOB, pack_by_bucket, unpack_blobs
    from .groupagg import grouped_aggregate
    from .partition import _BUCKET
    from .sort import sample_boundaries

    LN2 = np.log(2.0)
    ds = ds.select_columns([group_col, score_col, rel_col, id_col])
    ds = ds.materialize()
    bounds = np.asarray(
        sample_boundaries(ds, score_col, num_partitions, seed=seed),
        dtype=np.float64)
    nparts = len(bounds) + 1

    def _clean(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t.column(score_col)),
                                pc.is_valid(t.column(rel_col))))

    def _part(v: np.ndarray) -> np.ndarray:
        if len(bounds):
            return np.searchsorted(bounds, v, side="right").astype(np.int64)
        return np.zeros(len(v), dtype=np.int64)

    # pre-pass: per (group, partition) row counts → DESC offsets
    cnt: dict[str, np.ndarray] = {}

    def counts(t: pa.Table) -> pa.Table:
        t = _clean(t)
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "p": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(),
                                   use_na_sentinel=False)
        v = t.column(score_col).to_numpy(zero_copy_only=False) \
             .astype(np.float64)
        c = np.bincount(codes * nparts + _part(v),
                        minlength=len(uniq) * nparts)
        nz = np.flatnonzero(c)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)[nz // nparts]),
            "p": pa.array(nz % nparts, type=pa.int64()),
            "c": pa.array(c[nz], type=pa.int64()),
        })

    for b in ds.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True
                            ).iter_batches(batch_size=None,
                                           batch_format="pyarrow"):
        for g, p, c in zip(b.column(group_col).to_pylist(),
                           b.column("p").to_pylist(),
                           b.column("c").to_pylist()):
            a = cnt.setdefault(g, np.zeros(nparts, dtype=np.int64))
            a[p] += c
    if not cnt:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n_rows": pd.Series([], dtype=np.int64),
                             "dcg": pd.Series([], dtype=np.float64),
                             "idcg": pd.Series([], dtype=np.float64),
                             "ndcg": pd.Series([], dtype=np.float64)})
    suf = {}
    for g, a in cnt.items():
        rev = np.cumsum(a[::-1])[::-1]
        s = np.zeros_like(a)
        s[:-1] = rev[1:]
        suf[g] = s

    def tag(batch: pa.Table) -> pa.Table:
        batch = _clean(batch)
        v = batch.column(score_col).to_numpy(zero_copy_only=False) \
                 .astype(np.float64)
        return pack_by_bucket(batch, _part(v))

    empty = pa.table({group_col: pa.array([], type=pa.string()),
                      "d": pa.array([], type=pa.float64())})

    def part_dcg(tbl: pa.Table) -> pa.Table:
        pid = int(tbl.column(_BUCKET)[0].as_py())
        df = arrow_to_pandas_safe(unpack_blobs(tbl.column(_BLOB)))
        if df.empty:
            return empty
        codes, uniq = pd.factorize(df[group_col], use_na_sentinel=False)
        v = df[score_col].to_numpy(dtype=np.float64)
        rel = df[rel_col].to_numpy(dtype=np.float64)
        i = df[id_col].to_numpy()
        order = np.lexsort((i, -v, codes))
        codes, rel = codes[order], rel[order]
        gstart = np.empty(len(codes), dtype=bool)
        gstart[0] = True
        gstart[1:] = codes[1:] != codes[:-1]
        idx = np.arange(len(codes), dtype=np.int64)
        local = idx - idx[np.flatnonzero(gstart)][np.cumsum(gstart) - 1] + 1
        offs = np.array([suf[g][pid] for g in
                         np.asarray(uniq, dtype=object)], dtype=np.int64)
        rank = local + offs[codes]
        term = rel / (np.log(rank + 1.0) / LN2)
        if k is not None:
            term = np.where(rank <= k, term, 0.0)
        ng = len(uniq)
        return pa.table({
            group_col: pa.array(np.asarray(uniq, dtype=object)),
            "d": pa.array(np.bincount(codes, weights=term, minlength=ng)),
        })

    dcg_p = (ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
               .groupby(_BUCKET)
               .map_groups(part_dcg, batch_format="pyarrow")
               .to_pandas())

    # IDCG: closed form from the bounded (group, relevance) histogram
    def relprep(t: pa.Table) -> pa.Table:
        t = _clean(t)
        return pa.table({group_col: t.column(group_col),
                         "__rel": pc.cast(t.column(rel_col), pa.int64())})

    hist = grouped_aggregate(
        ds.map_batches(relprep, batch_format="pyarrow",
                       zero_copy_batch=True),
        [group_col, "__rel"], {"c": ("__rel", "count")},
        num_buckets=8,
    ).to_pandas().sort_values([group_col, "__rel"],
                              ascending=[True, False], ignore_index=True)
    rows = []
    for g in sorted(cnt):
        sub = hist[hist[group_col] == g]
        pos = 1
        idcg = 0.0
        for rel_v, c in zip(sub["__rel"], sub["c"]):
            stop = pos + int(c)
            if k is not None:
                stop = min(stop, k + 1)
            if stop > pos and rel_v > 0:
                ranks = np.arange(pos, stop, dtype=np.float64)
                idcg += float((rel_v / (np.log(ranks + 1.0) / LN2)).sum())
            pos += int(c)
            if k is not None and pos > k:
                break
        dcg = float(dcg_p.loc[dcg_p[group_col] == g, "d"].sum())
        n_rows = int(cnt[g].sum())
        ndcg = dcg / idcg if idcg > 0 else np.nan
        rows.append((g, n_rows, dcg, idcg, ndcg))
    return pd.DataFrame(rows, columns=[group_col, "n_rows", "dcg",
                                       "idcg", "ndcg"])


__all__.append("group_ndcg")


def _pav(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Weighted Pool-Adjacent-Violators over pre-sorted values: returns
    the non-decreasing fit minimizing Σ w·(y − f)².  Stack-based, O(n)
    amortized (each element is pushed once and merged at most once)."""
    n = len(y)
    means = np.empty(n, dtype=np.float64)
    weights = np.empty(n, dtype=np.float64)
    counts = np.empty(n, dtype=np.int64)
    top = -1
    for i in range(n):
        top += 1
        means[top], weights[top], counts[top] = y[i], w[i], 1
        while top > 0 and means[top - 1] > means[top]:
            tw = weights[top - 1] + weights[top]
            means[top - 1] = (means[top - 1] * weights[top - 1]
                              + means[top] * weights[top]) / tw
            weights[top - 1] = tw
            counts[top - 1] += counts[top]
            top -= 1
    return np.repeat(means[:top + 1], counts[:top + 1])


def group_isotonic(
    ds,
    group_col: str,
    score_col: str,
    label_col: str,
    *,
    out_col: str = "iso",
    num_buckets: int = 64,
    seed: int = 42,
):
    """Isotonic-regression calibration per group (PAV): fit the
    monotone-non-decreasing map score → E[label | score] that minimizes
    squared error, and emit it per row — the non-parametric calibrator
    (Zadrozny & Elkan 2002) that :func:`calibration_bins` approximates
    with fixed bins.  Equal scores are pre-pooled (the calibrator must
    be a FUNCTION of score), so output is deterministic regardless of
    row order.

    Distribution: one key-hash exchange (``bucketed_map_groups`` on
    ``group_col``); PAV is inherently sequential per group, so each
    group fits in one task — the standard calibration setting (groups =
    segments/models, each ≪ memory; the stack loop is O(n) amortized).
    Not SQL-expressible (no recursive pooling in SQL) — pinned by the
    minimax-formula oracle in pytest instead.
    """
    from .partition import bucketed_map_groups

    def fit_bucket(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return tbl.append_column(out_col, pa.array([], pa.float64()))
        parts = []
        for _, g in df.groupby(group_col, sort=False):
            s = g[score_col].to_numpy(dtype=np.float64)
            y = g[label_col].to_numpy(dtype=np.float64)
            # pre-pool ties on score: block mean + weight per distinct score
            order = np.argsort(s, kind="mergesort")
            s_s, y_s = s[order], y[order]
            new = np.empty(len(s_s), dtype=bool)
            new[0] = True
            new[1:] = s_s[1:] != s_s[:-1]
            blk = np.cumsum(new) - 1
            w = np.bincount(blk).astype(np.float64)
            ym = np.bincount(blk, weights=y_s) / w
            fit_blk = _pav(ym, w)
            g = g.copy()
            out = np.empty(len(s_s), dtype=np.float64)
            out[order] = fit_blk[blk]
            g[out_col] = out
            parts.append(g)
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    return bucketed_map_groups(ds, group_col, fit_bucket,
                               num_buckets=num_buckets, seed=seed)


__all__.append("group_isotonic")
