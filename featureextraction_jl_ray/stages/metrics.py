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
