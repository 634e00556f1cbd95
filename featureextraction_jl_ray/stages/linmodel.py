"""Distributed linear-model fits per group — closed-form ridge from
mergeable sufficient statistics.

Scale shape: ONE partial-aggregation exchange.  Each batch emits the
per-group Gram sums (n, Σxᵢ, Σy, Σxᵢxⱼ, Σxᵢy) — a groups × O(k²) table
— the engine's grouped partial-sum machinery merges them, and the
driver solves a k×k system per group (model-sized work: groups × k²
floats, never row-scale).  No row ever leaves its block; the only
thing that shuffles is the Gram partials.

Why closed form and not SGD: at feature-engineering k (a handful of
engineered covariates per segment), the normal equations are exact,
deterministic, one-pass, and SQL-mirrorable — the right per-segment
baseline/trend/effect fit for a feature pipeline.  (High-dimensional
learning is a training-framework job, not a data-engine job.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_ridge", "ridge_predict"]


def grouped_ridge(ds, group_col: str, x_cols, y_col: str, *,
                  alpha: float = 1.0, num_buckets: int = 16,
                  min_rows: int = 3) -> pd.DataFrame:
    """Per-group ridge regression β̂ = (XᶜᵀXᶜ + αI)⁻¹ Xᶜᵀyᶜ on CENTERED
    covariates (the standard parameterization: the penalty never
    shrinks the intercept; intercept = ȳ − Σ βᵢ x̄ᵢ).

    For k = 2 the solve is the explicit 2×2 cofactor formula —
    LITERALLY the same op sequence an SQL oracle states, so the fit is
    reproducible to summation-order ulps (pin with a round grid).  For
    k > 2 it is ``np.linalg.solve`` (pytest-pinned instead).

    Groups with fewer than ``min_rows`` rows or a singular penalized
    Gram are dropped.  Returns a pandas DataFrame (model-sized):
    ``(group_col, n, intercept, beta_<x1>, …, beta_<xk>)``.
    """
    from .groupagg import grouped_aggregate

    x_cols = [x_cols] if isinstance(x_cols, str) else list(x_cols)
    k = len(x_cols)
    if k == 0:
        raise ValueError("grouped_ridge needs at least one x column")

    def widen(t: pa.Table) -> pa.Table:
        cols = {group_col: t.column(group_col)}
        X = [t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
             for c in x_cols]
        y = t.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        for i, xi in enumerate(X):
            cols[f"x{i}"] = pa.array(xi)
            cols[f"x{i}y"] = pa.array(xi * y)
            for j in range(i, k):
                cols[f"x{i}x{j}"] = pa.array(xi * X[j])
        cols["y"] = pa.array(y)
        return pa.table(cols)

    aggs = {"n": ("y", "count"), "sy": ("y", "sum")}
    for i in range(k):
        aggs[f"sx{i}"] = (f"x{i}", "sum")
        aggs[f"sx{i}y"] = (f"x{i}y", "sum")
        for j in range(i, k):
            aggs[f"sx{i}x{j}"] = (f"x{i}x{j}", "sum")

    wide = ds.map_batches(widen, batch_format="pyarrow",
                          zero_copy_batch=True)
    stats = grouped_aggregate(wide, group_col, aggs,
                              num_buckets=num_buckets).to_pandas()
    out = []
    for _, r in stats.iterrows():
        n = float(r["n"])
        if n < min_rows:
            continue
        # centered scatter: S_ij = Σxixj − Σxi·Σxj/n  (same form in SQL)
        S = np.empty((k, k))
        c = np.empty(k)
        for i in range(k):
            c[i] = r[f"sx{i}y"] - r[f"sx{i}"] * r["sy"] / n
            for j in range(i, k):
                S[i, j] = S[j, i] = (r[f"sx{i}x{j}"]
                                     - r[f"sx{i}"] * r[f"sx{j}"] / n)
        if k == 2:
            # explicit cofactor solve — the SQL-parity path
            a11, a22 = S[0, 0] + alpha, S[1, 1] + alpha
            a12 = S[0, 1]
            det = a11 * a22 - a12 * a12
            if det == 0.0:
                continue
            b = np.array([(a22 * c[0] - a12 * c[1]) / det,
                          (a11 * c[1] - a12 * c[0]) / det])
        else:
            A = S + alpha * np.eye(k)
            try:
                b = np.linalg.solve(A, c)
            except np.linalg.LinAlgError:
                continue
        icept = r["sy"] / n
        for i in range(k):
            icept = icept - b[i] * (r[f"sx{i}"] / n)
        out.append((r[group_col], int(n), icept, *b.tolist()))
    return pd.DataFrame(
        out, columns=[group_col, "n", "intercept",
                      *[f"beta_{c}" for c in x_cols]])


def ridge_predict(ds, model: pd.DataFrame, group_col: str, x_cols, *,
                  out_col: str = "y_hat"):
    """Score rows with a :func:`grouped_ridge` model: broadcast the
    (model-sized) coefficient table via ``ray.put``, one stateless
    vectorized pass; rows whose group has no model emit null."""
    import ray

    x_cols = [x_cols] if isinstance(x_cols, str) else list(x_cols)
    ref = ray.put(model.set_index(group_col))

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        g = batch.column(group_col).to_pandas()
        icept = m["intercept"].reindex(g).to_numpy(dtype=np.float64)
        yhat = icept.copy()
        for c in x_cols:
            beta = m[f"beta_{c}"].reindex(g).to_numpy(dtype=np.float64)
            x = batch.column(c).to_numpy(
                zero_copy_only=False).astype(np.float64)
            yhat = yhat + beta * x
        ok = np.isfinite(yhat)
        return batch.append_column(
            out_col, pa.array(np.where(ok, yhat, 0.0), mask=~ok))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
