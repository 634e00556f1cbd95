"""grouped_ridge / ridge_predict vs direct NumPy normal-equation oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from featureextraction_jl_ray.stages.linmodel import grouped_ridge, ridge_predict


def _ridge_direct(X, y, alpha):
    Xc = X - X.mean(axis=0)
    yc = y - y.mean()
    A = Xc.T @ Xc + alpha * np.eye(X.shape[1])
    b = np.linalg.solve(A, Xc.T @ yc)
    return y.mean() - X.mean(axis=0) @ b, b


def _mkdata(rng, n=6000, k=2):
    g = rng.choice(["a", "b", "c"], n)
    X = rng.normal(0, 1, (n, k))
    beta_true = {"a": np.arange(1, k + 1), "b": -np.arange(1, k + 1),
                 "c": np.zeros(k)}
    icept_true = {"a": 2.0, "b": -1.0, "c": 5.0}
    y = np.array([icept_true[gi] for gi in g])
    for j in range(k):
        y = y + np.array([beta_true[gi][j] for gi in g]) * X[:, j]
    y = y + rng.normal(0, 0.1, n)
    return g, X, y, beta_true, icept_true


def test_grouped_ridge_k2_vs_direct(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(107)
    g, X, y, beta_true, icept_true = _mkdata(rng, k=2)
    t = pa.table({"g": g, "x1": X[:, 0], "x2": X[:, 1], "y": y})
    out = grouped_ridge(rd.from_arrow(t), "g", ["x1", "x2"], "y",
                        alpha=1.0, num_buckets=4).set_index("g")
    for lvl in ("a", "b", "c"):
        m = g == lvl
        ic, b = _ridge_direct(X[m], y[m], 1.0)
        np.testing.assert_allclose(out.loc[lvl, "intercept"], ic, rtol=1e-9)
        np.testing.assert_allclose(
            out.loc[lvl, ["beta_x1", "beta_x2"]].to_numpy(dtype=float),
            b, rtol=1e-9)
        assert out.loc[lvl, "n"] == m.sum()
        # near-truth (α=1 on n≈2000 barely shrinks)
        np.testing.assert_allclose(
            out.loc[lvl, ["beta_x1", "beta_x2"]].to_numpy(dtype=float),
            beta_true[lvl], atol=0.02)
    # heavy shrinkage: betas → 0, intercept → group mean
    heavy = grouped_ridge(rd.from_arrow(t), "g", ["x1", "x2"], "y",
                          alpha=1e9, num_buckets=4).set_index("g")
    for lvl in ("a", "b", "c"):
        assert abs(heavy.loc[lvl, "beta_x1"]) < 1e-4
        np.testing.assert_allclose(heavy.loc[lvl, "intercept"],
                                   y[g == lvl].mean(), rtol=1e-3)


def test_grouped_ridge_k3_path(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(109)
    g, X, y, _, _ = _mkdata(rng, n=4000, k=3)
    t = pa.table({"g": g, "x1": X[:, 0], "x2": X[:, 1], "x3": X[:, 2],
                  "y": y})
    out = grouped_ridge(rd.from_arrow(t), "g", ["x1", "x2", "x3"], "y",
                        alpha=0.5, num_buckets=4).set_index("g")
    for lvl in ("a", "b", "c"):
        m = g == lvl
        ic, b = _ridge_direct(X[m], y[m], 0.5)
        np.testing.assert_allclose(out.loc[lvl, "intercept"], ic, rtol=1e-9)
        np.testing.assert_allclose(
            out.loc[lvl, ["beta_x1", "beta_x2", "beta_x3"]]
            .to_numpy(dtype=float), b, rtol=1e-9)


def test_ridge_predict_and_min_rows(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(113)
    g, X, y, _, _ = _mkdata(rng, n=2000, k=2)
    t = pa.table({"g": g, "x1": X[:, 0], "x2": X[:, 1], "y": y})
    ds = rd.from_arrow(t)
    model = grouped_ridge(ds, "g", ["x1", "x2"], "y", alpha=1.0,
                          num_buckets=4)
    scored = ridge_predict(ds, model, "g", ["x1", "x2"]).to_pandas()
    mi = model.set_index("g")
    exp = (mi["intercept"].reindex(scored["g"]).to_numpy()
           + mi["beta_x1"].reindex(scored["g"]).to_numpy()
           * scored["x1"].to_numpy()
           + mi["beta_x2"].reindex(scored["g"]).to_numpy()
           * scored["x2"].to_numpy())
    np.testing.assert_allclose(scored["y_hat"].to_numpy(), exp, rtol=1e-12)
    # fit quality: R² > 0.99 on this low-noise data
    resid = scored["y"].to_numpy() - scored["y_hat"].to_numpy()
    assert resid.var() < 0.02 * scored["y"].to_numpy().var()
    # unknown group at predict time → null
    t2 = pa.table({"g": ["zzz"], "x1": [1.0], "x2": [1.0], "y": [0.0]})
    s2 = ridge_predict(rd.from_arrow(t2), model, "g",
                       ["x1", "x2"]).to_pandas()
    assert s2["y_hat"].isna().all()
    # min_rows drops tiny groups
    t3 = pa.table({"g": ["solo", "solo"], "x1": [1.0, 2.0],
                   "x2": [0.0, 1.0], "y": [1.0, 2.0]})
    m3 = grouped_ridge(rd.from_arrow(t3), "g", ["x1", "x2"], "y",
                       min_rows=3, num_buckets=2)
    assert len(m3) == 0
