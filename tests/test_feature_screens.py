"""Feature-screening stages vs pure-NumPy references: one-way ANOVA F
(anova_f), weight-of-evidence / information value (fit_woe), and
market-basket association lift (association_lift)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from featureextraction_jl_ray.stages.encode import fit_woe
from featureextraction_jl_ray.stages.groupagg import association_lift
from featureextraction_jl_ray.stages.profile import anova_f


# ---------------------------------------------------------------- anova


def _anova_reference(df, g, v):
    groups = [x[v].to_numpy(dtype=float) for _, x in df.groupby(g)]
    k, n = len(groups), len(df)
    mean = df[v].mean()
    ssb = sum(len(x) * (x.mean() - mean) ** 2 for x in groups)
    ssw = sum(((x - x.mean()) ** 2).sum() for x in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return f, ssb / (ssb + ssw)


def test_anova_matches_reference(ray_session):
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "g": rng.choice(list("abcd"), 2000),
        "v": rng.normal(size=2000),
    })
    # plant real signal so F is large and stable
    df.loc[df.g == "a", "v"] += 3.0
    got = anova_f(rd.from_pandas(df), "g", "v", num_buckets=4)
    f, eta = _anova_reference(df, "g", "v")
    assert got["k"].item() == 4 and got["n"].item() == 2000
    np.testing.assert_allclose(got["f_stat"].item(), f, rtol=1e-9)
    np.testing.assert_allclose(got["eta_sq"].item(), eta, rtol=1e-9)


def test_anova_no_signal_small_f(ray_session):
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"g": rng.choice(list("ab"), 4000),
                       "v": rng.normal(size=4000)})
    got = anova_f(rd.from_pandas(df), "g", "v", num_buckets=4)
    assert got["f_stat"].item() < 5.0   # ~F(1, 4000) under the null


def test_anova_degenerate(ray_session):
    # single level → F null
    df = pd.DataFrame({"g": ["x"] * 10, "v": np.arange(10.0)})
    got = anova_f(rd.from_pandas(df), "g", "v", num_buckets=2)
    assert np.isnan(got["f_stat"].item())
    # constant within groups → SSW = 0 → null
    df2 = pd.DataFrame({"g": list("aabb"), "v": [1.0, 1.0, 2.0, 2.0]})
    got2 = anova_f(rd.from_pandas(df2), "g", "v", num_buckets=2)
    assert np.isnan(got2["f_stat"].item())


# ---------------------------------------------------------------- woe


def test_woe_matches_reference(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "cat": rng.choice(list("pqr"), 3000),
        "y": rng.random(3000) < 0.3,
    })
    got = fit_woe(rd.from_pandas(df), "cat", "y",
                  smoothing=0.5, num_buckets=4).to_pandas()
    ct = df.groupby("cat")["y"].agg(["sum", "count"])
    pos, neg = ct["sum"].to_numpy(float), (ct["count"] - ct["sum"]).to_numpy(float)
    p = (pos + 0.5) / pos.sum()
    q = (neg + 0.5) / neg.sum()
    want_woe, want_iv = np.log(p / q), (p - q) * np.log(p / q)
    assert got["cat"].tolist() == sorted(ct.index)
    np.testing.assert_allclose(got["woe"].to_numpy(), want_woe, rtol=1e-12)
    np.testing.assert_allclose(got["iv_term"].to_numpy(), want_iv, rtol=1e-12)
    assert (got["pos"].to_numpy() == pos).all()
    assert (got["neg"].to_numpy() == neg).all()


def test_woe_zero_cell_finite(ray_session):
    # all-positive category: smoothing keeps woe finite
    df = pd.DataFrame({"cat": ["a"] * 5 + ["b"] * 5,
                       "y": [True] * 5 + [False] * 5})
    got = fit_woe(rd.from_pandas(df), "cat", "y").to_pandas()
    assert np.isfinite(got["woe"]).all()
    assert got.loc[got.cat == "a", "woe"].item() > 0
    assert got.loc[got.cat == "b", "woe"].item() < 0


def test_woe_single_class_is_loud(ray_session):
    df = pd.DataFrame({"cat": list("ab"), "y": [True, True]})
    with pytest.raises(Exception, match="single-class"):
        fit_woe(rd.from_pandas(df), "cat", "y")


# ---------------------------------------------------------------- lift


def _lift_reference(df, e, i):
    ut = df[[e, i]].drop_duplicates()
    items = sorted(ut[i].unique())
    n_users = ut[e].nunique()
    tot = ut.groupby(i)[e].nunique()
    rows = []
    for x in range(len(items)):
        for y in range(x + 1, len(items)):
            a, b = items[x], items[y]
            ua = set(ut.loc[ut[i] == a, e])
            ub = set(ut.loc[ut[i] == b, e])
            nab = len(ua & ub)
            if nab:
                rows.append({"item_a": a, "item_b": b, "n_ab": nab,
                             "lift": n_users * nab / (tot[a] * tot[b])})
    return pd.DataFrame(rows)


def test_lift_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "u": rng.integers(0, 60, 1000),
        "it": rng.choice(list("vwxyz"), 1000),
    })
    got = association_lift(rd.from_pandas(df), "u", "it", num_buckets=4)
    want = _lift_reference(df, "u", "it")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_lift_planted_cooccurrence(ray_session):
    # items 'a' and 'b' always together, 'c' independent
    rows = []
    for u in range(40):
        rows += [{"u": u, "it": "a"}, {"u": u, "it": "b"}]
        if u % 2 == 0:
            rows.append({"u": u, "it": "c"})
    df = pd.DataFrame(rows)
    got = association_lift(rd.from_pandas(df), "u", "it", num_buckets=4)
    ab = got[(got.item_a == "a") & (got.item_b == "b")]
    ac = got[(got.item_a == "a") & (got.item_b == "c")]
    assert ab["lift"].item() == 1.0      # N·N/(N·N) — perfect but saturated
    assert ab["n_ab"].item() == 40
    assert ac["lift"].item() == 1.0      # c ⊂ a's users: 40·20/(40·20)
    # min_count filter drops rare pairs
    got2 = association_lift(rd.from_pandas(df), "u", "it",
                            min_count=25, num_buckets=4)
    assert set(zip(got2.item_a, got2.item_b)) == {("a", "b")}
