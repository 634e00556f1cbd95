"""Column profiler vs DuckDB describe-style aggregates, including a
null-bearing column (the profile's reason to exist)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def test_profile_with_nulls_vs_duckdb(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.profile import profile_columns

    t = pa.table({
        "x": pa.array([1.0, None, 3.0, 3.0, None], type=pa.float64()),
        "s": pa.array(["a", "b", None, "a", "a"]),
    })
    got = profile_columns(rd.from_arrow(t)).set_index("column")
    con = duckdb.connect()
    con.register("t", t)
    w = con.execute("""
        SELECT count(*) n, count(*) FILTER (x IS NULL) nn,
               count(DISTINCT x) nd, min(x) mn, max(x) mx,
               avg(x) mean, stddev_samp(x) std FROM t""").fetchone()
    r = got.loc["x"]
    assert (r.n, r.n_null, r.n_distinct) == (w[0], w[1], w[2])
    np.testing.assert_allclose(np.array([r["vmin"], r["vmax"], r["mean"], r["std"]], dtype=float),
                               np.array(w[3:], dtype=float), rtol=1e-9)
    rs = got.loc["s"]
    assert (rs.n, rs.n_null, rs.n_distinct) == (5, 1, 2)
    assert np.isnan(float(rs["vmin"])) and np.isnan(float(rs["mean"]))


def test_categorical_association_vs_scipy_formula(ray_session):
    """χ²/Cramér's V equal the textbook formula computed in NumPy on the
    whole table (full grid incl. zero cells); independent columns score
    ≈0; a deterministic dependence scores high; guard fires."""
    import pytest
    import ray as _ray

    from featureextraction_jl_ray.stages.profile import (
        categorical_association,
    )

    rng = np.random.default_rng(4)
    a = rng.integers(0, 4, 4000)
    dep = (a * 2 + rng.integers(0, 2, 4000)) % 8  # strongly dependent
    ind = rng.integers(0, 5, 4000)                 # independent
    df = pd.DataFrame({"a": a.astype(str), "dep": dep.astype(str),
                       "ind": ind.astype(str)})
    ds = _ray.data.from_pandas(df).repartition(6)

    got = categorical_association(ds, "a", "dep", num_buckets=4)
    O = pd.crosstab(df.a, df.dep).to_numpy(dtype=np.float64)
    n = O.sum()
    E = O.sum(1, keepdims=True) * O.sum(0, keepdims=True) / n
    chi2 = ((O - E) ** 2 / E).sum()
    assert abs(got.chi2[0] - chi2) < 1e-9
    assert got.dof[0] == (O.shape[0] - 1) * (O.shape[1] - 1)
    v = np.sqrt(chi2 / (n * (min(O.shape) - 1)))
    assert abs(got.cramers_v[0] - v) < 1e-12
    assert got.cramers_v[0] > 0.5

    weak = categorical_association(ds, "a", "ind", num_buckets=4)
    assert weak.cramers_v[0] < 0.05

    with pytest.raises(ValueError, match="max_cells"):
        categorical_association(ds, "a", "dep", max_cells=3)


def test_population_stability_identical_and_shifted(ray_session):
    """PSI ≈ 0 for identical distributions; large for a clear shift;
    per-bin probabilities sum to 1; empty current bins stay finite."""
    import ray as _ray

    from featureextraction_jl_ray.stages.profile import population_stability

    rng = np.random.default_rng(71)
    ref = pd.DataFrame({"value": rng.standard_normal(4000)})
    same = pd.DataFrame({"value": rng.standard_normal(4000)})
    shifted = pd.DataFrame({"value": rng.standard_normal(4000) + 3.0})

    r = _ray.data.from_pandas(ref)
    out_same = population_stability(r, _ray.data.from_pandas(same),
                                    "value", bins=10)
    out_shift = population_stability(r, _ray.data.from_pandas(shifted),
                                     "value", bins=10)
    assert len(out_same) == 10
    assert abs(out_same.p_ref.sum() - 1.0) < 1e-4
    assert abs(out_same.p_cur.sum() - 1.0) < 1e-4
    psi_same = out_same.contrib.sum()
    psi_shift = out_shift.contrib.sum()
    assert psi_same < 0.05              # same distribution: stable
    assert psi_shift > 1.0              # 3-sigma shift: strongly drifted
    assert np.isfinite(out_shift.contrib).all()  # empty bins smoothed


def test_categorical_drift_planted(ray_session):
    """Same distribution -> chi2 ~ 0; disjoint category -> large
    contribution on that category; zero-one-side categories finite."""
    import ray as _ray

    from featureextraction_jl_ray.stages.profile import categorical_drift

    rng = np.random.default_rng(73)
    ref = pd.DataFrame({"c": rng.choice(["a", "b", "c"], 3000,
                                        p=[0.5, 0.3, 0.2])})
    same = pd.DataFrame({"c": rng.choice(["a", "b", "c"], 3000,
                                         p=[0.5, 0.3, 0.2])})
    new = pd.DataFrame({"c": rng.choice(["a", "b", "z"], 3000,
                                        p=[0.2, 0.2, 0.6])})
    r = _ray.data.from_pandas(ref)
    out_same = categorical_drift(r, _ray.data.from_pandas(same), "c")
    out_new = categorical_drift(r, _ray.data.from_pandas(new), "c")
    assert out_same.chi2_contrib.sum() < 15          # ~chi2(2) scale
    assert out_new.chi2_contrib.sum() > 500          # massive shift
    z = out_new.set_index("c")
    assert z.loc["z", "n_ref"] == 0 and z.loc["z", "n_cur"] > 0
    assert np.isfinite(out_new.chi2_contrib).all()
    # shares normalize per side
    assert abs(out_new.p_ref.sum() - 1) < 1e-4
    assert abs(out_new.p_cur.sum() - 1) < 1e-4


def test_benford_deviation_vs_numpy_oracle(ray_session):
    """benford_deviation vs a direct pandas/numpy computation, with the
    edge rows the operator must drop (zeros, negatives kept via abs,
    sub-resolution values below 1/scale) and a planted Benford-ish vs
    uniform-digit contrast between the two groups."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.profile import benford_deviation

    rng = np.random.default_rng(11)
    # group "nat": log-uniform magnitudes (close to Benford)
    nat = np.exp(rng.uniform(np.log(1e-3), np.log(1e3), 4000))
    # group "uni": uniform on [100, 1000) — leading digits 1..9 uniform-ish
    uni = rng.uniform(100.0, 1000.0, 4000)
    vals = np.concatenate([
        nat, uni,
        [0.0, -0.0, 1e-9, -1e-9, -123.45, 5e-7],  # edge rows
    ])
    grp = np.array(["nat"] * 4000 + ["uni"] * 4000 + ["nat"] * 6)
    t = pa.table({"g": grp, "v": vals})
    out = benford_deviation(
        rd.from_arrow(t), "v", "g", scale=1_000_000.0, num_buckets=4
    ).to_pandas().set_index("g")

    # oracle: same integer-string digit rule
    exp_p = np.log10(1.0 + 1.0 / np.arange(1, 10))
    for g in ("nat", "uni"):
        v = vals[grp == g]
        iv = np.floor(np.abs(v) * 1e6)
        iv = iv[iv > 0].astype(np.int64)
        d = np.array([int(str(x)[0]) for x in iv])
        cnt = np.bincount(d, minlength=10)[1:10].astype(float)
        n = cnt.sum()
        chi2 = (((cnt - n * exp_p) ** 2) / (n * exp_p)).sum()
        assert out.loc[g, "n"] == int(n)
        np.testing.assert_allclose(out.loc[g, "benford_chi2"], chi2,
                                   rtol=1e-12)
    # edge rows: 0.0/-0.0 and the two sub-resolution values drop;
    # -123.45 and 5e-7 (iv=0?) — 5e-7*1e6 = 0.5 → floor 0 → dropped
    assert out.loc["nat", "n"] == 4000 - (nat == 0).sum() + 1 \
        - int((np.floor(np.abs(nat) * 1e6) == 0).sum())
    # natural data hugs Benford far tighter than uniform-on-a-decade
    assert out.loc["nat", "benford_chi2"] < out.loc["uni", "benford_chi2"]


def test_mutual_information_extremes(ray_session):
    """MI ≈ 0 under independence; MI = H(x) = H(y) under a bijection."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.profile import mutual_information

    rng = np.random.default_rng(21)
    n = 6000
    x = rng.choice(["a", "b", "c"], n)
    indep = pa.table({"x": x, "y": rng.choice(["u", "v"], n)})
    out = mutual_information(rd.from_arrow(indep), "x", "y").iloc[0]
    assert out["n"] == n
    assert 0 <= out["mi"] < 0.005          # sampling noise scale
    assert abs(out["nmi"]) < 0.01
    # deterministic copy: MI = H(x) = H(y), NMI = 1
    bij = pa.table({"x": x, "y": x})
    o2 = mutual_information(rd.from_arrow(bij), "x", "y").iloc[0]
    np.testing.assert_allclose(o2["mi"], o2["h_x"], rtol=1e-12)
    np.testing.assert_allclose(o2["h_x"], o2["h_y"], rtol=1e-12)
    np.testing.assert_allclose(o2["nmi"], 1.0, rtol=1e-12)
    # null rows in either column are excluded
    withnull = pa.table({
        "x": pa.array(["a", "b", None, "a"]),
        "y": pa.array(["u", None, "u", "v"])})
    o3 = mutual_information(rd.from_arrow(withnull), "x", "y").iloc[0]
    assert o3["n"] == 2
