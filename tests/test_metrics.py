"""group_auc / group_autocorr / skew_join / hopping windows vs direct
numpy-pandas oracles, with the edge paths planted: tie blocks spanning
partition boundaries, single-class groups, null scores, hot-key
replication, and left-join nulls."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _auc_oracle(s, y):
    """Tie-averaged Mann-Whitney AUC, O(n log n) reference."""
    s, y = np.asarray(s, dtype=float), np.asarray(y, dtype=float)
    order = np.argsort(s, kind="mergesort")
    s, y = s[order], y[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # average of 1-based ranks i+1..j
        i = j
    npos, nneg = y.sum(), (1 - y).sum()
    if npos == 0 or nneg == 0:
        return np.nan
    return (ranks[y == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)


def test_group_auc_vs_oracle_with_ties(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_auc

    rng = np.random.default_rng(7)
    n = 5000
    g = rng.choice(["a", "b", "c"], n)
    # integer scores → dense ties, including across partition boundaries
    s = rng.integers(0, 40, n).astype(np.float64)
    # label correlated with score in group a, anti in b, independent in c
    p = np.where(g == "a", s / 40.0, np.where(g == "b", 1 - s / 40.0, 0.5))
    y = (rng.random(n) < p).astype(np.int64)
    t = pa.table({"g": g, "s": s, "y": y})
    out = group_auc(rd.from_arrow(t), "g", "s", "y",
                    num_partitions=16).set_index("g")
    for lvl in ("a", "b", "c"):
        m = g == lvl
        np.testing.assert_allclose(out.loc[lvl, "auc"],
                                   _auc_oracle(s[m], y[m]), rtol=0,
                                   atol=0)  # exact halves → bit-equal
        assert out.loc[lvl, "n_pos"] == y[m].sum()
        assert out.loc[lvl, "n_neg"] == (1 - y[m]).sum()
    assert out.loc["a", "auc"] > 0.7 and out.loc["b", "auc"] < 0.3


def test_group_auc_degenerate_and_nulls(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_auc

    t = pa.table({
        "g": ["one", "one", "one", "mix", "mix", "mix", "mix", "mix"],
        "s": pa.array([1.0, 2.0, 3.0, 1.0, 2.0, None, 3.0, 0.5],
                      type=pa.float64()),
        "y": pa.array([1, 1, 1, 0, 1, 1, 1, None], type=pa.int64()),
    })
    out = group_auc(rd.from_arrow(t), "g", "s", "y",
                    num_partitions=4).set_index("g")
    # single-class group → NaN auc, counts still reported
    assert np.isnan(out.loc["one", "auc"])
    assert out.loc["one", "n_pos"] == 3 and out.loc["one", "n_neg"] == 0
    # null score and null label rows dropped: mix keeps (1,0),(2,1),(3,1)
    assert out.loc["mix", "n_pos"] == 2 and out.loc["mix", "n_neg"] == 1
    np.testing.assert_allclose(out.loc["mix", "auc"], 1.0)


def test_group_autocorr_vs_pandas(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_autocorr

    rng = np.random.default_rng(3)
    rows = []
    base = pd.Timestamp("2024-01-01")
    # user 1: AR(1)-ish positive momentum; user 2: alternating (negative);
    # user 3: too few pairs; user 4: constant (zero variance)
    v1 = np.cumsum(rng.normal(0, 1, 50)) + 10
    for i, v in enumerate(v1):
        rows.append((1, base + pd.Timedelta(minutes=i), float(v), i))
    v2 = np.array([1.0, 9.0] * 20)
    for i, v in enumerate(v2):
        rows.append((2, base + pd.Timedelta(minutes=i), float(v), 100 + i))
    for i in range(3):
        rows.append((3, base + pd.Timedelta(minutes=i), float(i), 200 + i))
    for i in range(10):
        rows.append((4, base + pd.Timedelta(minutes=i), 5.0, 300 + i))
    df = pd.DataFrame(rows, columns=["uid", "ts", "v", "eid"])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = group_autocorr(ds, "uid", "ts", "v", k=1, min_pairs=5,
                         num_buckets=4, tiebreak_cols=("eid",))
    out = out.set_index("uid")
    assert 3 not in out.index          # min_pairs
    assert 4 not in out.index          # zero variance
    for uid, v in ((1, v1), (2, v2)):
        exp = np.corrcoef(v[:-1], v[1:])[0, 1]
        np.testing.assert_allclose(out.loc[uid, "autocorr"], exp,
                                   rtol=1e-9)
        assert out.loc[uid, "n_pairs"] == len(v) - 1
    assert out.loc[1, "autocorr"] > 0.5 and out.loc[2, "autocorr"] < -0.9


def test_skew_join_matches_plain_join(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.joins import skew_join

    rng = np.random.default_rng(5)
    # heavy skew: key 0 holds half the fact rows
    k = np.where(rng.random(4000) < 0.5, 0, rng.integers(1, 200, 4000))
    fact = pa.table({"k": k.astype(np.int64),
                     "x": rng.normal(0, 1, 4000)})
    dim = pa.table({"kk": np.arange(0, 150, dtype=np.int64),
                    "seg": [f"s{i % 7}" for i in range(150)]})
    got = skew_join(
        rd.from_arrow(fact), rd.from_arrow(dim), on="k", right_on="kk",
        how="inner", max_hot=8, hot_share=0.0, num_buckets=4,
        left_types={"k": pa.int64(), "x": pa.float64()},
        right_types={"kk": pa.int64(), "seg": pa.string()},
    ).to_pandas().sort_values(["k", "x"], ignore_index=True)
    exp = (fact.to_pandas().merge(
        dim.to_pandas().rename(columns={"kk": "k"}), on="k", how="inner")
        .sort_values(["k", "x"], ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["k", "x", "seg"]], exp[["k", "x", "seg"]])
    # the hot slice is really there (key 0 joined)
    assert (got["k"] == 0).sum() == (k == 0).sum()


def test_skew_join_left_and_fallback(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.joins import skew_join

    fact = pa.table({"k": pa.array([1, 1, 2, 99], type=pa.int64()),
                     "x": [1.0, 2.0, 3.0, 4.0]})
    dim = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                    "seg": ["a", "b"]})
    lt = {"k": pa.int64(), "x": pa.float64()}
    rt = {"k": pa.int64(), "seg": pa.string()}
    got = skew_join(rd.from_arrow(fact), rd.from_arrow(dim), on="k",
                    how="left", max_hot=1, hot_share=0.0, num_buckets=2,
                    left_types=lt, right_types=rt
                    ).to_pandas().sort_values("x", ignore_index=True)
    assert got["seg"].tolist() == ["a", "a", "b", None]
    # hot_share=1.0 → no key qualifies → pure bucketed fallback
    got2 = skew_join(rd.from_arrow(fact), rd.from_arrow(dim), on="k",
                     how="left", hot_share=1.0, num_buckets=2,
                     sample_frac=1.0, left_types=lt, right_types=rt
                     ).to_pandas().sort_values("x", ignore_index=True)
    assert got2["seg"].tolist() == ["a", "a", "b", None]


def test_hopping_window_agg_vs_bruteforce(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import hopping_window_agg

    rng = np.random.default_rng(9)
    base = pd.Timestamp("2024-03-01 00:07:00")
    ts = base + pd.to_timedelta(rng.integers(0, 7200, 500), unit="s")
    v = rng.uniform(0, 10, 500)
    df = pd.DataFrame({"ts": ts, "value": v})
    out = (hopping_window_agg(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        "ts", "value", window="1h", hop="15m", num_buckets=4)
        .to_pandas().sort_values("window_start", ignore_index=True))
    # brute force: every 15-min-aligned window [w, w+1h) containing ≥1 event
    t_us = ts.astype("datetime64[us]").astype(np.int64).to_numpy()
    hop = 15 * 60 * 1_000_000
    w_us = 4 * hop
    starts = np.unique(np.concatenate(
        [(t_us // hop - k) * hop for k in range(4)]))
    for w in starts:
        m = (t_us >= w) & (t_us < w + w_us)
        row = out[out["window_start"]
                  == pd.Timestamp(w, unit="us")]
        assert len(row) == 1 and int(row["n"].iloc[0]) == m.sum()
        np.testing.assert_allclose(row["sum_value"].iloc[0], v[m].sum(),
                                   rtol=1e-12)
    assert len(out) == len(starts)
    # every event contributes to exactly 4 windows
    assert out["n"].sum() == 4 * len(df)


def test_hopping_window_rejects_non_multiple(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import hopping_window_agg

    ds = rd.from_arrow(pa.table({
        "ts": pa.array([pd.Timestamp("2024-01-01")], pa.timestamp("us")),
        "value": [1.0]}))
    with pytest.raises(ValueError, match="whole multiple"):
        hopping_window_agg(ds, "ts", "value", window="1h", hop="25m")


def _wmedian_oracle(v, w):
    """Smallest v with W(<=v) >= W/2, per-distinct-value cumulative."""
    df = pd.DataFrame({"v": v, "w": w}).groupby("v", sort=True)["w"].sum()
    cum = df.cumsum().to_numpy()
    return float(df.index[np.searchsorted(cum, df.sum() / 2.0,
                                          side="left")])


def test_grouped_weighted_median_vs_oracle(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import (
        grouped_weighted_median,
    )

    rng = np.random.default_rng(13)
    n = 4000
    g = rng.choice(["a", "b"], n)
    # tie-heavy values (integers) + integer weights: cut boundaries land
    # exactly on cumulative steps
    v = rng.integers(0, 50, n).astype(np.float64)
    w = rng.integers(1, 5, n).astype(np.float64)
    t = pa.table({"g": g, "v": v, "w": w})
    out = grouped_weighted_median(
        rd.from_arrow(t), "g", "v", "w", num_partitions=8
    ).set_index("g")
    for lvl in ("a", "b"):
        m = g == lvl
        assert out.loc[lvl, "weighted_median"] == _wmedian_oracle(v[m], w[m])
        assert out.loc[lvl, "w_total"] == w[m].sum()
    # unweighted = plain exact median (lower median for even n)
    out2 = grouped_weighted_median(rd.from_arrow(t), "g", "v",
                                   num_partitions=8).set_index("g")
    for lvl in ("a", "b"):
        m = g == lvl
        assert out2.loc[lvl, "weighted_median"] == _wmedian_oracle(
            v[m], np.ones(m.sum()))
    # all weight on one value → that value, regardless of others
    t3 = pa.table({"g": ["z"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0],
                   "w": [1.0, 1.0, 100.0, 1.0, 1.0]})
    o3 = grouped_weighted_median(rd.from_arrow(t3), "g", "v", "w",
                                 num_partitions=4)
    assert o3["weighted_median"].iloc[0] == 3.0


def _ks_oracle(va, vb):
    allv = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(np.sort(va), allv, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), allv, side="right") / len(vb)
    return float(np.abs(fa - fb).max())


def test_group_ks_vs_oracle(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_ks

    rng = np.random.default_rng(17)
    n = 3000
    rows = []
    # group "same": both sides one distribution → small D
    v = rng.normal(0, 1, n)
    s = rng.integers(0, 2, n)
    rows.append(pa.table({"g": ["same"] * n, "v": v,
                          "side": s.astype(np.int64)}))
    # group "shift": side 1 shifted by 2 → large D
    v2 = rng.normal(0, 1, n) + np.where(s == 1, 2.0, 0.0)
    rows.append(pa.table({"g": ["shift"] * n, "v": v2,
                          "side": s.astype(np.int64)}))
    # group "onesided": only side 0 present → NaN
    rows.append(pa.table({"g": ["onesided"] * 10,
                          "v": rng.normal(0, 1, 10),
                          "side": np.zeros(10, dtype=np.int64)}))
    t = pa.concat_tables(rows)
    out = group_ks(rd.from_arrow(t), "g", "v", "side",
                   num_partitions=8).set_index("g")
    for lvl, vv in (("same", v), ("shift", v2)):
        mask = {"same": np.ones(n, bool), "shift": np.ones(n, bool)}[lvl]
        exp = _ks_oracle(vv[mask & (s == 1)], vv[mask & (s == 0)])
        np.testing.assert_allclose(out.loc[lvl, "ks"], exp, rtol=0, atol=0)
        assert out.loc[lvl, "n_a"] == (s == 1).sum()
        assert out.loc[lvl, "n_b"] == (s == 0).sum()
    assert out.loc["same", "ks"] < 0.08
    assert out.loc["shift", "ks"] > 0.5
    assert np.isnan(out.loc["onesided", "ks"])
    assert out.loc["onesided", "n_a"] == 0


def test_calibration_bins_vs_pandas(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import calibration_bins

    rng = np.random.default_rng(19)
    n = 2000
    # scores outside [0,1) must clamp into the edge bins
    sc = np.concatenate([rng.random(n), [-0.5, 1.7]])
    y = (rng.random(n + 2) < sc.clip(0, 1)).astype(np.int64)
    t = pa.table({"sc": sc, "y": y})
    out = (calibration_bins(rd.from_arrow(t), "sc", "y", n_bins=10,
                            lo=0.0, hi=1.0, num_buckets=4)
           .to_pandas().sort_values("bin", ignore_index=True))
    b = np.clip(np.floor(sc * 10), 0, 9).astype(int)
    exp = (pd.DataFrame({"bin": b, "y": y, "sc": sc})
           .groupby("bin").agg(n=("y", "size"), mean_label=("y", "mean"),
                               mean_score=("sc", "mean")).reset_index())
    assert out["bin"].tolist() == exp["bin"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()
    np.testing.assert_allclose(out["mean_label"], exp["mean_label"],
                               rtol=1e-12)
    np.testing.assert_allclose(out["mean_score"], exp["mean_score"],
                               rtol=1e-12)
    # a calibrated score: mean_label tracks mean_score per bin
    mid = out.iloc[2:8]
    assert (np.abs(mid["mean_label"] - mid["mean_score"]) < 0.15).all()


def test_inequality_stats_vs_closed_form(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import inequality_stats

    rng = np.random.default_rng(23)
    # "flat": equal values → gini = 0, theil = 0
    flat = np.full(500, 7.0)
    # "conc": lognormal (heavy concentration) with ties planted
    conc = np.round(rng.lognormal(0, 1.5, 800), 1) + 0.1
    # non-positive rows must drop
    g = ["flat"] * 500 + ["conc"] * 800 + ["conc", "flat"]
    v = np.concatenate([flat, conc, [0.0, -3.0]])
    t = pa.table({"g": g, "v": v})
    out = inequality_stats(rd.from_arrow(t), "g", "v",
                           num_partitions=8).set_index("g")
    np.testing.assert_allclose(out.loc["flat", "gini"], 0.0, atol=1e-12)
    np.testing.assert_allclose(out.loc["flat", "theil"], 0.0, atol=1e-12)
    assert out.loc["flat", "n"] == 500 and out.loc["conc", "n"] == 800
    # closed-form oracle on the sorted vector
    x = np.sort(conc)
    n, s = len(x), x.sum()
    gini = (2 * np.sum(np.arange(1, n + 1) * x) - (n + 1) * s) / (n * s)
    theil = np.sum((x / s) * np.log(x * n / s))
    np.testing.assert_allclose(out.loc["conc", "gini"], gini, rtol=1e-10)
    np.testing.assert_allclose(out.loc["conc", "theil"], theil, rtol=1e-10)
    assert out.loc["conc", "gini"] > 0.4


def test_ab_test_stats_vs_scipy_formula(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import ab_test_stats

    rng = np.random.default_rng(29)
    n = 2000
    side = rng.integers(0, 2, n)
    # group "lift": treatment shifted by +0.5σ; "null": no effect;
    # "tiny": too few treatment rows → dropped
    v_lift = rng.normal(0, 1, n) + 0.5 * side
    v_null = rng.normal(0, 1, n)
    t = pa.concat_tables([
        pa.table({"g": ["lift"] * n, "v": v_lift,
                  "side": side.astype(np.int64)}),
        pa.table({"g": ["null"] * n, "v": v_null,
                  "side": side.astype(np.int64)}),
        pa.table({"g": ["tiny", "tiny"], "v": [1.0, 2.0],
                  "side": pa.array([1, 0], type=pa.int64())}),
    ])
    out = ab_test_stats(rd.from_arrow(t), "g", "v", "side",
                        num_buckets=4).set_index("g")
    assert "tiny" not in out.index
    for gname, v in (("lift", v_lift), ("null", v_null)):
        a, b = v[side == 1], v[side == 0]
        diff = a.mean() - b.mean()
        tw = diff / np.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        pooled = ((len(a) - 1) * a.var(ddof=1)
                  + (len(b) - 1) * b.var(ddof=1)) / (len(a) + len(b) - 2)
        np.testing.assert_allclose(out.loc[gname, "mean_diff"], diff,
                                   rtol=1e-9)
        np.testing.assert_allclose(out.loc[gname, "t_welch"], tw,
                                   rtol=1e-9)
        np.testing.assert_allclose(out.loc[gname, "cohen_d"],
                                   diff / np.sqrt(pooled), rtol=1e-9)
        assert out.loc[gname, "n_treat"] == (side == 1).sum()
    assert out.loc["lift", "t_welch"] > 8
    assert abs(out.loc["null", "t_welch"]) < 3


def test_cusum_stats_detects_shift(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import cusum_stats

    rng = np.random.default_rng(31)
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: mean shift mid-series (0 → 5); user 2: stationary;
    # user 3: constant (dropped); user 4: single row (dropped)
    v1 = np.concatenate([rng.normal(0, 1, 40), rng.normal(5, 1, 40)])
    v2 = rng.normal(0, 1, 80)
    for i, v in enumerate(v1):
        rows.append((1, base + pd.Timedelta(minutes=i), float(v), i))
    for i, v in enumerate(v2):
        rows.append((2, base + pd.Timedelta(minutes=i), float(v), 100 + i))
    for i in range(5):
        rows.append((3, base + pd.Timedelta(minutes=i), 2.0, 200 + i))
    rows.append((4, base, 1.0, 300))
    df = pd.DataFrame(rows, columns=["uid", "ts", "v", "eid"])
    out = cusum_stats(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        "uid", "ts", "v", num_buckets=4, tiebreak_cols=("eid",)
    ).to_pandas().set_index("uid")
    assert 3 not in out.index and 4 not in out.index
    # direct oracle
    for uid, v in ((1, v1), (2, v2)):
        dev = np.abs(np.cumsum(v - v.mean()))
        exp = dev.max() / (np.std(v, ddof=1) * np.sqrt(len(v)))
        np.testing.assert_allclose(out.loc[uid, "cusum"], exp, rtol=1e-10)
        assert out.loc[uid, "n"] == len(v)
    # the shifted series scores far above the stationary one
    assert out.loc[1, "cusum"] > 2 * out.loc[2, "cusum"]


def _ap_oracle(score, y, ids):
    order = np.lexsort((ids, -score))
    y = np.asarray(y, dtype=float)[order]
    k = np.arange(1, len(y) + 1)
    cp = np.cumsum(y)
    if y.sum() == 0:
        return np.nan
    return float((cp[y == 1] / k[y == 1]).sum() / y.sum())


def test_group_avg_precision_vs_oracle(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_avg_precision

    rng = np.random.default_rng(37)
    n = 4000
    g = rng.choice(["a", "b"], n)
    s = rng.integers(0, 30, n).astype(np.float64)   # dense ties
    p = np.where(g == "a", s / 30.0, 0.3)
    y = (rng.random(n) < p).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)       # unordered ids
    t = pa.table({"g": g, "s": s, "y": y, "id": ids})
    out = group_avg_precision(rd.from_arrow(t), "g", "s", "y", "id",
                              num_partitions=8).set_index("g")
    for lvl in ("a", "b"):
        m = g == lvl
        np.testing.assert_allclose(out.loc[lvl, "avg_precision"],
                                   _ap_oracle(s[m], y[m], ids[m]),
                                   rtol=1e-12)
        assert out.loc[lvl, "n_pos"] == y[m].sum()
        assert out.loc[lvl, "n_rows"] == m.sum()
    # ranking-quality separation: informative score beats constant prior
    base_a = y[g == "a"].mean()
    assert out.loc["a", "avg_precision"] > base_a + 0.1
    # no-positive group → NaN
    t2 = pa.table({"g": ["z"] * 4, "s": [1.0, 2.0, 3.0, 4.0],
                   "y": pa.array([0, 0, 0, 0], type=pa.int64()),
                   "id": pa.array([1, 2, 3, 4], type=pa.int64())})
    o2 = group_avg_precision(rd.from_arrow(t2), "g", "s", "y", "id",
                             num_partitions=2)
    assert np.isnan(o2["avg_precision"].iloc[0])


def test_grouped_weighted_quantile_q(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import (
        grouped_weighted_median,
    )

    rng = np.random.default_rng(41)
    v = rng.integers(0, 1000, 3000).astype(np.float64)
    t = pa.table({"g": ["x"] * 3000, "v": v})
    for q in (0.1, 0.5, 0.9, 0.99):
        out = grouped_weighted_median(rd.from_arrow(t), "g", "v", q=q,
                                      num_partitions=8)
        # oracle: smallest v with count(<=v) >= q*n
        sv = np.sort(v)
        cum = np.arange(1, len(sv) + 1)
        exp = sv[np.searchsorted(cum, q * len(sv), side="left")]
        assert out["weighted_median"].iloc[0] == exp, q
    with pytest.raises(ValueError, match="q must be"):
        grouped_weighted_median(rd.from_arrow(t), "g", "v", q=0.0)


def test_with_group_percent_rank_vs_pandas(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.sort import with_group_percent_rank

    rng = np.random.default_rng(43)
    n = 3000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(0, 100, n).astype(np.float64)   # heavy ties
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"g": g, "v": v, "id": ids})
    out = (with_group_percent_rank(rd.from_arrow(t), "g", "v",
                                   num_partitions=8)
           .to_pandas().sort_values("id", ignore_index=True))
    df = pd.DataFrame({"g": g, "v": v, "id": ids})
    # pandas: min-tie rank = rank(method="min"); pct = (r-1)/(n-1)
    r = df.groupby("g")["v"].rank(method="min")
    nn = df.groupby("g")["v"].transform("size")
    exp = (r - 1) / (nn - 1)
    np.testing.assert_allclose(out["pct_rank"].to_numpy(),
                               exp.to_numpy(), rtol=0, atol=0)
    # range sanity: 0 at each group min, 1 at each unique max
    assert out["pct_rank"].min() == 0.0
    assert out["pct_rank"].max() <= 1.0
    # single-row group → 0.0
    t2 = pa.table({"g": ["solo"], "v": [5.0], "id": pa.array([0], pa.int64())})
    o2 = with_group_percent_rank(rd.from_arrow(t2), "g", "v",
                                 num_partitions=2).to_pandas()
    assert o2["pct_rank"].iloc[0] == 0.0


def test_group_ndcg_vs_oracle(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import group_ndcg

    rng = np.random.default_rng(47)
    n = 3000
    g = rng.choice(["a", "b"], n)
    s = rng.integers(0, 25, n).astype(np.float64)
    # graded relevance correlated with score in a, random in b
    rel = np.where(g == "a",
                   np.clip((s / 8).astype(int), 0, 3),
                   rng.integers(0, 4, n)).astype(np.int64)
    ids = rng.permutation(n).astype(np.int64)
    t = pa.table({"g": g, "s": s, "rel": rel, "id": ids})
    for k in (10, 100, None):
        out = group_ndcg(rd.from_arrow(t), "g", "s", "rel", "id", k=k,
                         num_partitions=8).set_index("g")
        for lvl in ("a", "b"):
            m = g == lvl
            order = np.lexsort((ids[m], -s[m]))
            r = rel[m][order].astype(float)
            kk = len(r) if k is None else min(k, len(r))
            pos = np.arange(1, len(r) + 1, dtype=float)
            disc = np.log(pos + 1.0) / np.log(2.0)
            dcg = (r[:kk] / disc[:kk]).sum()
            ri = np.sort(rel[m])[::-1].astype(float)
            idcg = (ri[:kk] / disc[:kk]).sum()
            np.testing.assert_allclose(out.loc[lvl, "dcg"], dcg,
                                       rtol=1e-10)
            np.testing.assert_allclose(out.loc[lvl, "ndcg"], dcg / idcg,
                                       rtol=1e-10)
            assert out.loc[lvl, "n_rows"] == m.sum()
    # correlated ranking beats random
    out = group_ndcg(rd.from_arrow(t), "g", "s", "rel", "id", k=100,
                     num_partitions=8).set_index("g")
    assert out.loc["a", "ndcg"] > out.loc["b", "ndcg"]


def test_time_weighted_avg_vs_bruteforce(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import time_weighted_avg

    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: hold 10 for 1h, then 20 for 3h → twa = (10·1+20·3)/4
        (1, base, 10.0, 0),
        (1, base + pd.Timedelta(hours=1), 20.0, 1),
        (1, base + pd.Timedelta(hours=4), 99.0, 2),   # last: no weight
        # user 2: burst of equal-ts ties (zero-delta rows) + spread
        (2, base, 1.0, 10),
        (2, base, 2.0, 11),            # tie: holds 0 µs
        (2, base + pd.Timedelta(hours=2), 3.0, 12),
        # user 3: single row → dropped; user 4: zero span → dropped
        (3, base, 7.0, 20),
        (4, base, 1.0, 30),
        (4, base, 2.0, 31),
    ]
    df = pd.DataFrame(rows, columns=["uid", "ts", "v", "eid"])
    out = time_weighted_avg(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        "uid", "ts", "v", num_buckets=4, tiebreak_cols=("eid",)
    ).to_pandas().set_index("uid")
    assert 3 not in out.index and 4 not in out.index
    np.testing.assert_allclose(out.loc[1, "twa"],
                               (10 * 1 + 20 * 3) / 4.0, rtol=1e-12)
    assert out.loc[1, "n"] == 3
    # user 2: value 1 holds 0h (tie), value 2 holds 2h → twa = 2
    np.testing.assert_allclose(out.loc[2, "twa"], 2.0, rtol=1e-12)


def test_user_trend_spearman(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import user_trend_spearman

    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: strictly increasing → ρ = 1; user 2: strictly decreasing
    # → ρ = −1; user 3: constant (dropped); user 4: noisy with TIES
    for i in range(20):
        rows.append((1, base + pd.Timedelta(minutes=i), float(i), i))
        rows.append((2, base + pd.Timedelta(minutes=i), float(-i), 50 + i))
        rows.append((3, base + pd.Timedelta(minutes=i), 4.0, 100 + i))
    rng = np.random.default_rng(53)
    v4 = rng.integers(0, 5, 40).astype(float)      # heavy ties
    for i, v in enumerate(v4):
        rows.append((4, base + pd.Timedelta(minutes=i), float(v), 200 + i))
    df = pd.DataFrame(rows, columns=["uid", "ts", "v", "eid"])
    out = user_trend_spearman(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        "uid", "ts", "v", num_buckets=4, tiebreak_cols=("eid",)
    ).to_pandas().set_index("uid")
    np.testing.assert_allclose(out.loc[1, "spearman"], 1.0, atol=1e-12)
    np.testing.assert_allclose(out.loc[2, "spearman"], -1.0, atol=1e-12)
    assert 3 not in out.index
    # tie-aware oracle: pearson of (position, average rank)
    x = np.arange(1, 41, dtype=float)
    y = pd.Series(v4).rank(method="average").to_numpy()
    exp = np.corrcoef(x, y)[0, 1]
    np.testing.assert_allclose(out.loc[4, "spearman"], exp, rtol=1e-10)


def test_run_label_qa_composition(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.pipelines.labelqa import run_label_qa
    from featureextraction_jl_ray.stages.metrics import (
        ab_test_stats, group_auc, group_ks,
    )

    rng = np.random.default_rng(59)
    n = 3000
    g = rng.choice(["u", "v"], n)
    s = rng.integers(0, 20, n).astype(np.float64)
    y = (rng.random(n) < s / 20.0).astype(np.int64)
    t = pa.table({"g": g, "s": s, "y": y})
    ds = rd.from_arrow(t)
    rep = run_label_qa(ds, "g", "s", "y", num_partitions=8,
                       num_buckets=4).set_index("g")
    # composition must agree with the individual stages
    a = group_auc(ds, "g", "s", "y", num_partitions=8).set_index("g")
    k = group_ks(ds, "g", "s", "y", num_partitions=8).set_index("g")
    w = ab_test_stats(ds, "g", "s", "y", num_buckets=4).set_index("g")
    for lvl in ("u", "v"):
        assert rep.loc[lvl, "auc"] == a.loc[lvl, "auc"]
        assert rep.loc[lvl, "ks"] == k.loc[lvl, "ks"]
        assert rep.loc[lvl, "t_welch"] == w.loc[lvl, "t_welch"]
    assert set(rep.columns) == {"n_pos", "n_neg", "auc", "ks",
                                "mean_diff", "t_welch", "cohen_d"}
    # informative score: every signal fires
    assert (rep["auc"] > 0.6).all() and (rep["ks"] > 0.2).all()
    assert (rep["t_welch"] > 5).all()


def test_ndtri_accuracy():
    from featureextraction_jl_ray.stages.sort import _ndtri

    # published normal quantiles (Abramowitz & Stegun / R qnorm)
    known = {
        0.5: 0.0,
        0.975: 1.959963984540054,
        0.025: -1.959963984540054,
        0.999: 3.090232306167813,
        0.001: -3.090232306167813,
        0.0001: -3.719016485455680,   # deep tail branch
        0.9999: 3.719016485455680,
        0.3: -0.5244005127080407,
        0.84: 0.9944578832097532,
    }
    p = np.array(list(known))
    z = _ndtri(p)
    # Acklam's approximation: |rel err| < 1.15e-9
    np.testing.assert_allclose(z, np.array(list(known.values())),
                               rtol=2e-9, atol=2e-9)
    # symmetry of the implementation itself
    grid = np.linspace(1e-6, 1 - 1e-6, 10001)
    np.testing.assert_allclose(_ndtri(grid), -_ndtri(1 - grid),
                               rtol=0, atol=5e-9)


def test_with_rank_gauss_vs_direct(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.sort import _ndtri, with_rank_gauss

    rng = np.random.default_rng(61)
    n = 4000
    g = rng.choice(["a", "b", "c"], n)
    v = rng.integers(0, 200, n).astype(np.float64)   # ties included
    ids = np.arange(n, dtype=np.int64)
    out = (with_rank_gauss(rd.from_arrow(pa.table({"g": g, "v": v,
                                                   "id": ids})),
                           "g", "v", out_col="z", num_partitions=8)
           .to_pandas().sort_values("id", ignore_index=True))
    df = pd.DataFrame({"g": g, "v": v, "id": ids})
    r = df.groupby("g")["v"].rank(method="min")
    nn = df.groupby("g")["v"].transform("size")
    pct = ((r - 1) / (nn - 1)).to_numpy()
    exp = _ndtri(np.clip(pct, 1e-6, 1 - 1e-6))
    # identical rank path + identical ndtri ⇒ bit-equal
    np.testing.assert_array_equal(out["z"].to_numpy(), exp)
    # monotone (order-preserving) within each group
    for lvl in ("a", "b", "c"):
        sub = out[out["g"] == lvl].sort_values("v")
        assert (np.diff(sub["z"].to_numpy()) >= 0).all()
    # Gaussianization: a big distinct-valued group lands near N(0,1)
    m = 20000
    v2 = np.exp(rng.normal(size=m)) * 100  # heavily skewed input
    o2 = (with_rank_gauss(
            rd.from_arrow(pa.table({"g": ["x"] * m, "v": v2,
                                    "id": np.arange(m, dtype=np.int64)})),
            "g", "v", out_col="z", num_partitions=8)
          .to_pandas())
    z2 = o2["z"].to_numpy()
    assert abs(z2.mean()) < 0.01
    assert abs(z2.std() - 1.0) < 0.02
    skew = ((z2 - z2.mean()) ** 3).mean() / z2.std() ** 3
    assert abs(skew) < 0.01


def _iso_minimax(y, w):
    """O(n³) reference: isotonic fit via the minimax identity
    f(k) = max_{i≤k} min_{j≥k} weighted-avg(y[i..j])."""
    n = len(y)
    out = np.empty(n)
    for k in range(n):
        best = -np.inf
        for i in range(k + 1):
            m = min((w[i:j + 1] @ y[i:j + 1]) / w[i:j + 1].sum()
                    for j in range(k, n))
            best = max(best, m)
        out[k] = best
    return out


def test_pav_vs_minimax_oracle():
    from featureextraction_jl_ray.stages.metrics import _pav

    rng = np.random.default_rng(83)
    for trial in range(20):
        n = int(rng.integers(1, 30))
        y = rng.normal(size=n)
        w = rng.integers(1, 5, n).astype(np.float64)
        got = _pav(y, w)
        np.testing.assert_allclose(got, _iso_minimax(y, w),
                                   rtol=1e-12, atol=1e-12, err_msg=str(trial))
        # monotone, mean-preserving, idempotent
        assert (np.diff(got) >= 0).all()
        np.testing.assert_allclose((got * w).sum(), (y * w).sum(), rtol=1e-12)
        np.testing.assert_allclose(_pav(got, w), got, rtol=1e-12)


def test_group_isotonic_distributed(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.metrics import _pav, group_isotonic

    rng = np.random.default_rng(89)
    n = 5000
    g = rng.choice(["a", "b"], n)
    s = rng.integers(0, 40, n).astype(np.float64)      # heavy score ties
    y = (rng.random(n) < s / 40.0).astype(np.int64)    # noisy-monotone
    ids = np.arange(n, dtype=np.int64)
    out = (group_isotonic(
            rd.from_arrow(pa.table({"g": g, "s": s, "y": y, "id": ids})),
            "g", "s", "y", out_col="iso", num_buckets=4)
           .to_pandas().sort_values("id", ignore_index=True))
    df = pd.DataFrame({"g": g, "s": s, "y": y, "id": ids})
    for lvl in ("a", "b"):
        sub = df[df["g"] == lvl]
        agg = (sub.groupby("s")["y"]
               .agg(["mean", "count"]).sort_index())
        fit = _pav(agg["mean"].to_numpy(),
                   agg["count"].to_numpy(dtype=np.float64))
        want = pd.Series(fit, index=agg.index)
        got = out[out["g"] == lvl]
        np.testing.assert_allclose(
            got["iso"].to_numpy(),
            want.reindex(got["s"]).to_numpy(), rtol=0, atol=0)
        # calibration is monotone in score and inside [0, 1]
        o = got.sort_values("s")
        assert (np.diff(o["iso"].to_numpy()) >= 0).all()
        assert o["iso"].between(0, 1).all()


def test_jaro_winkler_vs_duckdb_fuzz():
    import duckdb

    from featureextraction_jl_ray.stages.editdist import jaro_winkler_sim

    rng = np.random.default_rng(97)
    alpha = np.array(list("abcde"))
    pairs = []
    for _ in range(400):
        la, lb = rng.integers(0, 13, 2)
        pairs.append(("".join(rng.choice(alpha, la)),
                      "".join(rng.choice(alpha, lb))))
    # planted edges: empties, equal, repeated chars, long shared prefix
    pairs += [("", ""), ("", "abc"), ("aaaa", "aaaa"), ("aaab", "aaba"),
              ("abcdefgh", "abcdxxxx"), ("ab", "ba"), ("aaaaa", "a")]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = jaro_winkler_sim(a, b)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"a": a.astype(str), "b": b.astype(str),
                                    "i": np.arange(len(a))}))
    want = con.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM t ORDER BY i"
    ).df().iloc[:, 0].to_numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    # count bit-exact agreement (the gate rounds to 1e-9, so a handful
    # of ulp diffs are fine, but wholesale drift is a bug)
    assert (got == want).mean() > 0.99
