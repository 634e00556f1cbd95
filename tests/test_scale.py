"""Column-wise scaling / encoding stages vs NumPy + DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.scale import (
    corr_table,
    equal_width_bin,
    fit_min_max,
    fit_numeric_moments,
    min_max_scale,
    one_hot_encode,
    standard_scale,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(EVENTS, columns=["event_id", "event_type", "value"])


def _values():
    return duckdb.sql(f"SELECT value FROM '{EVENTS}'").fetchnumpy()["value"]


def test_fit_numeric_moments_matches_numpy(events_ds):
    rng = np.random.default_rng(0)
    # two correlated columns via a synthetic second column is overkill —
    # use (value, value²) which has nontrivial covariance
    import ray.data as rd

    v = _values()
    X = np.column_stack([v, v * v])
    ds = rd.from_arrow(pa.table({"a": X[:, 0], "b": X[:, 1]}))
    m = fit_numeric_moments(ds, ["a", "b"], batch_size=97)
    assert m.n == len(v)
    np.testing.assert_allclose(m.mean, X.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(m.cov(), np.cov(X, rowvar=False), rtol=1e-9)
    ct = corr_table(m, ["a", "b"])
    want = np.corrcoef(X, rowvar=False)[0, 1]
    np.testing.assert_allclose(ct.column("corr").to_numpy()[0], want, rtol=1e-9)


def test_standard_scale_zero_mean_unit_var(events_ds):
    m = fit_numeric_moments(events_ds, ["value"])
    out = standard_scale(events_ds, ["value"], m)
    z = np.array([r["value_z"] for r in out.take_all()])
    assert abs(z.mean()) < 1e-9
    assert abs(z.std(ddof=1) - 1.0) < 1e-9


def test_min_max_scale_and_bin_exact(events_ds):
    v = _values()
    bounds = fit_min_max(events_ds, ["value"], batch_size=61)
    lo, hi = bounds["value"]
    assert lo == v.min() and hi == v.max()
    out = equal_width_bin(
        min_max_scale(events_ds, ["value"], bounds),
        "value", num_bins=10, lo=lo, hi=hi,
    )
    rows = out.take_all()
    got_mm = np.array([r["value_mm"] for r in rows])
    got_bin = np.array([r["value_bin"] for r in rows])
    vals = np.array([r["value"] for r in rows])
    np.testing.assert_array_equal(got_mm, (vals - lo) / (hi - lo))
    want_bin = np.clip(np.floor((vals - lo) * 10 / (hi - lo)), 0, 9).astype(np.int64)
    np.testing.assert_array_equal(got_bin, want_bin)
    # the max row lands in the top bin, min row in bin 0
    assert got_bin[vals.argmax()] == 9 and got_bin[vals.argmin()] == 0
    # bit-exact vs DuckDB evaluating the mirrored SQL expression
    sql = duckdb.sql(
        f"""
        SELECT event_id, (value - mn) / (mx - mn) AS mm,
               LEAST(GREATEST(CAST(FLOOR((value - mn) * 10 / (mx - mn)) AS BIGINT), 0), 9) AS b
        FROM '{EVENTS}', (SELECT min(value) mn, max(value) mx FROM '{EVENTS}')
        ORDER BY event_id
        """
    ).fetchnumpy()
    order = np.argsort(np.array([r["event_id"] for r in rows]))
    np.testing.assert_array_equal(got_mm[order], sql["mm"])
    np.testing.assert_array_equal(got_bin[order], sql["b"])


def test_one_hot_matches_duckdb(events_ds):
    out = one_hot_encode(events_ds.select_columns(["event_id", "event_type"]),
                         "event_type", prefix="et")
    rows = sorted(out.take_all(), key=lambda r: r["event_id"])
    cats = duckdb.sql(
        f"SELECT DISTINCT event_type FROM '{EVENTS}' ORDER BY 1"
    ).fetchnumpy()["event_type"]
    assert [f"et_{c}" for c in cats] == [k for k in rows[0] if k.startswith("et_")]
    want = duckdb.sql(
        f"SELECT event_type FROM '{EVENTS}' ORDER BY event_id"
    ).fetchnumpy()["event_type"]
    for r, t in zip(rows, want):
        onehots = {k: r[k] for k in r if k.startswith("et_")}
        assert sum(onehots.values()) == 1
        assert onehots[f"et_{t}"] == 1


def test_one_hot_pinned_vocab_unknown_is_zero(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"c": ["a", "b", "zzz", None]}))
    rows = one_hot_encode(ds, "c", categories=["a", "b"], drop_input=True).take_all()
    assert [sorted(r.items()) for r in rows] == [
        [("c_a", 1), ("c_b", 0)],
        [("c_a", 0), ("c_b", 1)],
        [("c_a", 0), ("c_b", 0)],
        [("c_a", 0), ("c_b", 0)],
    ]


def test_fit_quantiles_and_robust_scale(events_ds):
    from featureextraction_jl_ray.stages.scale import fit_quantiles, robust_scale

    v = _values()
    q = fit_quantiles(events_ds, "value")
    want = {p: np.quantile(v, p) for p in (0.25, 0.5, 0.75)}
    for p in want:
        assert abs(q[p] - want[p]) < 1e-9
    # DuckDB quantile_cont convention check (the oracle contract)
    dq = duckdb.sql(
        f"SELECT quantile_cont(value, 0.25), quantile_cont(value, 0.5), "
        f"quantile_cont(value, 0.75) FROM '{EVENTS}'"
    ).fetchone()
    assert all(abs(q[p] - d) < 1e-9 for p, d in zip((0.25, 0.5, 0.75), dq))

    out = robust_scale(events_ds, ["value"], {"value": q}).take_all()
    med, iqr = want[0.5], want[0.75] - want[0.25]
    for r in out[:50]:
        assert abs(r["value_rs"] - (r["value"] - med) / iqr) < 1e-12

    # sketch path: approximate but close at this size
    qs = fit_quantiles(events_ds, "value", method="sketch", sketch_size=512)
    for p in want:
        assert abs(qs[p] - want[p]) < np.std(v) * 0.2
    with pytest.raises(ValueError):
        fit_quantiles(events_ds, "value", method="nope")


def test_assemble_vector_feeds_pca(ray_session):
    """Scalar columns → fixed_size_list vector → the PCA kernel accepts
    it (the assembler is the bridge from tabular prep to the
    FeatureExtraction kernels)."""
    import numpy as np
    import ray.data as rd

    from featureextraction_jl_ray.stages.scale import assemble_vector
    from featureextraction_jl_ray.state.pca import fit_pca

    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_quantity", "l_extendedprice",
                                  "l_discount", "l_tax"])
    out = assemble_vector(ds, ["l_quantity", "l_extendedprice",
                               "l_discount", "l_tax"], out_col="features")
    df = out.to_pandas()
    X = np.stack(df.features.to_numpy())
    assert X.shape[1] == 4
    ref = df[["l_quantity", "l_extendedprice", "l_discount", "l_tax"]].to_numpy()
    np.testing.assert_array_equal(X, ref)
    model = fit_pca(out, "features", k=2)
    assert model.components.shape == (4, 2)


def test_assemble_vector_null_handling(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from featureextraction_jl_ray.stages.scale import assemble_vector

    t = pa.table({"a": [1.0, None, 3.0], "b": [4.0, 5.0, 6.0]})
    with pytest.raises(Exception, match="nulls"):
        assemble_vector(rd.from_arrow(t), ["a", "b"]).to_pandas()
    got = assemble_vector(rd.from_arrow(t), ["a", "b"],
                          fill_null=0.0).to_pandas()
    np.testing.assert_array_equal(np.stack(got.features.to_numpy()),
                                  [[1, 4], [0, 5], [3, 6]])


def test_sorted_scan_hot_entity_guard(ray_session):
    """VERDICT r2 №6: a bucket blown past max_bucket_bytes by one hot
    entity raises a loud error naming the entity, not an OOM."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from featureextraction_jl_ray.stages.partition import sorted_scan

    n = 50_000
    t = pa.table({
        "eid": pa.array(np.r_[np.zeros(n - 5, dtype=np.int64),
                              np.arange(1, 6, dtype=np.int64)]),
        "ts": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.random.default_rng(0).standard_normal(n)),
    })
    ds = rd.from_arrow(t).repartition(4)
    with pytest.raises(Exception, match="hottest entity 0"):
        sorted_scan(ds, "eid", "ts", lambda df: df, num_buckets=4,
                    max_bucket_bytes=100_000).to_pandas()
    # same data passes with the default budget
    out = sorted_scan(ds, "eid", "ts", lambda df: df, num_buckets=4)
    assert out.count() == n


def test_grouped_mad_vs_duckdb(ray_session, sf_dir):
    """Nested-median MAD == DuckDB median/mad, partition-invariant;
    single-value keys get mad 0; max_keys guard fires."""
    import pytest

    from featureextraction_jl_ray.stages.scale import grouped_mad

    ev = f"{sf_dir}/events.parquet"
    want = duckdb.sql(
        f"SELECT user_id, median(value) AS median, mad(value) AS mad "
        f"FROM '{ev}' GROUP BY 1 ORDER BY 1").fetchdf()
    for nparts in (2, 11):
        ds = ray_session.data.read_parquet(ev).repartition(nparts)
        got = grouped_mad(ds, "user_id", "value", num_buckets=4
                          ).sort_values("user_id", ignore_index=True)
        np.testing.assert_allclose(got["median"], want["median"], rtol=1e-12)
        np.testing.assert_allclose(got["mad"], want["mad"], rtol=1e-12)

    import pandas as pd
    import ray as _ray

    tiny = pd.DataFrame({"k": [1, 2, 2], "v": [5.0, 1.0, 3.0]})
    got = grouped_mad(_ray.data.from_pandas(tiny), "k", "v", num_buckets=2
                      ).set_index("k").sort_index()
    assert got.loc[1, "mad"] == 0.0 and got.loc[1, "median"] == 5.0
    assert got.loc[2, "median"] == 2.0 and got.loc[2, "mad"] == 1.0

    with pytest.raises(ValueError, match="max_keys"):
        grouped_mad(ray_session.data.read_parquet(ev), "event_id", "value",
                    max_keys=10)


def test_grouped_quantile_bucket_exact_and_sketch(ray_session):
    """Per-key tercile assignment without key co-location: exact fit
    matches a manual per-key quantile reference; a full-size sketch
    equals exact; ties go to the UPPER bucket; labels/NaN contract."""
    import ray as _ray

    from featureextraction_jl_ray.stages.scale import grouped_quantile_bucket

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "i": np.arange(n),
        "v": np.round(rng.standard_normal(n), 3),
    })
    df.loc[5, "v"] = np.nan
    ds = _ray.data.from_pandas(df)
    out = grouped_quantile_bucket(
        ds, "k", "v", method="exact", out_col="b").to_pandas()
    out = out.sort_values("i", ignore_index=True)

    want = {}
    for k, g in df.groupby("k"):
        vals = g["v"].dropna()
        th = np.quantile(vals, [1 / 3, 2 / 3])
        for _, r in g.iterrows():
            want[r["i"]] = (None if np.isnan(r["v"])
                            else int((r["v"] >= th).sum()))
    got = {r["i"]: (None if pd.isna(r["b"]) else int(r["b"]))
           for _, r in out.iterrows()}
    assert got == want
    # top stratum is bucket 2 and all three occur
    assert set(x for x in got.values() if x is not None) == {0, 1, 2}

    # sketch with sketch_size >= n is the exact sample -> identical
    out_sk = grouped_quantile_bucket(
        ds, "k", "v", method="sketch", sketch_size=4096,
        out_col="b").to_pandas().sort_values("i", ignore_index=True)
    assert (out_sk["b"].fillna(-1) == out["b"].fillna(-1)).all()

    # labels variant
    out_lab = grouped_quantile_bucket(
        ds, "k", "v", method="exact", labels=("tail", "middle", "head"),
        out_col="b").to_pandas().sort_values("i", ignore_index=True)
    m = out["b"].notna()
    assert (out_lab.loc[m, "b"]
            == out.loc[m, "b"].map({0: "tail", 1: "middle", 2: "head"})).all()
    assert out_lab.loc[~m, "b"].isna().all()

    with pytest.raises(ValueError, match="labels"):
        grouped_quantile_bucket(ds, "k", "v", labels=("x",))


def test_grouped_robust_scale_planted(ray_session):
    """(x - median)/MAD per key; zero-MAD key emits null."""
    import ray as _ray

    from featureextraction_jl_ray.stages.scale import grouped_robust_scale

    df = pd.DataFrame({
        "i": range(7),
        "k": ["a", "a", "a", "a", "b", "b", "b"],
        "v": [1.0, 2.0, 3.0, 10.0, 5.0, 5.0, 5.0],  # b: constant -> MAD 0
    })
    out = grouped_robust_scale(_ray.data.from_pandas(df), "k", "v",
                               num_buckets=2).to_pandas()
    out = out.sort_values("i", ignore_index=True)
    # key a: median 2.5, |dev| = [1.5, .5, .5, 7.5] -> MAD = 1.0
    np.testing.assert_allclose(
        out.loc[:3, "v_rz"].to_numpy(), [-1.5, -0.5, 0.5, 7.5])
    assert out.loc[4:, "v_rz"].isna().all()


def test_yeo_johnson_apply_branches():
    from featureextraction_jl_ray.stages.scale import yeo_johnson_apply

    # NB: values within ~1e-9 of 0 are deliberately absent — the kernel
    # uses the SQL-parity forms ln(1+x) / (1+x)^λ−1 (NOT log1p/expm1),
    # which cost relative error ~|x|⁻¹·ulp near 0 by design: they must
    # match the ln/pow oracle SQL bit-for-bit, and the round grid
    # absorbs the absolute error (~1e-17).
    x = np.array([-3.0, -1.0, 0.0, 1.0, 5.0])
    # λ=1 is the exact identity on BOTH branches
    np.testing.assert_array_equal(yeo_johnson_apply(x, 1.0), x)
    # λ=0: log on the positive side, -((1-x)^2-1)/2 on the negative
    y0 = yeo_johnson_apply(x, 0.0)
    np.testing.assert_allclose(y0[x >= 0], np.log1p(x[x >= 0]), rtol=1e-12)
    np.testing.assert_allclose(
        y0[x < 0], -(((1 - x[x < 0]) ** 2) - 1) / 2, rtol=1e-12)
    # λ=2: -log on the negative side
    y2 = yeo_johnson_apply(x, 2.0)
    np.testing.assert_allclose(y2[x < 0], -np.log1p(-x[x < 0]), rtol=1e-12)
    # monotone in x for every grid λ
    for lam in np.linspace(-2, 2, 17):
        g = np.linspace(-50, 50, 2001)
        assert (np.diff(yeo_johnson_apply(g, float(lam))) > 0).all(), lam


def test_fit_yeo_johnson_recovers_lambda(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.scale import (
        fit_yeo_johnson, power_transform, yeo_johnson_apply,
    )

    rng = np.random.default_rng(71)
    grid = np.linspace(-2.0, 2.0, 17)
    # lognormal-ish positive data: best λ should land near 0 (log)
    x_log = np.exp(rng.normal(0.0, 1.0, 20000)) - 1.0 + 1e-9
    ds = rd.from_arrow(pa.table({"x": x_log}))
    m = fit_yeo_johnson(ds, "x", lambdas=grid)
    assert abs(m["lam"]) <= 0.25, m["lam"]
    # already-normal data: best λ near 1 (identity)
    x_norm = rng.normal(0.0, 1.0, 20000)
    m2 = fit_yeo_johnson(rd.from_arrow(pa.table({"x": x_norm})), "x",
                         lambdas=grid)
    assert abs(m2["lam"] - 1.0) <= 0.25, m2["lam"]
    # partial/merge invariance: many tiny blocks == one block, bit-equal LL
    ds_small = rd.from_arrow(pa.table({"x": x_log})).repartition(16)
    m3 = fit_yeo_johnson(ds_small, "x", lambdas=grid, batch_size=512)
    assert m3["lam"] == m["lam"]
    assert m3["n"] == m["n"] == 20000
    # apply matches the pure-numpy kernel and the fitted transform has
    # lower |skewness| than the input
    out = power_transform(ds, "x", m["lam"], out_col="y").to_pandas()
    np.testing.assert_array_equal(
        np.sort(out["y"].to_numpy()),
        np.sort(yeo_johnson_apply(x_log, m["lam"])))
    z = out["y"].to_numpy()
    skew = lambda v: abs(((v - v.mean()) ** 3).mean() / v.std() ** 3)  # noqa: E731
    assert skew(z) < 0.1 * skew(x_log)
