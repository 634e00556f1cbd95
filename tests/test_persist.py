"""Model persistence round-trips: the loaded state transforms
BIT-IDENTICALLY to the fitted one (the train/serve contract)."""

from __future__ import annotations

import numpy as np

from featureextraction_jl_ray.state.persist import load_model, save_model


def test_pca_roundtrip(tmp_path, ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.state.pca import fit_pca

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = fit_pca(ds, "embedding", k=6)
    p = save_model(m, str(tmp_path / "pca"))
    m2 = load_model(p)
    X = np.random.default_rng(0).normal(size=(40, len(m.mean)))
    np.testing.assert_array_equal(m.transform(X, mode="pca_whiten"),
                                  m2.transform(X, mode="pca_whiten"))
    np.testing.assert_array_equal(m.transform(X, mode="zca"),
                                  m2.transform(X, mode="zca"))
    assert m2.n == m.n


def test_moments_and_quantizer_roundtrip(tmp_path):
    from featureextraction_jl_ray.stages.similarity import ScalarQuantizer
    from featureextraction_jl_ray.state.moments import Moments

    X = np.random.default_rng(1).normal(size=(100, 5))
    mo = Moments.of(X)
    mo2 = load_model(save_model(mo, str(tmp_path / "mo")))
    np.testing.assert_array_equal(mo.mean, mo2.mean)
    np.testing.assert_array_equal(mo.m2, mo2.m2)
    assert mo.n == mo2.n

    qz = ScalarQuantizer(np.abs(X).max(axis=0) / 127.0)
    qz2 = load_model(save_model(qz, str(tmp_path / "qz")))
    np.testing.assert_array_equal(qz.quantize(X), qz2.quantize(X))


def test_mapping_roundtrip(tmp_path):
    te = {"click": 1.25, "view": -0.5, "purchase": 3.75}
    te2 = load_model(save_model(te, str(tmp_path / "te")))
    assert te2 == te
    bounds = {"value": (0.0, 99.5), "qty": (1.0, 50.0)}
    b2 = load_model(save_model(bounds, str(tmp_path / "bounds")))
    assert b2 == bounds


def test_incremental_refit_via_persisted_moments(tmp_path, ray_session):
    """The daily-refit ops story: moments fitted on partition 1,
    persisted, merged with partition 2's moments later — the resulting
    PCA matches a scratch fit on the union (allclose; merge order differs
    from the tree merge so not bit-exact)."""
    import ray.data as rd

    from featureextraction_jl_ray.state.moments import fit_moments
    from featureextraction_jl_ray.state.pca import PCAModel

    full = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    p1 = full.filter(expr="vec_id < 50")
    p2 = full.filter(expr="vec_id >= 50")
    m1 = fit_moments(p1, "embedding")
    m1 = load_model(save_model(m1, str(tmp_path / "day1")))  # persisted between runs
    m2 = fit_moments(p2, "embedding")
    merged = m1.merge(m2)
    scratch = fit_moments(full, "embedding")
    assert merged.n == scratch.n
    np.testing.assert_allclose(merged.mean, scratch.mean, rtol=1e-12)
    np.testing.assert_allclose(merged.m2, scratch.m2, rtol=1e-9)
    pa_inc = PCAModel.from_moments(merged)
    pa_full = PCAModel.from_moments(scratch)
    np.testing.assert_allclose(pa_inc.eigvals, pa_full.eigvals, rtol=1e-9)
    X = np.random.default_rng(3).normal(size=(20, len(merged.mean)))
    np.testing.assert_allclose(pa_inc.transform(X), pa_full.transform(X),
                               rtol=1e-7, atol=1e-10)
