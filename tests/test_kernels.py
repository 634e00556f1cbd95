"""Kernel-oracle tests (SURVEY.md §5.2 №1) — allclose vs the NumPy oracle,
mirroring the reference's own test expectations (BASELINE.json:6:
"pca/whiten eigenvector and transformed-feature allclose")."""

from __future__ import annotations

import numpy as np
import pytest

from featureextraction_jl_ray.state.kernel import KernelCenterer
from featureextraction_jl_ray.state.moments import Moments
from featureextraction_jl_ray.state.pca import (
    PCAModel,
    canonicalize_signs,
    fit_pca_matrix,
)
from tests.oracle import (
    fixture_matrices,
    oracle_center_kernel,
    oracle_center_kernel_oos,
    oracle_pca,
)

FIX = fixture_matrices()


@pytest.mark.parametrize("name", ["X_tall", "X_deg"])
def test_pca_covariance_path_matches_oracle(name):
    X = FIX[name]
    o = oracle_pca(X)
    m = fit_pca_matrix(X)
    np.testing.assert_allclose(m.mean, o["mu"], atol=1e-12)
    np.testing.assert_allclose(m.eigvals, o["eigvals"], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(m.components, o["U"], rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(m.transform(X, "pca"), o["Z_pca"], atol=1e-8)
    np.testing.assert_allclose(m.transform(X, "pca_whiten"), o["Z_pcawhite"], atol=1e-7)
    np.testing.assert_allclose(m.transform(X, "zca"), o["Z_zca"], atol=1e-7)


def test_pca_dual_path_matches_primal():
    """n < p: Gram/dual fit must agree with the oracle's covariance eig on
    the nonzero spectrum (SURVEY.md §2-A K3)."""
    X = FIX["X_wide"]  # (5, 20)
    o = oracle_pca(X)
    m = fit_pca_matrix(X)  # auto-selects dual path
    r = len(m.eigvals)
    np.testing.assert_allclose(m.eigvals, o["eigvals"][:r], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        m.components, canonicalize_signs(o["U"][:, :r]), rtol=1e-7, atol=1e-7
    )
    np.testing.assert_allclose(m.transform(X, "pca"), o["Z_pca"][:, :r], atol=1e-7)


def test_whitened_covariance_is_identity():
    X = FIX["X_tall"]
    m = fit_pca_matrix(X)
    for mode in ("pca_whiten", "zca"):
        Z = m.transform(X, mode)
        np.testing.assert_allclose(np.cov(Z, rowvar=False), np.eye(Z.shape[1]), atol=1e-8)


def test_degenerate_rank_clamped():
    m = fit_pca_matrix(FIX["X_deg"])
    # zero-variance + duplicated column → rank ≤ 4
    assert len(m.eigvals) <= 4
    assert (m.eigvals > 0).all()


def test_energy_and_k_selection():
    X = FIX["X_tall"]
    m = fit_pca_matrix(X)
    assert len(fit_pca_matrix(X, k=2).eigvals) == 2
    me = fit_pca_matrix(X, energy=0.9)
    frac = np.cumsum(m.eigvals) / m.eigvals.sum()
    assert len(me.eigvals) == int(np.searchsorted(frac, 0.9) + 1)


def test_inverse_transform_roundtrip():
    X = FIX["X_tall"]
    m = fit_pca_matrix(X)  # full rank kept
    for mode in ("pca", "pca_whiten", "zca"):
        Z = m.transform(X, mode)
        np.testing.assert_allclose(m.inverse_transform(Z, mode), X, atol=1e-8)


def test_moments_merge_equals_full():
    """CGL pairwise merge associativity: chunked == whole (SURVEY.md §5.2 №2)."""
    rng = np.random.default_rng(7)
    X = rng.standard_normal((1000, 8)) * 5 + 3
    whole = Moments.of(X)
    # random chunking and merge order
    idx = np.sort(rng.choice(np.arange(1, 1000), size=9, replace=False))
    chunks = np.split(X, idx)
    order = rng.permutation(len(chunks))
    acc = Moments.zero(8)
    for i in order:
        acc = acc.merge(Moments.of(chunks[i]))
    assert acc.n == whole.n
    np.testing.assert_allclose(acc.mean, whole.mean, atol=1e-10)
    np.testing.assert_allclose(acc.cov(), whole.cov(), rtol=1e-9, atol=1e-10)


def test_moments_arrow_roundtrip():
    X = np.random.default_rng(1).standard_normal((50, 4))
    m = Moments.of(X)
    m2 = Moments.from_rows(m.to_row())
    np.testing.assert_allclose(m2.mean, m.mean)
    np.testing.assert_allclose(m2.m2, m.m2)


def test_kernel_centering_matches_oracle():
    K = FIX["K"]
    kc = KernelCenterer().fit(K)
    Kt = kc.transform(K)
    np.testing.assert_allclose(Kt, oracle_center_kernel(K), atol=1e-9)
    # centered kernel has ~zero row/col means (Schölkopf 1998 identity)
    np.testing.assert_allclose(Kt.mean(axis=0), 0, atol=1e-9)
    np.testing.assert_allclose(Kt.mean(axis=1), 0, atol=1e-9)


def test_kernel_centering_oos_matches_oracle():
    K, K_test = FIX["K"], FIX["K_test"]
    kc = KernelCenterer().fit(K)
    np.testing.assert_allclose(
        kc.transform_oos(K_test), oracle_center_kernel_oos(K_test, K), atol=1e-9
    )


def test_kernel_center_tile_matches_full():
    K = FIX["K"]
    kc = KernelCenterer().fit(K)
    full = kc.transform(K)
    n = K.shape[0]
    ri, ci = np.arange(0, 10), np.arange(10, n)
    tile = kc.center_tile(K[np.ix_(ri, ci)], ri, ci)
    np.testing.assert_allclose(tile, full[np.ix_(ri, ci)], atol=1e-12)


def test_model_save_load_roundtrip(tmp_path):
    m = fit_pca_matrix(FIX["X_tall"], k=3)
    m.save(tmp_path / "model.npz")
    m2 = PCAModel.load(tmp_path / "model.npz")
    np.testing.assert_allclose(m2.components, m.components)
    np.testing.assert_allclose(
        m2.transform(FIX["X_tall"], "zca"), m.transform(FIX["X_tall"], "zca")
    )
