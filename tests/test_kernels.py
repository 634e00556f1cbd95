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


def _numpy_kpca(X: np.ndarray, k: int, kernel: str = "linear",
                gamma: float | None = None):
    """Direct KPCA oracle: dense kernel → center → eigh → α/sqrt(λ) with
    the engine's sign canonicalization."""
    if kernel == "linear":
        K = X @ X.T
    else:
        sq = np.einsum("ij,ij->i", X, X)
        K = np.exp(-gamma * (sq[:, None] + sq[None, :] - 2.0 * X @ X.T))
    n = len(X)
    r = K.mean(axis=1)
    Kc = K - r[:, None] - r[None, :] + K.mean()
    w, V = np.linalg.eigh(Kc)
    order = np.argsort(w)[::-1]
    w, V = w[order][:k], V[:, order][:, :k]
    alphas = V / np.sqrt(w)[None, :]
    flip = np.sign(alphas[np.abs(alphas).argmax(axis=0), np.arange(k)])
    return w, alphas * flip[None, :], r, K.mean()


@pytest.mark.parametrize("kernel", ["linear", "rbf"])
def test_kpca_tiles_match_numpy_oracle(ray_session, sf_dir, kernel):
    """Distributed tile KPCA (hash-sample → tiles → row sums → centered
    tiles → eigh) vs direct dense NumPy KPCA on the same sample, plus the
    out-of-sample actor transform vs the direct projection formula."""
    import pandas as pd

    from featureextraction_jl_ray.state.kpca import apply_kpca_transform, fit_kpca

    ds = ray_session.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    gamma = 1.0 / 32 if kernel == "rbf" else None
    model = fit_kpca(ds, "embedding", id_col="vec_id", k=5, kernel=kernel,
                     gamma=gamma, sample_rows=300, block_rows=64)
    X = model.train_X
    w, alphas, r, g = _numpy_kpca(X, 5, kernel, gamma)
    np.testing.assert_allclose(model.eigvals, w, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(model.centerer.row_means_, r, rtol=1e-10)
    np.testing.assert_allclose(model.centerer.grand_mean_, g, rtol=1e-10)
    np.testing.assert_allclose(model.alphas, alphas, rtol=1e-6, atol=1e-8)

    out = apply_kpca_transform(ds, model, "embedding").to_pandas()
    out = out.sort_values("vec_id", ignore_index=True)
    full = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id", ignore_index=True)
    Xall = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    if kernel == "linear":
        Kx = Xall @ X.T
    else:
        sa = np.einsum("ij,ij->i", Xall, Xall)
        sb = np.einsum("ij,ij->i", X, X)
        Kx = np.exp(-gamma * (sa[:, None] + sb[None, :] - 2.0 * Xall @ X.T))
    t = Kx.mean(axis=1)
    Z = (Kx - t[:, None] - r[None, :] + g) @ alphas
    got = np.stack(out["z_kpca"].to_numpy())
    np.testing.assert_allclose(got, Z, rtol=1e-6, atol=1e-8)
