"""NumPy oracle for the statistical kernels (FIXTURES.md §A4).

Implements the published formulas the reference implements (SURVEY.md
§2-A): PCA via eigh of the n−1-divisor covariance, PCA-whitening
W = Λ^{−1/2}Uᵀ and ZCA W = UΛ^{−1/2}Uᵀ (Kessy et al. 2018), kernel
centering K̃ = K − 1ₙK − K1ₙ + 1ₙK1ₙ (Schölkopf et al. 1998).
Never hand-edited; regenerated on demand.
"""

from __future__ import annotations

import numpy as np


def canon(U: np.ndarray) -> np.ndarray:
    idx = np.abs(U).argmax(axis=0)
    s = np.sign(U[idx, np.arange(U.shape[1])])
    s[s == 0] = 1.0
    return U * s


def oracle_pca(X: np.ndarray, tol: float = 1e-12):
    """Return dict with mu, cov, eigvals (desc, clamped), U (canonical),
    Z_pca, Z_pcawhite, Z_zca."""
    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    mu = X.mean(axis=0)
    Xc = X - mu
    cov = Xc.T @ Xc / (n - 1)
    lam, U = np.linalg.eigh(cov)
    order = np.argsort(lam)[::-1]
    lam, U = lam[order], U[:, order]
    keep = lam > tol * max(lam[0], 0.0)
    lam, U = lam[keep], canon(U[:, keep])
    Z_pca = Xc @ U
    Z_pcw = Xc @ (U / np.sqrt(lam))
    Z_zca = Xc @ ((U / np.sqrt(lam)) @ U.T)
    return {
        "mu": mu,
        "cov": cov,
        "eigvals": lam,
        "U": U,
        "Z_pca": Z_pca,
        "Z_pcawhite": Z_pcw,
        "Z_zca": Z_zca,
    }


def oracle_center_kernel(K: np.ndarray):
    K = np.asarray(K, dtype=np.float64)
    n = K.shape[0]
    one = np.full((n, n), 1.0 / n)
    return K - one @ K - K @ one + one @ K @ one


def oracle_center_kernel_oos(K_test: np.ndarray, K_train: np.ndarray):
    K_test = np.asarray(K_test, dtype=np.float64)
    n = K_train.shape[0]
    m = K_test.shape[0]
    one_n = np.full((n, n), 1.0 / n)
    one_mn = np.full((m, n), 1.0 / n)
    return K_test - one_mn @ K_train - K_test @ one_n + one_mn @ K_train @ one_n


def fixture_matrices(seed: int = 42):
    rng = np.random.default_rng(seed)
    X_tall = rng.standard_normal((20, 5))
    X_wide = rng.standard_normal((5, 20))
    X_deg = rng.standard_normal((30, 6))
    X_deg[:, 2] = 0.0  # zero-variance column
    X_deg[:, 4] = X_deg[:, 1]  # duplicated column → rank deficiency
    K = X_tall @ X_tall.T
    X_test = rng.standard_normal((7, 5))
    K_test = X_test @ X_tall.T
    return {"X_tall": X_tall, "X_wide": X_wide, "X_deg": X_deg, "K": K, "K_test": K_test}
