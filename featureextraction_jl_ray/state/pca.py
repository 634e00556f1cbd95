"""PCA / whitening models — the reference's statistical core re-expressed
for distributed fitting (SURVEY.md §2-A K2–K8, K11).

Semantics (rows = observations; covariance divisor n−1):

- fit:        Σ = cov(X);  Λ, U = eigh(Σ) sorted descending; eigenvalues
              below ``tol · λmax`` are clamped out (rank-deficiency path).
- pca:        Z = (X − μ) U_k
- pca_whiten: Z = (X − μ) U_k Λ_k^{−1/2}        (Kessy, Lewin & Strimmer
              2018, "Optimal Whitening and Decorrelation": W = Λ^{−1/2}Uᵀ)
- zca:        Z = (X − μ) U Λ^{−1/2} Uᵀ          (the unique symmetric
              whitener, same paper)
- inverse:    X̂ = Z U_kᵀ + μ  (reconstruction; for whiten modes the
              Λ^{1/2} rescale is folded in)

Eigenvectors are sign-ambiguous; ``canonicalize_signs`` pins each column
so its max-|loading| entry is positive — tests compare after this, exactly
as the reference's own ``≈`` tests must (SURVEY.md §2-A numerical
contract).  The dual/Gram path (K3) fits via eig of the n×n Gram matrix
when n < p and recovers U = Xcᵀ V Λ_G^{−1/2}.

Reference mirror was empty at survey time (SURVEY.md §0); semantics are
pinned to the driver metadata (BASELINE.json:6 — "pca/whiten eigenvector
and transformed-feature allclose") and the published formulas above.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .moments import Moments, fit_moments

__all__ = ["PCAModel", "fit_pca", "fit_pca_matrix", "canonicalize_signs"]

MODES = ("pca", "pca_whiten", "zca")


def canonicalize_signs(U: np.ndarray) -> np.ndarray:
    """Flip eigenvector columns so the max-|component| entry is positive."""
    idx = np.abs(U).argmax(axis=0)
    signs = np.sign(U[idx, np.arange(U.shape[1])])
    signs[signs == 0] = 1.0
    return U * signs


@dataclass
class PCAModel:
    """Fitted PCA/whitening state: tiny NumPy arrays, broadcast via ray.put."""

    mean: np.ndarray  # (p,)
    eigvals: np.ndarray  # (r,) descending, clamped positive
    components: np.ndarray  # (p, r) eigenvector columns (canonical signs)
    n: int = 0
    tol: float = 1e-12
    _w_cache: dict = field(default_factory=dict, repr=False)

    # ---- fitting ------------------------------------------------------------
    @staticmethod
    def from_moments(m: Moments, *, tol: float = 1e-12, ddof: int = 1) -> "PCAModel":
        cov = m.cov(ddof=ddof)
        lam, U = np.linalg.eigh(cov)
        order = np.argsort(lam)[::-1]
        lam, U = lam[order], U[:, order]
        keep = lam > tol * max(lam[0], 0.0)
        lam, U = lam[keep], U[:, keep]
        return PCAModel(
            mean=m.mean, eigvals=lam, components=canonicalize_signs(U), n=m.n, tol=tol
        )

    @staticmethod
    def from_matrix_dual(X: np.ndarray, *, tol: float = 1e-12) -> "PCAModel":
        """Gram/dual fit for n < p (SURVEY.md §2-A K3): eig of Xc·Xcᵀ."""
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        mean = X.mean(axis=0)
        Xc = X - mean
        G = Xc @ Xc.T
        lamG, V = np.linalg.eigh(G)
        order = np.argsort(lamG)[::-1]
        lamG, V = lamG[order], V[:, order]
        keep = lamG > max(tol * max(lamG[0], 0.0), 1e-30)
        lamG, V = lamG[keep], V[:, keep]
        U = Xc.T @ V / np.sqrt(lamG)  # (p, r) orthonormal
        lam = lamG / (n - 1)
        return PCAModel(
            mean=mean, eigvals=lam, components=canonicalize_signs(U), n=n, tol=tol
        )

    # ---- component selection (K5) -------------------------------------------
    def select(self, k: int | None = None, energy: float | None = None) -> "PCAModel":
        r = len(self.eigvals)
        if energy is not None:
            frac = np.cumsum(self.eigvals) / self.eigvals.sum()
            r = int(np.searchsorted(frac, energy) + 1)
        if k is not None:
            r = min(r, k)
        return PCAModel(
            mean=self.mean,
            eigvals=self.eigvals[:r],
            components=self.components[:, :r],
            n=self.n,
            tol=self.tol,
        )

    # ---- transforms (K6–K8, K11) --------------------------------------------
    def weights(self, mode: str = "pca") -> np.ndarray:
        """(p, k) matrix W with Z = (X − μ) · W, precomposed once per model."""
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        if mode not in self._w_cache:
            U, lam = self.components, self.eigvals
            if mode == "pca":
                W = U
            elif mode == "pca_whiten":
                W = U / np.sqrt(lam)
            else:  # zca
                W = (U / np.sqrt(lam)) @ U.T
            self._w_cache[mode] = W
        return self._w_cache[mode]

    def transform(self, X: np.ndarray, mode: str = "pca") -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        return (X - self.mean) @ self.weights(mode)

    def inverse_transform(self, Z: np.ndarray, mode: str = "pca") -> np.ndarray:
        Z = np.asarray(Z, dtype=np.float64)
        U, lam = self.components, self.eigvals
        if mode == "pca":
            B = U.T
        elif mode == "pca_whiten":
            B = (U * np.sqrt(lam)).T
        else:  # zca: W is symmetric p×p with inverse U Λ^{1/2} Uᵀ
            B = (U * np.sqrt(lam)) @ U.T
        return Z @ B + self.mean

    # ---- persistence (model artifact, SURVEY.md §1.2) -----------------------
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(
            path,
            mean=self.mean,
            eigvals=self.eigvals,
            components=self.components,
            n=np.int64(self.n),
            tol=np.float64(self.tol),
        )
        path.with_suffix(".json").write_text(
            json.dumps(
                {"p": int(self.mean.shape[0]), "k": int(len(self.eigvals)), "n": self.n}
            )
        )

    @staticmethod
    def load(path: str | Path) -> "PCAModel":
        z = np.load(Path(path))
        return PCAModel(
            mean=z["mean"],
            eigvals=z["eigvals"],
            components=z["components"],
            n=int(z["n"]),
            tol=float(z["tol"]),
        )


def fit_pca(
    ds,
    vector_col: str,
    *,
    k: int | None = None,
    energy: float | None = None,
    tol: float = 1e-12,
    ddof: int = 1,
) -> PCAModel:
    """Distributed PCA fit: streaming moments pass + driver-side p×p eigh.

    The accumulation is distributed (map_batches + tree merge,
    state/moments.py); the O(p³) eigendecomposition runs once on the
    driver — cheap for the p ≤ few·10³ feature widths this engine targets
    (SURVEY.md §4 "placement of eigh").
    """
    m = fit_moments(ds, vector_col)
    model = PCAModel.from_moments(m, tol=tol, ddof=ddof)
    return model.select(k=k, energy=energy)


def fit_pca_matrix(
    X: np.ndarray,
    *,
    k: int | None = None,
    energy: float | None = None,
    tol: float = 1e-12,
) -> PCAModel:
    """In-memory fit mirroring the reference's call shape; auto-selects the
    covariance (n ≥ p) vs Gram/dual (n < p) path (SURVEY.md §2-A K2/K3)."""
    X = np.asarray(X, dtype=np.float64)
    n, p = X.shape
    if n >= p:
        model = PCAModel.from_moments(Moments.of(X), tol=tol)
    else:
        model = PCAModel.from_matrix_dual(X, tol=tol)
    return model.select(k=k, energy=energy)
