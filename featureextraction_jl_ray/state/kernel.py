"""Kernel (Gram-matrix) centering — SURVEY.md §2-A K9/K10.

Schölkopf, Smola & Müller 1998 ("Nonlinear Component Analysis as a Kernel
Eigenvalue Problem"): for a training Gram matrix K (n×n),

    K̃ = K − 1ₙK − K1ₙ + 1ₙK1ₙ,   1ₙ = (1/n)·𝟙𝟙ᵀ

which elementwise is  K̃ᵢⱼ = Kᵢⱼ − rᵢ − rⱼ + g  with row means
r = K𝟙/n and grand mean g = 𝟙ᵀK𝟙/n².  Out-of-sample centering of a test
kernel K* (m×n, rows = test points):

    K̃*ᵢⱼ = K*ᵢⱼ − t*ᵢ − rⱼ + g,   t* = K*𝟙/n  (test-row means).

Only (r, g) are state — tiny and broadcastable — so at engine scale the
centering of a block-partitioned K is a stateless per-tile ``map_batches``
(``center_tile``); the full matrix is never materialized in one place.

Reference mirror empty at survey time (SURVEY.md §0); presence of kernel
centering in the reference is driver-attested (BASELINE.json:6).
"""

from __future__ import annotations

import numpy as np

__all__ = ["KernelCenterer"]


class KernelCenterer:
    """fit on training Gram K → (row_means, grand_mean); transform K / K*."""

    def __init__(self) -> None:
        self.row_means_: np.ndarray | None = None  # r, (n,)
        self.grand_mean_: float | None = None  # g

    def fit(self, K: np.ndarray) -> "KernelCenterer":
        K = np.asarray(K, dtype=np.float64)
        if K.ndim != 2 or K.shape[0] != K.shape[1]:
            raise ValueError(f"training kernel must be square, got {K.shape}")
        self.row_means_ = K.mean(axis=1)
        self.grand_mean_ = float(K.mean())
        return self

    @staticmethod
    def from_partials(row_sums: np.ndarray, n: int) -> "KernelCenterer":
        """Build state from distributed per-tile row sums (Σⱼ Kᵢⱼ over all
        column tiles), the mergeable form used by the engine path."""
        kc = KernelCenterer()
        kc.row_means_ = np.asarray(row_sums, dtype=np.float64) / n
        kc.grand_mean_ = float(kc.row_means_.mean())
        return kc

    def _check(self):
        if self.row_means_ is None:
            raise RuntimeError("KernelCenterer is not fitted")

    def transform(self, K: np.ndarray) -> np.ndarray:
        """Center the training kernel itself (rows and cols both training)."""
        self._check()
        K = np.asarray(K, dtype=np.float64)
        r = self.row_means_
        return K - r[:, None] - r[None, :] + self.grand_mean_

    def transform_oos(self, K_test: np.ndarray) -> np.ndarray:
        """Center an out-of-sample kernel K* (m test rows × n train cols)."""
        self._check()
        K_test = np.asarray(K_test, dtype=np.float64)
        if K_test.shape[1] != self.row_means_.shape[0]:
            raise ValueError(
                f"K_test has {K_test.shape[1]} cols, expected {self.row_means_.shape[0]}"
            )
        t = K_test.mean(axis=1)
        return K_test - t[:, None] - self.row_means_[None, :] + self.grand_mean_

    def center_tile(
        self, tile: np.ndarray, row_idx: np.ndarray, col_idx: np.ndarray
    ) -> np.ndarray:
        """Center one (i, j) tile of a block-partitioned training kernel —
        the per-tile map_batches kernel for engine-scale K (needs only the
        broadcast r, g)."""
        self._check()
        r = self.row_means_
        return tile - r[row_idx][:, None] - r[col_idx][None, :] + self.grand_mean_
