"""Distributed first/second-moment accumulation — the "streaming PCA via
distributed Gram/covariance accumulation" kernel (BASELINE.json:6;
SURVEY.md §2-A K1/K2, §2-B A1).

The reference (FeatureExtraction.jl — mirror empty at survey time, see
SURVEY.md §0) computes a dense covariance in one BLAS call; here the same
quantity is an associative aggregation over Arrow blocks:

    per block:  (n_b, mean_b, M2_b = Xcᵀ·Xc centered at mean_b)
    merge:      Chan–Golub–LeVeque pairwise update (numerically stable):
                delta = mean_b − mean_a
                M2    = M2_a + M2_b + outer(delta, delta)·n_a·n_b/(n_a+n_b)

so the whole fit is one streaming ``map_batches`` pass plus a tree merge
of tiny (p + p²)-sized partials — no shuffle of the data itself, which is
what makes it hold at 100 TB ("groupby-aggregate tree-reduce for the
global eigendecomposition", BASELINE.json:6).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.veccol import list_column_to_numpy

__all__ = ["Moments", "fit_moments", "moments_of_matrix"]


@dataclass
class Moments:
    """Sufficient statistics for mean / covariance / scatter of (n, p) data."""

    n: int
    mean: np.ndarray  # (p,) float64
    m2: np.ndarray  # (p, p) float64 — centered scatter  Σ (x−μ)(x−μ)ᵀ

    @staticmethod
    def zero(p: int) -> "Moments":
        return Moments(0, np.zeros(p), np.zeros((p, p)))

    @staticmethod
    def of(X: np.ndarray) -> "Moments":
        """Moments of one in-memory batch (float64 accumulation)."""
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        if n == 0:
            return Moments.zero(X.shape[1] if X.ndim == 2 else 0)
        mean = X.mean(axis=0)
        Xc = X - mean
        m2 = Xc.T @ Xc
        return Moments(n, mean, m2)

    def merge(self, other: "Moments") -> "Moments":
        """Pairwise CGL merge — associative & commutative up to fp error."""
        if self.n == 0:
            return other
        if other.n == 0:
            return self
        n = self.n + other.n
        delta = other.mean - self.mean
        mean = self.mean + delta * (other.n / n)
        m2 = self.m2 + other.m2 + np.outer(delta, delta) * (self.n * other.n / n)
        return Moments(n, mean, m2)

    # ---- derived quantities -------------------------------------------------
    @property
    def p(self) -> int:
        return self.mean.shape[0]

    def cov(self, ddof: int = 1) -> np.ndarray:
        """Sample covariance (divisor n−ddof; default n−1, SURVEY.md §2-A K2)."""
        if self.n <= ddof:
            raise ValueError(f"need n > {ddof} observations, have {self.n}")
        return self.m2 / (self.n - ddof)

    def scatter(self) -> np.ndarray:
        return self.m2

    # ---- Arrow (de)serialization for the tree merge -------------------------
    def to_row(self) -> pa.Table:
        return pa.table(
            {
                "n": pa.array([self.n], type=pa.int64()),
                "mean": pa.array([self.mean.tolist()], type=pa.list_(pa.float64())),
                "m2": pa.array(
                    [self.m2.reshape(-1).tolist()], type=pa.list_(pa.float64())
                ),
            }
        )

    @staticmethod
    def from_rows(table: pa.Table) -> "Moments":
        """Merge every partial row in an Arrow table into one Moments."""
        ns = table.column("n").to_numpy(zero_copy_only=False)
        means = list_column_to_numpy(table, "mean")
        m2s = list_column_to_numpy(table, "m2")
        p = means.shape[1]
        acc = Moments.zero(p)
        for i in range(len(ns)):
            acc = acc.merge(Moments(int(ns[i]), means[i], m2s[i].reshape(p, p)))
        return acc


def moments_of_matrix(X: np.ndarray) -> Moments:
    return Moments.of(X)


def _partials_stage(vector_col: str):
    """map_batches fn: Arrow block of list<float> vectors → one partial row."""

    def fn(batch: pa.Table) -> pa.Table:
        X = list_column_to_numpy(batch, vector_col)
        return Moments.of(X).to_row()

    return fn


def _merge_stage(batch: pa.Table) -> pa.Table:
    return Moments.from_rows(batch).to_row()


def fit_moments(
    ds,
    vector_col: str,
    *,
    fan_in: int = 64,
    batch_size: int | None = None,
) -> Moments:
    """One streaming pass over ``ds[vector_col]`` → global :class:`Moments`.

    Scale shape: the input dataset streams through a stateless
    ``map_batches`` (one (p+p²)-float partial per block), then a second
    ``map_batches`` with ``batch_size=fan_in`` coalesces every ``fan_in``
    partial rows into one merged row (Ray bundles rows across blocks to
    fill a batch, so this is the tree fan-in WITHOUT a repartition
    exchange — an earlier ``repartition(fan_in)`` version also emitted
    empty-schema blocks when partials < fan_in), and the driver merges
    the ≤ num_partials/fan_in remaining rows.  One streaming execution
    end-to-end; nothing but the tiny partials is ever shuffled or
    materialized.
    """
    partials = ds.select_columns([vector_col]).map_batches(
        _partials_stage(vector_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
    merged = partials.map_batches(
        _merge_stage, batch_format="pyarrow", batch_size=fan_in
    )
    final = pa.concat_tables(
        [b for b in merged.iter_batches(batch_size=None, batch_format="pyarrow")]
    )
    return Moments.from_rows(final)
