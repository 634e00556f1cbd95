"""Similarity search over embedding columns (task brief: brute-force
cosine top-k baseline + an IVF/LSH-bucketed scale path) and
embedding-cosine near-duplicate detection.

Scale shape: queries are a small (q, p) matrix broadcast once via
``ray.put``; each batch computes one GEMM against it and keeps only its
local top-k per query, so the exchange is q·k rows per block; a final
tiny reduce merges local top-ks.  The IVF variant fits centroids on a
sample driver-side (deterministic k-means), assigns rows to cells in one
pass, and probes only ``nprobe`` cells per query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.hashing import stable_hash_array
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from ..functions.veccol import list_column_to_numpy

__all__ = ["knn_cosine", "knn_cosine_ivf", "embedding_near_dup_pairs", "kmeans_fit"]


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


class _BruteForceScore:
    def __init__(self, q_ref, vector_col: str, id_col: str, k: int):
        Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self._Q = _normalize(np.asarray(Q, dtype=np.float64))  # (q, p)
        self._vector_col = vector_col
        self._id_col = id_col
        self._k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = _normalize(list_column_to_numpy(batch, self._vector_col))
        ids = batch.column(self._id_col).to_numpy(zero_copy_only=False)
        S = X @ self._Q.T  # (n, q)
        k = min(self._k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(self._Q.shape[0]):
            s = S[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if k < len(s) else np.arange(len(s))
            out_q.append(np.full(len(top), qi, dtype=np.int64))
            out_id.append(ids[top])
            out_s.append(s[top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self._id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


def _merge_topk(partials, id_col: str, k: int) -> pd.DataFrame:
    def merge(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        out = (
            df.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
            .groupby("query_id", sort=False)
            .head(k)
        )
        return pandas_to_arrow(out)

    merged = partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
    return (
        merged.to_pandas()
        .sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def knn_cosine(ds, queries: np.ndarray, *, vector_col: str, id_col: str, k: int = 10,
               concurrency=(1, 8)) -> pd.DataFrame:
    """Exact cosine top-k: per-batch GEMM + local top-k → global merge.

    Returns a DataFrame (query_id, id, score) with k rows per query —
    small by construction, hence driver-side.
    """
    q_ref = ray.put(np.atleast_2d(queries))
    partials = ds.map_batches(
        _BruteForceScore,
        fn_constructor_args=(q_ref, vector_col, id_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
    return _merge_topk(partials, id_col, k)


def kmeans_fit(X: np.ndarray, n_clusters: int, *, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on an in-memory sample (driver-side)."""
    rng = np.random.default_rng(seed)
    X = _normalize(np.asarray(X, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def knn_cosine_ivf(
    ds,
    queries: np.ndarray,
    *,
    vector_col: str,
    id_col: str,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2000,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF-style approximate top-k: centroids from a driver-side sample,
    batches drop rows outside the probed cells, then exact scoring.

    At scale the assignment pass would be persisted/partitioned by cell;
    here cells are filtered per batch (documented approximation)."""
    sample = ds.limit(sample_rows).to_pandas()
    Xs = np.stack(sample[vector_col].to_numpy())
    C = kmeans_fit(Xs, n_clusters, seed=seed)
    Q = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_cells = np.unique(
        np.argsort(-(Q @ C.T), axis=1)[:, :nprobe].reshape(-1)
    )
    c_ref = ray.put(C)
    cells_ref = ray.put(probe_cells)
    q_ref = ray.put(Q)

    class Scorer(_BruteForceScore):
        def __init__(self):
            super().__init__(q_ref, vector_col, id_col, k)
            self._C = ray.get(c_ref)
            self._cells = set(int(c) for c in ray.get(cells_ref))

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = _normalize(list_column_to_numpy(batch, vector_col))
            cell = (X @ self._C.T).argmax(axis=1)
            mask = np.isin(cell, list(self._cells))
            if not mask.any():
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        id_col: pa.array([], type=batch.schema.field(id_col).type),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            return super().__call__(batch.filter(pa.array(mask)))

    partials = ds.map_batches(
        Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    )
    return _merge_topk(partials, id_col, k)


def embedding_near_dup_pairs(
    ds,
    *,
    vector_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    num_buckets: int = 128,
):
    """Embedding-cosine near-dup via random-hyperplane LSH: sign-sketch
    rows into buckets, verify exact cosine within each bucket.

    Recall note: a single sketch table misses pairs split by a plane;
    production would use multiple tables — here one table + a generous
    ``n_planes`` documents the pattern (candidate precision is exact)."""
    from ..functions.hashing import bucket_of

    # planes derived deterministically once the dimensionality is known
    first = ds.limit(1).to_pandas()
    p = len(first[vector_col].iloc[0])
    planes = np.random.default_rng(seed).standard_normal((p, n_planes))
    pl_ref = ray.put(planes)

    def sketch(batch: pa.Table) -> pa.Table:
        P = ray.get(pl_ref)
        X = _normalize(list_column_to_numpy(batch, vector_col))
        bits = (X @ P) > 0
        sig = (bits.astype(np.uint64) * (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {
                "sig": pa.array(sig.astype(np.int64)),
                id_col: batch.column(id_col),
                vector_col: batch.column(vector_col),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column("sig").to_numpy(zero_copy_only=False), num_buckets, seed=37)
        return batch.append_column("__fx_sbucket", pa.array(b))

    def verify(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        out_a, out_b, out_s = [], [], []
        for _, g in df.groupby("sig", sort=False):
            if len(g) < 2:
                continue
            X = _normalize(np.stack(g[vector_col].to_numpy()).astype(np.float64))
            ids = g[id_col].to_numpy()
            S = X @ X.T
            ia, ib = np.triu_indices(len(g), k=1)
            ok = S[ia, ib] >= threshold
            if ok.any():
                a, b = ids[ia[ok]], ids[ib[ok]]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(S[ia[ok], ib[ok]])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "cosine": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    return (
        ds.select_columns([vector_col, id_col])
        .map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__fx_sbucket")
        .map_groups(verify, batch_format="pyarrow")
    )
