"""Whitening/PCA transformer stage — the canonical stateful actor-pool
stage (SURVEY.md §2-B ST1; BASELINE.json:15 "actor pools for stateful
stages").

The fitted :class:`~..state.pca.PCAModel` is broadcast ONCE via
``ray.put`` on the driver; each actor resolves the ObjectRef in
``__init__`` (once per actor, not per batch) and precomposes the (p, k)
weight matrix, so ``__call__`` is a single GEMM per Arrow batch —
zero-copy list-column → NumPy → fixed_size_list out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.veccol import list_column_to_numpy, numpy_to_fixed_list_column
from ..state.pca import PCAModel

__all__ = ["WhitenTransform", "apply_pca_transform", "grouped_pca_transform"]


class WhitenTransform:
    """Callable-class stage: batch[vector_col] → batch + out_col = (X−μ)·W."""

    def __init__(
        self,
        model_ref,  # ray.ObjectRef of a PCAModel (or a PCAModel, for tests)
        vector_col: str,
        out_col: str = "z",
        mode: str = "pca_whiten",
        out_dtype=pa.float32(),
        drop_input: bool = False,
    ):
        model = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        self._mu = model.mean.astype(np.float64)
        self._W = np.ascontiguousarray(model.weights(mode))  # precomposed once
        self._vector_col = vector_col
        self._out_col = out_col
        self._out_dtype = out_dtype
        self._drop_input = drop_input

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = list_column_to_numpy(batch, self._vector_col)
        Z = (X - self._mu) @ self._W
        out = batch.append_column(
            self._out_col, numpy_to_fixed_list_column(Z, self._out_dtype)
        )
        if self._drop_input:
            out = out.drop_columns([self._vector_col])
        return out


def apply_pca_transform(
    ds,
    model: PCAModel,
    vector_col: str,
    *,
    out_col: str = "z",
    mode: str = "pca_whiten",
    concurrency=None,
    batch_size: int | None = 4096,
    num_cpus: float = 1,
    drop_input: bool = False,
):
    """ds + fitted model → ds with transformed feature column.

    ``concurrency=None`` (default path for small models) = STATELESS
    tasks carrying a prebuilt transformer: the precomposed (μ, W) is a
    few tens of KB, so shipping it in the task closure (deserialized once
    per worker, cached) costs nothing, removes actor-pool spin-up
    latency, lifts the pool-size cap so the stage scales with the
    cluster, and lets Ray fuse it with the upstream decode into one
    task-pool stage.  Pass a concurrency int/tuple to force an actor
    pool (right when the model is large enough that per-worker
    deserialization matters)."""
    # Precompose W on the driver: validates `mode` eagerly (an actor-pool
    # __init__ failure would otherwise surface late as ActorDiedError) and
    # ships the cached weight matrix with the broadcast model.
    model.weights(mode)
    if concurrency is None:
        fn = WhitenTransform(model, vector_col, out_col, mode,
                             drop_input=drop_input)
        return ds.map_batches(
            fn,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    model_ref = ray.put(model)
    return ds.map_batches(
        WhitenTransform,
        fn_constructor_args=(model_ref, vector_col, out_col, mode),
        fn_constructor_kwargs={"drop_input": drop_input},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def grouped_pca_transform(
    ds,
    key_cols,
    vector_col: str,
    *,
    k: int,
    mode: str = "pca_whiten",
    out_col: str = "z",
    id_cols=None,
    num_buckets: int = 64,
    max_group_rows: int = 2_000_000,
    tol: float = 1e-12,
    seed: int = 0,
):
    """PER-GROUP PCA/whitening — the north-star kernels composed
    per-entity: every key (source / domain / user) fits its OWN
    :class:`~..state.pca.PCAModel` and transforms its vectors in that
    basis ("normalize each domain in its own subspace"), instead of one
    global basis for the whole corpus.

    Scale shape: ONE blob-packed exchange co-locates each group
    (`bucketed_map_groups`); fit → eigh → GEMM all run inside the bucket
    task, so per-group model state never leaves the task and nothing
    accumulates on the driver.  Bounded-group contract (like the other
    per-key operators): a group must fit in a task — a LOUD
    ``max_group_rows`` guard trips otherwise; unbounded groups want the
    global `fit_pca` + broadcast `apply_pca_transform` instead.

    ``k`` is explicit and the output width is exactly ``k`` for every
    group: a rank-deficient group (fewer rows than ``k``, or collapsed
    variance) zero-pads its trailing dimensions, keeping the output
    column fixed-width for downstream GEMMs.
    """
    from ..functions.veccol import list_column_to_numpy
    from ..state.pca import fit_pca_matrix
    from .partition import bucketed_map_groups

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    carry = list(id_cols) if id_cols is not None else [
        c for c in ds.schema().names if c != vector_col]

    def per_bucket(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return tbl.select(carry).append_column(
                out_col, numpy_to_fixed_list_column(
                    np.empty((0, k)), pa.float32()))
        X = list_column_to_numpy(tbl, vector_col)
        Z = np.zeros((n, k), dtype=np.float64)
        keys = [tbl.column(c).to_numpy(zero_copy_only=False)
                for c in key_cols]
        if len(keys) == 1:
            uniq, codes = np.unique(keys[0], return_inverse=True)
            n_groups = len(uniq)
        else:
            import pandas as pd
            codes, _ = pd.factorize(pd.MultiIndex.from_arrays(keys))
            n_groups = int(codes.max()) + 1
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(n_groups + 1))
        for gi in range(n_groups):
            idx = order[bounds[gi]:bounds[gi + 1]]
            if len(idx) > max_group_rows:
                raise RuntimeError(
                    f"grouped_pca_transform: a group has {len(idx)} rows > "
                    f"max_group_rows={max_group_rows}; per-group fits are "
                    f"task-local — use the global fit_pca + "
                    f"apply_pca_transform for unbounded groups.")
            Xg = X[idx]
            model = fit_pca_matrix(Xg, k=min(k, Xg.shape[0], Xg.shape[1]),
                                   tol=tol)
            Zg = model.transform(Xg, mode=mode)
            Z[idx, :Zg.shape[1]] = Zg  # rank-deficient: trailing dims stay 0
        return tbl.select(carry).append_column(
            out_col, numpy_to_fixed_list_column(Z, pa.float32()))

    pruned = ds.select_columns(
        list(dict.fromkeys(carry + key_cols + [vector_col])))
    return bucketed_map_groups(pruned, key_cols, per_bucket,
                               num_buckets=num_buckets, seed=seed)
