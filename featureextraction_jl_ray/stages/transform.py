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

__all__ = ["WhitenTransform", "apply_pca_transform"]


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
