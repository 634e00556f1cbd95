"""Fitted-state persistence — the train/serve contract.

A feature pipeline fits state on the training corpus (PCA basis,
quantizer scales, moments, category encodings) and must apply the SAME
state at serving/backfill time, possibly in a different process weeks
later.  Models serialize to one ``.npz`` (arrays) + embedded JSON
metadata per file under a directory, so a fitted pipeline round-trips
through plain files — no pickle (version-fragile, code-execution on
load) anywhere.

Supported: PCAModel, Moments, ScalarQuantizer, plain dict[str, scalar]
maps (target/frequency encodings, min-max bounds, quantile fits).
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["save_model", "load_model"]

_KINDS = ("pca", "moments", "scalar_quantizer", "mapping")


def _kind_of(model) -> str:
    name = type(model).__name__
    if name == "PCAModel":
        return "pca"
    if name == "Moments":
        return "moments"
    if name == "ScalarQuantizer":
        return "scalar_quantizer"
    if isinstance(model, dict):
        return "mapping"
    raise TypeError(f"unsupported model type {name!r}; one of {_KINDS}")


def save_model(model, path: str) -> str:
    """Serialize a fitted model to ``path`` (.npz appended if missing).
    Returns the written path."""
    kind = _kind_of(model)
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: dict[str, np.ndarray] = {}
    meta: dict = {"kind": kind, "format_version": 1}
    if kind == "pca":
        arrays = {"mean": model.mean, "eigvals": model.eigvals,
                  "components": model.components}
        meta |= {"n": int(model.n), "tol": float(model.tol)}
    elif kind == "moments":
        arrays = {"mean": model.mean, "m2": model.m2}
        meta |= {"n": int(model.n)}
    elif kind == "scalar_quantizer":
        arrays = {"scale": model.scale}
    else:  # mapping: keys to a string array, values to float/str arrays
        keys = list(model.keys())
        vals = list(model.values())
        arrays["__keys"] = np.asarray(keys, dtype=object).astype(str)
        if all(isinstance(v, (int, float, np.integer, np.floating))
               for v in vals):
            arrays["__vals"] = np.asarray(vals, dtype=np.float64)
            meta["value_type"] = "float"
        elif all(isinstance(v, (tuple, list)) and
                 all(isinstance(x, (int, float, np.integer, np.floating))
                     for x in v) for v in vals):
            arrays["__vals"] = np.asarray(vals, dtype=np.float64)
            meta["value_type"] = "float_tuple"
        else:
            raise TypeError("mapping values must be numeric scalars or tuples")
    arrays["__meta"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy()
    np.savez(path, **arrays)
    return path


def load_model(path: str):
    """Load a model written by :func:`save_model`; the returned object is
    of the original class (transforms apply identically — pytest pins the
    round-trip bit-exactly)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta"]).decode("utf-8"))
        kind = meta["kind"]
        if kind == "pca":
            from .pca import PCAModel

            return PCAModel(mean=z["mean"], eigvals=z["eigvals"],
                            components=z["components"], n=meta["n"],
                            tol=meta["tol"])
        if kind == "moments":
            from .moments import Moments

            return Moments(n=meta["n"], mean=z["mean"], m2=z["m2"])
        if kind == "scalar_quantizer":
            from ..stages.similarity import ScalarQuantizer

            return ScalarQuantizer(z["scale"])
        if kind == "mapping":
            keys = z["__keys"].tolist()
            vals = z["__vals"]
            if meta["value_type"] == "float":
                return dict(zip(keys, vals.tolist()))
            return {k: tuple(v) for k, v in zip(keys, vals.tolist())}
    raise ValueError(f"unknown model kind {kind!r} in {path}")
