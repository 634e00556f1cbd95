"""Step / Pipeline protocol (SURVEY.md §2-B X1) — the sklearn-flavored
fit/transform surface the reference's API shape implies (fit-style
function returning a model struct + transform-style function consuming
it; reference mirror empty at survey time, SURVEY.md §0).

A ``Step`` has ``fit(ds) -> state`` and ``transform(ds, state) -> ds``;
a ``Pipeline`` chains steps into ONE lazy Dataset graph — fitting
happens eagerly per step (each fit is a small aggregation), transforms
stay lazy so the streaming executor fuses them.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..stages.codec import with_pixel_features
from ..stages.transform import apply_pca_transform
from ..stages.window import make_windows_frame_fn, with_windows
from ..state.moments import fit_moments
from ..state.pca import PCAModel

__all__ = ["Step", "PCAStep", "DecodeStep", "WindowStep", "MapStep", "Pipeline"]


class Step:
    """Base protocol: stateless by default (fit returns None)."""

    name: str = "step"

    def fit(self, ds) -> Any:
        return None

    def transform(self, ds, state: Any):
        raise NotImplementedError


@dataclass
class PCAStep(Step):
    """Distributed-moments PCA/whitening fit + actor-pool transform."""

    vector_col: str
    out_col: str = "z"
    mode: str = "pca_whiten"
    k: int | None = None
    energy: float | None = None
    drop_input: bool = True
    name: str = "pca"

    def fit(self, ds) -> PCAModel:
        m = fit_moments(ds, self.vector_col)
        return PCAModel.from_moments(m).select(k=self.k, energy=self.energy)

    def transform(self, ds, state: PCAModel):
        return apply_pca_transform(
            ds,
            state,
            self.vector_col,
            out_col=self.out_col,
            mode=self.mode,
            drop_input=self.drop_input,
        )


@dataclass
class DecodeStep(Step):
    grid: int = 8
    feature_col: str = "pix"
    verify_phash: bool = False
    name: str = "decode"

    def transform(self, ds, state):
        return with_pixel_features(
            ds, grid=self.grid, feature_col=self.feature_col,
            verify_phash=self.verify_phash,
        )


@dataclass
class WindowStep(Step):
    entity_col: str
    ts_col: str
    lag_cols: tuple = ()
    lag_k: int = 1
    backfill_cols: tuple = ()
    session_gap: str | None = None
    rolling: dict | None = None
    num_buckets: int = 64
    tiebreak_cols: tuple = ()
    name: str = "windows"

    def transform(self, ds, state):
        return with_windows(
            ds,
            self.entity_col,
            self.ts_col,
            lag_cols=self.lag_cols,
            lag_k=self.lag_k,
            backfill_cols=self.backfill_cols,
            session_gap=self.session_gap,
            rolling=self.rolling,
            num_buckets=self.num_buckets,
            tiebreak_cols=self.tiebreak_cols,
        )


@dataclass
class MapStep(Step):
    """Arbitrary vectorized batch UDF slot (SURVEY.md X2)."""

    fn: Any = None
    batch_format: str = "pyarrow"
    name: str = "map"

    def transform(self, ds, state):
        return ds.map_batches(self.fn, batch_format=self.batch_format,
                              zero_copy_batch=True)


class Pipeline:
    """Ordered steps; ``fit`` learns each step's state on the (already
    partially transformed) stream, ``transform`` replays lazily."""

    def __init__(self, steps: list[Step]):
        self.steps = steps
        self.states_: dict[str, Any] = {}

    def fit(self, ds) -> "Pipeline":
        cur = ds
        for step in self.steps:
            state = step.fit(cur)
            self.states_[step.name] = state
            cur = step.transform(cur, state)
        return self

    def transform(self, ds):
        if not self.states_ and any(
            type(s).fit is not Step.fit for s in self.steps
        ):
            raise RuntimeError("Pipeline has unfitted steps; call fit() first")
        cur = ds
        for step in self.steps:
            cur = step.transform(cur, self.states_.get(step.name))
        return cur

    def fit_transform(self, ds):
        return self.fit(ds).transform(ds)
