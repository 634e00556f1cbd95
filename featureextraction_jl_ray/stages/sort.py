"""Range-partition sort with sampled quantile boundaries (SURVEY.md R1,
A5) — the "range-partition shuffle on (entity_id, ts)" of the
north-star, with the boundary sketch made explicit and PERSISTABLE so a
resumed run reuses identical partition ranges (SURVEY.md §7 hard-part 2).

``ray.data.Dataset.sort`` already range-partitions internally by
sampling; this wrapper exists for the cases where the engine must OWN
the boundaries: deterministic resume, co-partitioning two datasets on
the same ranges, and writing range-labelled output directories.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pyarrow as pa

__all__ = ["sample_boundaries", "range_partition_sort"]


def sample_boundaries(
    ds,
    key: str,
    num_partitions: int,
    *,
    sample_frac: float = 0.02,
    max_sample: int = 100_000,
    seed: int = 42,
) -> list:
    """num_partitions−1 quantile boundaries of ``key`` from a seeded sample."""
    sample = ds.select_columns([key]).random_sample(sample_frac, seed=seed)
    vals = sample.to_pandas()[key].dropna()
    if len(vals) > max_sample:
        vals = vals.iloc[:max_sample]
    if len(vals) == 0:
        return []
    qs = np.linspace(0, 1, num_partitions + 1)[1:-1]
    bounds = vals.quantile(qs, interpolation="nearest").tolist()
    # dedupe while preserving order (heavy skew can repeat quantiles)
    out, prev = [], object()
    for b in bounds:
        if b != prev:
            out.append(b)
            prev = b
    return out


def save_boundaries(bounds: list, path: str | Path) -> None:
    Path(path).write_text(json.dumps({"boundaries": bounds}))


def load_boundaries(path: str | Path) -> list:
    return json.loads(Path(path).read_text())["boundaries"]


def range_partition_sort(
    ds,
    keys: list[str] | str,
    *,
    num_partitions: int = 64,
    boundaries: list | None = None,
    boundaries_path: str | None = None,
    descending: bool = False,
    seed: int = 42,
):
    """Globally sort ``ds`` by ``keys`` with explicit range boundaries on
    the FIRST key (sampled here unless provided); optionally persist the
    boundary artifact for deterministic re-partitioning on resume."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if boundaries is None:
        if boundaries_path and Path(boundaries_path).exists():
            boundaries = load_boundaries(boundaries_path)
        else:
            boundaries = sample_boundaries(ds, keys[0], num_partitions, seed=seed)
            if boundaries_path:
                save_boundaries(boundaries, boundaries_path)
    return ds.sort(keys, descending=descending, boundaries=boundaries or None)
