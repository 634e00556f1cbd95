"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SYNTH_CACHE_DIR = "/tmp/fx_synth_cache"


def _synth_paths(n_entities: int = 200, seed: int = 42):
    from featureextraction_jl_ray.synth import SynthConfig, write_synth_tables

    cfg = SynthConfig(n_entities=n_entities, seed=seed)
    return cfg, write_synth_tables(cfg, _SYNTH_CACHE_DIR)


def entry() -> Any:
    """Flagship pipeline (BASELINE.json north_star): as-of join + windowed
    features + whitened-PCA transform over the deterministic synthetic
    image+caption tables (driver-mandated input shape, BASELINE.json:15),
    at sf0.001-ish scale."""
    import ray.data as rd

    from featureextraction_jl_ray.pipelines.flagship import (
        FlagshipConfig,
        run_flagship,
    )

    _, paths = _synth_paths(n_entities=200, seed=42)
    images = rd.read_parquet(paths["images"])
    captions = rd.read_parquet(paths["captions"])
    ds, _model = run_flagship(images, captions, cfg=FlagshipConfig(num_buckets=16))
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    from featureextraction_jl_ray import queries as q

    return q.QUERIES


def oracle_sql() -> dict[str, str]:
    from featureextraction_jl_ray import queries as q

    return q.ORACLE_SQL
