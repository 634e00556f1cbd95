"""Composed embedding corpus-prep funnel (outlier filter → near-dup
collapse): the stage-ORDER interaction is the thing under test."""

from __future__ import annotations

import numpy as np
import pandas as pd

from featureextraction_jl_ray.pipelines.embeddingprep import run_embedding_prep


def _mk(ray, df):
    return ray.data.from_pandas(df).repartition(4)


def test_embedding_prep_stage_order(ray_session):
    """A junk outlier that near-dups a clean row must be FILTERED before
    dedup: the clean partner survives.  Dedup-then-filter would collapse
    the clean row into the junk representative and then drop the junk —
    losing both."""
    import ray as _ray

    rng = np.random.default_rng(13)
    base = rng.normal(0, 1, 16)
    base /= np.linalg.norm(base)
    # group 0: 50 rows tightly around +base (high centroid sim)
    X = base + rng.normal(0, 0.05, (50, 16))
    # id 0: junk row anti-aligned with its group centroid (outlier)...
    X[0] = -base + rng.normal(0, 0.01, 16)
    # ...and id 1: a clean-ish duplicate OF THE JUNK direction? No —
    # plant the near-dup the dangerous way round: junk id 0 has the
    # SMALLEST id, so if it survived into dedup it would become the
    # representative of any cluster it touches.  Give it a near-dup
    # partner id 1 that is ALSO anti-aligned but we keep the filter
    # threshold so id 1 drops too; the clean pair (2, 3) meanwhile
    # near-dups and must collapse to id 2.
    X[1] = X[0] + rng.normal(0, 0.01, 16)
    X[3] = X[2] + rng.normal(0, 0.001, 16)
    df = pd.DataFrame({
        "vid": np.arange(50, dtype=np.int64),
        "grp": np.zeros(50, dtype=np.int64),
        "emb": list(X.astype(np.float32)),
    })
    kept, pairs = run_embedding_prep(
        _mk(_ray, df), vector_col="emb", id_col="vid", key_col="grp",
        sim_threshold=0.0, dedup_threshold=0.98, bands=16,
        planes_per_band=4)
    ids = set(kept.to_pandas().vid)
    assert 0 not in ids and 1 not in ids   # junk filtered (not deduped!)
    assert 2 in ids and 3 not in ids       # clean near-dup collapsed to min id
    # had dedup run first, (0,1) would collapse to 0 and the filter
    # would then drop 0 — id 1 lost silently; assert the pair list never
    # contains the junk ids (they never reached dedup)
    pdf = pairs if isinstance(pairs, pd.DataFrame) else pairs.to_pandas()
    assert not ({0, 1} & (set(pdf.id_a) | set(pdf.id_b)))


def test_embedding_prep_no_outliers_equals_plain_dedup(ray_session):
    """With a permissive filter the funnel reduces to embedding_dedup."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import embedding_dedup

    rng = np.random.default_rng(17)
    X = rng.normal(0, 1, (120, 12)).astype(np.float32)
    X[11] = X[10] * 1.5  # cosine-identical near-dup
    df = pd.DataFrame({"vid": np.arange(120, dtype=np.int64),
                       "grp": (np.arange(120) % 3).astype(np.int64),
                       "emb": list(X)})
    kept, _ = run_embedding_prep(
        _mk(_ray, df), vector_col="emb", id_col="vid", key_col="grp",
        sim_threshold=-1.0, dedup_threshold=0.995, bands=16,
        planes_per_band=4)
    want, _ = embedding_dedup(_mk(_ray, df), vector_col="emb", id_col="vid",
                              threshold=0.995, bands=16, planes_per_band=4)
    assert set(kept.to_pandas().vid) == set(want.to_pandas().vid)
    assert 10 in set(kept.to_pandas().vid)
