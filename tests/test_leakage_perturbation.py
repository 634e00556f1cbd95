"""Adversarial leakage test (SURVEY.md §5.2 №4): perturbing rows that lie
strictly in the FUTURE of every image must not change any feature."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from featureextraction_jl_ray.pipelines.flagship import FlagshipConfig, run_flagship
from featureextraction_jl_ray.synth import SynthConfig, synth_captions, synth_images

CFG = SynthConfig(n_entities=40, seed=42)
FCFG = FlagshipConfig(num_buckets=8, k=8)


def _run(ray, captions_tbl):
    images = ray.data.from_arrow(synth_images(CFG))
    captions = ray.data.from_arrow(captions_tbl)
    ds, _ = run_flagship(images, captions, cfg=FCFG)
    df = ds.to_pandas().sort_values("image_id", ignore_index=True)
    df["z"] = df["z"].map(tuple)
    return df


def test_future_perturbation_changes_nothing(ray_session):
    cap = synth_captions(CFG)
    base = _run(ray_session, cap)
    # poison every strictly-future caption row differently (the LEAK_ rows
    # by construction have ts later than all of the entity's image ts)
    is_leak = pc.starts_with(cap.column("caption_state"), "LEAK_")
    perturbed = cap.set_column(
        cap.schema.get_field_index("caption_state"),
        "caption_state",
        pc.if_else(is_leak, pa.scalar("LEAK_TOTALLY_DIFFERENT_POISON"),
                   cap.column("caption_state")),
    )
    assert perturbed.column("caption_state").to_pylist() != \
        cap.column("caption_state").to_pylist()
    after = _run(ray_session, perturbed)
    pd.testing.assert_frame_equal(base, after)
