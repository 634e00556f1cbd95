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


def test_decayed_sum_is_leakage_free(ray_session):
    """Perturbing a FUTURE event's value must not change any earlier
    row's decayed sum for the same entity (strictly-backward contract)."""
    import numpy as np

    from featureextraction_jl_ray.stages.window import with_decayed_sum

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(range(10), unit="h")
    base = pa.table({
        "eid": pa.array([0] * 10, type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "v": pa.array([float(i + 1) for i in range(10)]),
        "rid": pa.array(range(10), type=pa.int64()),
    })
    poisoned = base.set_column(
        base.schema.get_field_index("v"), "v",
        pa.array([float(i + 1) for i in range(9)] + [9999.0]))

    def run(tbl):
        ds = ray_session.data.from_arrow(tbl)
        return (with_decayed_sum(ds, "eid", "ts", "v", tau="2h", num_buckets=2)
                .to_pandas().sort_values("rid", ignore_index=True))

    a, b = run(base), run(poisoned)
    np.testing.assert_array_equal(a.decayed_v.to_numpy()[:9],
                                  b.decayed_v.to_numpy()[:9])
    assert a.decayed_v.iloc[9] != b.decayed_v.iloc[9]
