"""loo_target_encode / collapse_rare vs hand-computed oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _collect(ds) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_size=None,
                                                 batch_format="pyarrow")))


def test_loo_target_encode_known_values(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import loo_target_encode

    # cat a: [1, 3, 5] → loo = [(3+5)/2, (1+5)/2, (1+3)/2] = [4, 3, 2]
    # cat b singleton: [10] → global mean (1+3+5+10)/4 = 4.75
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"]),
        "y": pa.array([1.0, 3.0, 5.0, 10.0]),
    }))
    t = _collect(loo_target_encode(ds, "k", "y", out_col="te"))
    got = dict(zip(zip(t.column("k").to_pylist(),
                       t.column("y").to_pylist()),
                   t.column("te").to_pylist()))
    assert got[("a", 1.0)] == pytest.approx(4.0)
    assert got[("a", 3.0)] == pytest.approx(3.0)
    assert got[("a", 5.0)] == pytest.approx(2.0)
    assert got[("b", 10.0)] == pytest.approx(4.75)


def test_loo_never_equals_plain_mean_on_multirow_cats(ray_session):
    """The leakage property: in a multi-row category whose values
    differ, loo_i != category mean (the plain target-encode leak)."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import loo_target_encode

    rng = np.random.default_rng(3)
    k = np.repeat([f"c{i}" for i in range(20)], 5)
    y = rng.normal(size=k.size)
    ds = rd.from_arrow(pa.table({"k": pa.array(k), "y": pa.array(y)}))
    t = _collect(loo_target_encode(ds, "k", "y", out_col="te"))
    import pandas as pd

    df = t.to_pandas()
    means = df.groupby("k")["y"].transform("mean")
    assert (np.abs(df["te"] - means) > 1e-12).all()


def test_collapse_rare_threshold_and_out_col(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import collapse_rare

    vals = ["x"] * 5 + ["y"] * 2 + ["z"]
    ds = rd.from_arrow(pa.table({"c": pa.array(vals)}))
    t = _collect(collapse_rare(ds, "c", min_count=3))
    got = t.column("c").to_pylist()
    assert got.count("x") == 5
    assert got.count("__other__") == 3

    t2 = _collect(collapse_rare(ds, "c", min_count=3, out_col="c2",
                                other="RARE"))
    assert t2.column("c").to_pylist().count("y") == 2  # original kept
    assert t2.column("c2").to_pylist().count("RARE") == 3


def test_collapse_rare_all_kept(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import collapse_rare

    ds = rd.from_arrow(pa.table({"c": pa.array(["a", "a", "b", "b"])}))
    t = _collect(collapse_rare(ds, "c", min_count=1))
    assert sorted(t.column("c").to_pylist()) == ["a", "a", "b", "b"]
