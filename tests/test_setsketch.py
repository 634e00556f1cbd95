"""KMV set sketches vs exact set arithmetic: unsaturated exactness,
saturated accuracy bounds, merge associativity across block layouts,
and overlap estimation on planted intersections."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from featureextraction_jl_ray.stages.setsketch import (
    kmv_distinct,
    kmv_overlap,
    kmv_sketch,
)


def _ds(values, blocks=4):
    df = pd.DataFrame({"v": np.asarray(values)})
    return rd.from_pandas(df).repartition(blocks)


def test_unsaturated_is_exact(ray_session):
    vals = np.repeat(np.arange(500, dtype=np.int64), 3)  # dups collapse
    sk = kmv_sketch(_ds(vals), "v", k=4096)
    assert len(sk) == 500
    assert kmv_distinct(sk, k=4096) == 500.0


def test_saturated_within_tolerance(ray_session):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 10**12, 60_000).astype(np.int64)
    exact = len(np.unique(vals))
    sk = kmv_sketch(_ds(vals, blocks=8), "v", k=1024)
    assert len(sk) == 1024
    est = kmv_distinct(sk, k=1024)
    assert abs(est - exact) / exact < 0.10  # O(1/sqrt(k)) ≈ 3%; 10% safe


def test_block_layout_invariance(ray_session):
    # mergeability: the sketch must not depend on how rows are blocked
    vals = np.arange(10_000, dtype=np.int64)
    a = kmv_sketch(_ds(vals, blocks=1), "v", k=512)
    b = kmv_sketch(_ds(vals, blocks=16), "v", k=512)
    np.testing.assert_array_equal(a, b)


def test_overlap_planted(ray_session):
    # |A|=4000, |B|=3000, |A∩B|=2000 → J = 2000/5000
    a_vals = np.arange(0, 4000, dtype=np.int64)
    b_vals = np.arange(2000, 5000, dtype=np.int64)
    K = 8192  # unsaturated → exact
    sa = kmv_sketch(_ds(a_vals), "v", k=K)
    sb = kmv_sketch(_ds(b_vals), "v", k=K)
    o = kmv_overlap(sa, sb, k=K)
    assert o["distinct_a"] == 4000.0 and o["distinct_b"] == 3000.0
    assert o["union"] == 5000.0
    assert abs(o["jaccard"] - 0.4) < 1e-12
    assert abs(o["intersection"] - 2000.0) < 1e-9
    assert abs(o["a_not_b"] - 2000.0) < 1e-9   # |A\B| = 4000 − 2000
    assert abs(o["b_not_a"] - 1000.0) < 1e-9
    # saturated overlap stays within tolerance
    K2 = 512
    o2 = kmv_overlap(kmv_sketch(_ds(a_vals), "v", k=K2),
                     kmv_sketch(_ds(b_vals), "v", k=K2), k=K2)
    assert abs(o2["jaccard"] - 0.4) < 0.08
    assert abs(o2["intersection"] - 2000.0) / 2000.0 < 0.15


def test_disjoint_and_identical(ray_session):
    a = kmv_sketch(_ds(np.arange(100, dtype=np.int64)), "v", k=256)
    b = kmv_sketch(_ds(np.arange(100, 200, dtype=np.int64)), "v", k=256)
    o = kmv_overlap(a, b, k=256)
    assert o["jaccard"] == 0.0 and o["intersection"] == 0.0
    assert o["a_not_b"] == 100.0 and o["b_not_a"] == 100.0
    o_same = kmv_overlap(a, a, k=256)
    assert o_same["jaccard"] == 1.0 and o_same["union"] == 100.0
    assert o_same["a_not_b"] == 0.0 and o_same["b_not_a"] == 0.0
