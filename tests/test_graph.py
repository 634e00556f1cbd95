"""stages/graph.pagerank vs a dense NumPy power-iteration oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _dense_pagerank(edges, weights, n_nodes, *, damping=0.85, iters=3):
    """Same semantics as stages.graph.pagerank: fixed synchronous
    iterations, weighted, dangling mass leaks (no redistribution)."""
    A = np.zeros((n_nodes, n_nodes))
    for (s, d), w in zip(edges, weights):
        A[s, d] += w
    od = A.sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        P = np.where(od[:, None] > 0, A / od[:, None], 0.0)
    r = np.full(n_nodes, 1.0 / n_nodes)
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        r = base + damping * (P.T @ r)
    return r


def _ranks_dict(ds):
    t = pa.concat_tables(list(ds.iter_batches(batch_size=None,
                                              batch_format="pyarrow")))
    return dict(zip(t.column("node").to_pylist(),
                    t.column("rank").to_pylist()))


def test_pagerank_matches_dense_oracle(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.graph import pagerank

    rng = np.random.default_rng(7)
    n = 12
    m = 60
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 5, src.size).astype(np.float64)

    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, type=pa.int64()),
        "dst": pa.array(dst, type=pa.int64()),
        "w": pa.array(w, type=pa.float64()),
    }))
    got = _ranks_dict(pagerank(edges, weight_col="w", iters=3,
                               num_buckets=4))

    present = sorted(set(src.tolist()) | set(dst.tolist()))
    remap = {v: i for i, v in enumerate(present)}
    dense = _dense_pagerank(
        [(remap[s], remap[d]) for s, d in zip(src, dst)], w, len(present))
    assert set(got) == set(present)
    for v in present:
        assert got[v] == pytest.approx(dense[remap[v]], rel=1e-12)


def test_pagerank_unweighted_and_dangling(ray_session):
    """Unweighted star 0→{1,2,3}: leaves dangle, their mass leaks —
    r(leaf) = base + d·r0/3 after one iteration; hub gets teleport only."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 0], type=pa.int64()),
        "dst": pa.array([1, 2, 3], type=pa.int64()),
    }))
    got = _ranks_dict(pagerank(edges, iters=1, num_buckets=2))
    base = 0.15 / 4
    assert got[0] == pytest.approx(base)
    for leaf in (1, 2, 3):
        assert got[leaf] == pytest.approx(base + 0.85 * 0.25 / 3)
    assert got[0] < got[1]


def test_pagerank_validates_args(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.graph import pagerank

    edges = rd.from_arrow(pa.table({"src": pa.array([0], type=pa.int64()),
                                    "dst": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)
    with pytest.raises(ValueError):
        pagerank(edges, damping=1.5)
