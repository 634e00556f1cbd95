"""Distributed cluster collapse (VERDICT r2 №1): large/small-star
connected components must reproduce the driver union-find exactly —
including above the old driver ``max_pairs`` guard — for int and string
ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.dedup import (
    collapse_pairs,
    connected_components,
)


def _pairs_ds(ray, pairs):
    a, b = zip(*pairs)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(list(a)), "id_b": pa.array(list(b))})
    ).repartition(3)


def _cc_roots(ray, pairs):
    out = connected_components(_pairs_ds(ray, pairs), num_buckets=8).to_pandas()
    return dict(zip(out.id, out.root))


def test_cc_path_triangle_isolated(ray_session):
    """A long path (worst case for naive propagation), a triangle and a
    2-cycle all converge to min-root stars."""
    path = [(i, i + 1) for i in range(10, 20)]          # component root 10
    tri = [(1, 2), (2, 3), (1, 3)]                      # root 1
    pairs = path + tri + [(100, 101)]                   # root 100
    roots = _cc_roots(ray_session, pairs)
    assert {k: v for k, v in roots.items() if k < 100 and k > 9} == {
        i: 10 for i in range(11, 21)
    }
    assert roots[2] == 1 and roots[3] == 1
    assert roots[101] == 100
    assert 1 not in roots and 10 not in roots and 100 not in roots


def test_cc_string_ids(ray_session):
    """String ids: min = lexicographic, matching the driver union-find."""
    pairs = [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("zz", "yy")]
    roots = _cc_roots(ray_session, pairs)
    assert roots == {"doc_b": "doc_a", "doc_c": "doc_a", "zz": "yy"}


def test_collapse_distributed_equals_driver(ray_session):
    """Distributed collapse ≡ driver union-find on a multi-cluster graph,
    and 'auto' above max_pairs routes to distributed instead of erroring."""
    rng = np.random.default_rng(7)
    # 30 clusters of size 4 (chained pairs) + 80 singletons
    pairs = []
    for c in range(30):
        base = c * 10
        pairs += [(base, base + 1), (base + 1, base + 2), (base + 2, base + 3)]
    ids = sorted({x for p in pairs for x in p} | set(range(1000, 1080)))
    ds = ray_session.data.from_arrow(
        pa.table({"iid": pa.array(ids, type=pa.int64()),
                  "val": pa.array(rng.standard_normal(len(ids)))})
    ).repartition(4)
    pairs_ds = _pairs_ds(ray_session, pairs)

    kept_driver = collapse_pairs(ds, pairs_ds, "iid", method="driver")
    kept_dist = collapse_pairs(ds, pairs_ds, "iid", method="distributed",
                               num_buckets=8)
    a = sorted(kept_driver.to_pandas().iid)
    b = sorted(kept_dist.to_pandas().iid)
    assert a == b
    assert a == sorted({c * 10 for c in range(30)} | set(range(1000, 1080)))

    # auto + tiny max_pairs: the old guard would raise; now it distributes
    kept_auto = collapse_pairs(ds, pairs_ds, "iid", method="auto",
                               max_pairs=5, num_buckets=8)
    assert sorted(kept_auto.to_pandas().iid) == a
    # explicit driver method keeps the loud guard
    with pytest.raises(RuntimeError, match="max_pairs"):
        collapse_pairs(ds, pairs_ds, "iid", method="driver", max_pairs=5)


def test_collapse_pairs_string_ids_driver(ray_session):
    """ADVICE r2: the driver drop-list must follow the id dtype — string
    ids crashed on the forced int64 cast."""
    ds = ray_session.data.from_arrow(
        pa.table({"doc": pa.array(["a", "b", "c", "d"])})
    )
    pairs = pd.DataFrame({"id_a": ["a", "a"], "id_b": ["b", "c"]})
    kept = collapse_pairs(ds, pairs, "doc", method="driver").to_pandas()
    assert sorted(kept.doc) == ["a", "d"]


def test_grouped_var_large_ints_no_overflow(ray_session):
    """ADVICE r2: Σx² of int64 values ~1e9+ must accumulate in float64 —
    int64 would wrap past 2^63 and the clamp would hide it."""
    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate

    vals = np.array([3_000_000_000, 3_000_000_123, 2_999_999_500,
                     3_000_000_777, 2_999_999_999, 3_000_000_001],
                    dtype=np.int64)
    keys = np.array([0, 0, 0, 1, 1, 1], dtype=np.int64)
    ds = ray_session.data.from_arrow(
        pa.table({"k": pa.array(keys), "x": pa.array(vals)})
    ).repartition(3)
    got = (grouped_aggregate(ds, ["k"], {"v": ("x", "var"), "s": ("x", "std")},
                             num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    for k in (0, 1):
        want = float(np.var(vals[keys == k].astype(np.float64), ddof=1))
        assert got.loc[k, "v"] == pytest.approx(want, rel=1e-6)
        assert got.loc[k, "s"] == pytest.approx(np.sqrt(want), rel=1e-6)


def test_embedding_near_dup_sharded_verify_equals_broadcast(ray_session):
    """VERDICT r2 №4: with a zero byte budget the verify shards by
    id-hash attach instead of broadcasting — identical verified pairs."""
    from featureextraction_jl_ray.stages.similarity import (
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(5)
    base = rng.standard_normal((4, 16))
    rows, ids = [], []
    k = 0
    for c in range(4):
        for j in range(3):
            rows.append(base[c] + rng.standard_normal(16) * 0.01)
            ids.append(k)
            k += 1
    ds = ray_session.data.from_arrow(
        pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                  "embedding": pa.array([r.astype(np.float64).tolist()
                                         for r in rows],
                                        type=pa.list_(pa.float64()))})
    ).repartition(3)
    kw = dict(vector_col="embedding", id_col="vec_id", threshold=0.95,
              bands=8, planes_per_band=8, num_buckets=8)
    bc = embedding_near_dup_pairs(ds, **kw).to_pandas()
    sh = embedding_near_dup_pairs(ds, max_broadcast_bytes=0, **kw).to_pandas()
    key = lambda df: sorted(zip(df.id_a, df.id_b))
    assert key(bc) == key(sh) and len(bc) > 0
    a = bc.sort_values(["id_a", "id_b"]).cosine.to_numpy()
    b = sh.sort_values(["id_a", "id_b"]).cosine.to_numpy()
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_minhash_sharded_verify_equals_broadcast(ray_session):
    """Zero byte budget → minhash verify shards by id-hash attach;
    verified pairs and jaccard values identical to the broadcast path."""
    from featureextraction_jl_ray.stages.minhash import minhash_near_dup_pairs

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to the deep green forest by the river")
    texts = [base + " bank", base + " shore", base + " delta",
             "a completely different sentence about distributed data",
             "another unrelated string with ray data pipelines and arrow"]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    kw = dict(text_col="text", id_col="doc_id", threshold=0.5, num_buckets=8)
    bc = minhash_near_dup_pairs(ds, **kw).to_pandas()
    sh = minhash_near_dup_pairs(ds, max_broadcast_bytes=0, **kw).to_pandas()
    key = lambda df: sorted(zip(df.id_a, df.id_b))
    assert key(bc) == key(sh) and len(bc) > 0
    a = bc.sort_values(["id_a", "id_b"]).jaccard.to_numpy()
    b = sh.sort_values(["id_a", "id_b"]).jaccard.to_numpy()
    np.testing.assert_allclose(a, b, rtol=1e-12)

def test_dedup_pairs_return_never_materializes_above_max_pairs(ray_session):
    """ADVICE r3 (medium): when the pair set exceeds max_pairs — the
    regime where collapse routes through distributed label propagation —
    the returned pairs must be the Dataset itself, never a driver-side
    pandas materialization."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.dedup import hamming_dedup

    # 3 planted clusters of 4 ids with near-equal phashes → pairs exist
    rows, hs = [], []
    for c in range(3):
        base = (c + 1) * 0x1111_1111_0000
        for j in range(4):
            rows.append(c * 10 + j)
            hs.append(base ^ j)  # hamming distance ≤ 2 within cluster
    ds = ray_session.data.from_arrow(
        pa.table({"iid": pa.array(rows, type=pa.int64()),
                  "phash": pa.array(hs, type=pa.int64())})
    ).repartition(3)

    kept, pairs = hamming_dedup(ds, "phash", "iid", max_distance=2,
                                num_buckets=8, max_pairs=2,
                                collapse_method="auto")
    assert isinstance(pairs, rd.Dataset), type(pairs)
    assert sorted(kept.to_pandas().iid) == [0, 10, 20]

    # bounded regime (or explicit opt-in) still returns pandas
    _, pairs_pd = hamming_dedup(ds, "phash", "iid", max_distance=2,
                                num_buckets=8, max_pairs=10_000)
    assert isinstance(pairs_pd, pd.DataFrame) and len(pairs_pd) > 0
    _, forced = hamming_dedup(ds, "phash", "iid", max_distance=2,
                              num_buckets=8, max_pairs=2,
                              return_pairs="pandas")
    assert isinstance(forced, pd.DataFrame)
    assert sorted(map(tuple, forced[["id_a", "id_b"]].to_numpy())) == sorted(
        map(tuple, pairs.to_pandas()[["id_a", "id_b"]].to_numpy()))


def test_minhash_broadcast_verify_string_ids(ray_session):
    """ADVICE r3: the broadcast verify keyed its lookup with int(i),
    crashing string doc ids that the embedding path already supports."""
    from featureextraction_jl_ray.stages.minhash import minhash_near_dup_pairs

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away to the deep green forest by the river")
    texts = [base + " bank", base + " shore",
             "a completely different sentence about distributed data"]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array(["doc_a", "doc_b", "doc_c"]),
                  "text": pa.array(texts)})
    ).repartition(2)
    got = minhash_near_dup_pairs(ds, text_col="text", id_col="doc_id",
                                 threshold=0.5, num_buckets=8).to_pandas()
    assert sorted(zip(got.id_a, got.id_b)) == [("doc_a", "doc_b")]


def test_cc_adaptive_buckets_default(ray_session):
    """collapse_pairs/connected_components size the star-round exchange
    adaptively when no bucket count is given (ADVICE r3: hardwired 64)."""
    pairs = [(1, 2), (2, 3), (10, 11)]
    out = connected_components(_pairs_ds(ray_session, pairs)).to_pandas()
    assert dict(zip(out.id, out.root)) == {2: 1, 3: 1, 11: 10}
