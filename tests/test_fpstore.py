"""Persisted fingerprint store (incremental cross-run dedup): update /
probe round-trip, idempotent re-update, first-writer-wins merge,
invert audit, missing-partition passthrough, and footer-only stats."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import ray.data as rd

from featureextraction_jl_ray.stages.fpstore import (
    dedup_against_store,
    fingerprint_store_stats,
    fingerprint_store_update,
    with_fingerprint,
)


def _docs(ids, texts):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.asarray(ids, dtype=np.int64),
        "text": list(texts),
    }))


def test_update_probe_roundtrip(ray_session, tmp_path):
    store = str(tmp_path / "store")
    hist = _docs(range(100), [f"h{i}" for i in range(100)])
    added = fingerprint_store_update(hist, store, "doc_id", "text",
                                     num_buckets=8)
    assert added == 100
    # new batch: 40 fresh + 10 exact copies of history texts
    new = _docs(range(1000, 1050),
                [f"n{i}" for i in range(40)] + [f"h{i}" for i in range(10)])
    out = dedup_against_store(new, store, "text", num_buckets=8).to_pandas()
    assert len(out) == 40
    assert sorted(out.text) == sorted(f"n{i}" for i in range(40))
    assert "__fp" not in out.columns
    # invert: the "seen before" audit
    seen = dedup_against_store(new, store, "text", num_buckets=8,
                               invert=True).to_pandas()
    assert sorted(seen.text) == sorted(f"h{i}" for i in range(10))


def test_update_is_idempotent_first_writer_wins(ray_session, tmp_path):
    store = str(tmp_path / "store")
    a = _docs([1, 2, 3], ["x", "y", "z"])
    assert fingerprint_store_update(a, store, "doc_id", "text",
                                    num_buckets=4) == 3
    # same content, different keys: nothing added, original keys kept
    b = _docs([91, 92, 93, 94], ["x", "y", "z", "w"])
    assert fingerprint_store_update(b, store, "doc_id", "text",
                                    num_buckets=4) == 1
    stats = fingerprint_store_stats(store)
    assert stats["fingerprints"] == 4
    # probing either generation behaves the same
    out = dedup_against_store(_docs([5], ["x"]), store, "text",
                              num_buckets=4).to_pandas()
    assert len(out) == 0


def test_missing_partition_passthrough(ray_session, tmp_path):
    # store with few buckets populated: probes of unpopulated buckets
    # must pass rows through, not crash on the absent file
    store = str(tmp_path / "store")
    fingerprint_store_update(_docs([1], ["only"]), store, "doc_id", "text",
                             num_buckets=16)
    assert fingerprint_store_stats(store)["partitions"] == 1
    new = _docs(range(50), [f"t{i}" for i in range(50)])
    out = dedup_against_store(new, store, "text", num_buckets=16).to_pandas()
    assert len(out) == 50


def test_fingerprint_determinism(ray_session):
    ds = _docs([1, 2], ["same", "same"])
    fp = with_fingerprint(ds, "text").to_pandas()["__fp"]
    assert fp.iloc[0] == fp.iloc[1]
    # distinct content → distinct fingerprints (collision would be ~2^-64)
    fp2 = with_fingerprint(_docs([1, 2], ["a", "b"]),
                           "text").to_pandas()["__fp"]
    assert fp2.iloc[0] != fp2.iloc[1]


def test_store_layout_is_hive_partitioned(ray_session, tmp_path):
    store = str(tmp_path / "store")
    fingerprint_store_update(_docs(range(200), [f"d{i}" for i in range(200)]),
                             store, "doc_id", "text", num_buckets=8)
    parts = [p for p in os.listdir(store) if p.startswith("fp_bucket=")]
    assert 1 < len(parts) <= 8
    stats = fingerprint_store_stats(store)
    assert stats["fingerprints"] == 200 and stats["bytes"] > 0


# ------------------------------------------------------- incremental refresh


def test_incremental_refresh_composition(ray_session, tmp_path):
    import pyarrow as pa

    from featureextraction_jl_ray.pipelines.incremental import (
        run_incremental_refresh,
    )
    from featureextraction_jl_ray.stages.fpstore import (
        fingerprint_store_update,
    )

    store = str(tmp_path / "store")
    old = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": [f"t{i}" for i in range(10)],
    })
    # new: doc 0 removed; doc 1 changed to fresh text; doc 2 changed to a
    # text history already has (t5); doc 100 added fresh; doc 101 added
    # as a copy of history (t7); rest unchanged
    new = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 101],
                           dtype=np.int64),
        "text": ["fresh1", "t5", "t3", "t4", "t5", "t6", "t7", "t8", "t9",
                 "fresh100", "t7"],
    })
    def ds(df):
        return rd.from_arrow(pa.Table.from_pandas(df))

    fingerprint_store_update(ds(old), store, "doc_id", "text",
                             num_buckets=4)
    out = (run_incremental_refresh(ds(old), ds(new), store,
                                   key_col="doc_id", content_col="text",
                                   num_buckets=4)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    # survivors: doc 1 (changed, fresh) and doc 100 (added, fresh);
    # doc 2 and 101 hit the store; doc 0's removal is not work
    assert out.doc_id.tolist() == [1, 100]
    assert out.change.tolist() == ["changed", "added"]
    assert out.text.tolist() == ["fresh1", "fresh100"]


# ------------------------------------------------------------- phash store


def _phash_df(hashes, start_id=0):
    import pyarrow as pa

    return rd.from_arrow(pa.Table.from_pandas(pd.DataFrame({
        "iid": np.arange(start_id, start_id + len(hashes), dtype=np.int64),
        "phash": np.asarray(hashes, dtype=np.int64),
    })))


def test_phash_store_probe_matches_bruteforce(ray_session, tmp_path):
    from featureextraction_jl_ray.stages.dedup import popcount64
    from featureextraction_jl_ray.stages.fpstore import (
        phash_store_hits,
        phash_store_update,
    )

    rng = np.random.default_rng(0)
    hist = rng.integers(-2**63, 2**63, 300).astype(np.int64)
    # new: 50 random + perturbations of history at distance 1, 2 and 3
    new = list(rng.integers(-2**63, 2**63, 50).astype(np.int64))
    new.append(hist[0] ^ (1 << 5))                     # d=1 → hit
    new.append(hist[1] ^ (1 << 3) ^ (1 << 40))         # d=2 → hit
    new.append(hist[2] ^ np.int64((1 << 1) ^ (1 << 2)) ^ np.int64(-2**63))  # d=3 → miss
    new.append(hist[3])                                # d=0 → hit
    new = np.asarray(new, dtype=np.int64)

    store = str(tmp_path / "ph")
    phash_store_update(_phash_df(hist), store, "iid", "phash",
                       num_bands=4, num_buckets=8)
    got = (phash_store_hits(_phash_df(new, start_id=1000), store,
                            "iid", "phash", max_distance=2,
                            num_bands=4, num_buckets=8)
           .to_pandas().sort_values("iid", ignore_index=True))
    # brute force over the full cross product
    x = np.bitwise_xor(new[:, None].astype(np.uint64),
                       hist[None, :].astype(np.uint64))
    d = popcount64(x.reshape(-1)).reshape(len(new), len(hist))
    want_hit = (d <= 2).any(axis=1)
    want_min = d.min(axis=1)
    assert got.iid.tolist() == (1000 + np.flatnonzero(want_hit)).tolist()
    np.testing.assert_array_equal(got.min_dist.to_numpy(),
                                  want_min[want_hit])


def test_phash_store_update_idempotent(ray_session, tmp_path):
    from featureextraction_jl_ray.stages.fpstore import (
        phash_store_hits,
        phash_store_update,
    )

    hist = np.arange(100, dtype=np.int64) * 1_000_003
    store = str(tmp_path / "ph")
    a1 = phash_store_update(_phash_df(hist), store, "iid", "phash",
                            num_bands=4, num_buckets=8)
    a2 = phash_store_update(_phash_df(hist), store, "iid", "phash",
                            num_bands=4, num_buckets=8)
    assert a1 > 0 and a2 == 0
    # exact copies are found at distance 0
    got = phash_store_hits(_phash_df(hist[:5], start_id=500), store,
                           "iid", "phash", num_bands=4,
                           num_buckets=8).to_pandas()
    assert len(got) == 5 and (got.min_dist == 0).all()


def test_phash_store_band_guard(ray_session, tmp_path):
    import pytest

    from featureextraction_jl_ray.stages.fpstore import phash_store_hits

    with pytest.raises(ValueError, match="must exceed"):
        phash_store_hits(_phash_df(np.array([1])), str(tmp_path), "iid",
                         "phash", max_distance=4, num_bands=4)
