"""Unit tests for the blob-packed bucket exchange (stages/blobshuffle.py)."""

import numpy as np
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.blobshuffle import (
    _BLOB,
    _SIDE,
    blob_schema,
    pack_by_bucket,
    unpack_blobs,
)
from featureextraction_jl_ray.stages.partition import _BUCKET


def _table(n, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array([f"e{i}" for i in range(n)]),
            "v": pa.array(rng.standard_normal(n)),
            "k": pa.array(rng.integers(0, 100, n)),
        }
    )


def test_pack_unpack_roundtrip():
    tbl = _table(1000)
    buckets = np.arange(1000) % 7
    packed = pack_by_bucket(tbl, buckets, side=0)
    assert packed.column_names == [_BUCKET, _SIDE, _BLOB]
    assert packed.num_rows == 7  # one blob per bucket value present
    # reassembled rows == original rows (order within bucket preserved)
    back = unpack_blobs(packed.column(_BLOB))
    assert back.schema == tbl.schema
    assert back.num_rows == 1000
    # per-bucket slices hold exactly the rows whose id hashes there
    ids = set(back.column("id").to_pylist())
    assert ids == set(tbl.column("id").to_pylist())
    # bucket ids on the blob rows are the distinct input buckets
    assert sorted(packed.column(_BUCKET).to_pylist()) == list(range(7))


def test_pack_preserves_within_bucket_order():
    tbl = _table(50)
    buckets = np.zeros(50, dtype=np.int64)
    packed = pack_by_bucket(tbl, buckets)
    back = unpack_blobs(packed.column(_BLOB))
    assert back.column("id").to_pylist() == tbl.column("id").to_pylist()


def test_empty_input_and_fallback_schema():
    tbl = _table(0)
    packed = pack_by_bucket(tbl, np.array([], dtype=np.int64), side=1)
    assert packed.num_rows == 0
    assert packed.schema == blob_schema(True)
    fb = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = unpack_blobs([], fb)
    assert out.schema == fb and out.num_rows == 0
    with pytest.raises(ValueError):
        unpack_blobs([])


def test_no_side_column():
    tbl = _table(10)
    packed = pack_by_bucket(tbl, np.arange(10) % 3)
    assert packed.column_names == [_BUCKET, _BLOB]


def test_compression_actually_shrinks():
    # 4k rows of repetitive strings must compress (lz4 is available in
    # the standard pyarrow wheel; if this fails the wire format silently
    # lost its compression)
    n = 4096
    tbl = pa.table({"s": pa.array(["the quick brown fox " * 4] * n),
                    "v": pa.array(np.zeros(n))})
    packed = pack_by_bucket(tbl, np.zeros(n, dtype=np.int64))
    blob_bytes = len(packed.column(_BLOB)[0].as_py())
    assert blob_bytes < tbl.nbytes / 5


def test_multi_chunk_input():
    t1, t2 = _table(100, seed=1), _table(100, seed=2)
    tbl = pa.concat_tables([t1, t2])  # 2 chunks
    packed = pack_by_bucket(tbl, np.arange(200) % 5)
    back = unpack_blobs(packed.column(_BLOB))
    assert back.num_rows == 200


def test_bucketed_map_groups_colocates_keys(ray_session):
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.partition import bucketed_map_groups

    rng = np.random.default_rng(2)
    n = 3000
    tbl = pa.table({"k": pa.array(rng.integers(0, 40, n)),
                    "v": pa.array(rng.standard_normal(n))})
    ds = ray_session.data.from_arrow(tbl).repartition(6)

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = t.to_pandas()
        out = df.groupby("k")["v"].sum().reset_index(name="s")
        return pa.table({"k": pa.array(out.k.to_numpy()),
                         "s": pa.array(out.s.to_numpy())})

    got = bucketed_map_groups(ds, "k", per_bucket, num_buckets=8).to_pandas()
    # every key appears exactly once (never split across buckets)
    assert got.k.is_unique and len(got) == 40
    import pandas as pd
    exp = tbl.to_pandas().groupby("k")["v"].sum()
    assert np.allclose(got.sort_values("k").s.to_numpy(), exp.to_numpy())


# ---------------------------------------------------------------- NUL keys


def test_stable_hash_nul_injective():
    import numpy as np

    from featureextraction_jl_ray.functions.hashing import stable_hash_array

    # pandas' khash truncates C-strings at NUL; the escape must keep
    # distinct values distinct and non-NUL values unchanged
    vals = np.array(["a", "a\x00b", "a\x00c", "a\x01b", "a\x01\x02b"],
                    dtype=object)
    h = stable_hash_array(vals)
    assert len(set(h.tolist())) == len(vals)
    plain = np.array(["a", "xyz"], dtype=object)
    # stability: same values hash identically across calls
    np.testing.assert_array_equal(stable_hash_array(plain),
                                  stable_hash_array(plain))


def test_stable_hash_non_string_objects_still_work():
    import datetime

    import numpy as np

    from featureextraction_jl_ray.functions.hashing import stable_hash_array

    dates = np.array([datetime.date(2024, 1, 1),
                      datetime.date(2024, 1, 2)], dtype=object)
    h = stable_hash_array(dates)
    assert h[0] != h[1]


def test_grouped_aggregate_nul_key_is_loud(ray_session):
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate

    df = pd.DataFrame({"k": ["a\x00b", "a\x00c", "a"], "v": [1, 1, 1]})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises(Exception, match="NUL"):
        grouped_aggregate(ds, "k", {"n": ("v", "count")},
                          num_buckets=4).to_pandas()
