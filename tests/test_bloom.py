"""Bloom filter + bloom-prefiltered semi-join: no false negatives ever,
FP rate near theory, and the verified join equals the exact semi-join."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from featureextraction_jl_ray.stages.joins import (
    BloomFilter,
    bloom_semi_join,
    build_bloom,
    semi_join,
)

ORDERS = "/root/testdata/sf0.01/orders.parquet"
CUSTOMER = "/root/testdata/sf0.01/customer.parquet"


def test_bloom_no_false_negatives_and_fp_rate():
    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    bf = build_bloom(pd.DataFrame({"k": keys}), "k", bits_per_key=16)
    assert bf.contains(keys).all()  # never a false negative
    probe = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bf.contains(fresh).mean()
    assert fp < 5e-3, fp  # theory ≈ 0.6185^16 ≈ 4.6e-4


def test_bloom_string_keys():
    keys = np.array([f"doc-{i}" for i in range(1000)], dtype=object)
    bf = build_bloom(pd.DataFrame({"k": keys}), "k", bits_per_key=16)
    assert bf.contains(keys).all()
    other = np.array([f"other-{i}" for i in range(1000)], dtype=object)
    assert bf.contains(other).mean() < 0.01


def test_bloom_semi_join_exact_vs_unverified(ray_session):
    import pyarrow.dataset as pads
    import ray.data as rd

    orders = rd.read_parquet(ORDERS, columns=["o_orderkey", "o_custkey"])
    keys = rd.read_parquet(CUSTOMER, columns=["c_custkey"],
                           filter=pads.field("c_mktsegment") == "BUILDING")
    want = duckdb.sql(f"""
        SELECT o_orderkey FROM '{ORDERS}'
        WHERE EXISTS (SELECT 1 FROM '{CUSTOMER}' c
                      WHERE c.c_custkey = o_custkey
                        AND c.c_mktsegment = 'BUILDING')""").fetchdf()
    got = bloom_semi_join(orders, keys, on="o_custkey", right_on="c_custkey",
                          num_partitions=4).to_pandas()
    assert set(got.o_orderkey) == set(want.o_orderkey)
    # unverified prefilter: a SUPERSET containing every true match
    pre = bloom_semi_join(orders, keys, on="o_custkey", right_on="c_custkey",
                          verify=False).to_pandas()
    assert set(want.o_orderkey) <= set(pre.o_orderkey)
    assert len(pre) >= len(want)


def test_bloom_anti_join_never_drops_novel_rows(ray_session):
    """Exactness under FPs: with a tiny bloom (high FP rate) the anti
    join still returns exactly the true non-members — false positives
    only route rows through the verify path."""
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.joins import bloom_anti_join

    big = rd.from_arrow(pa.table({"k": pa.array(range(2000), type=pa.int64())}))
    seen = rd.from_arrow(pa.table({"k": pa.array(range(0, 2000, 2),
                                                 type=pa.int64())}))
    # 2 bits/key → FP rate ~60%: the exactness must come from the verify
    out = bloom_anti_join(big, seen, on="k", bits_per_key=2,
                          num_partitions=4).to_pandas()
    assert set(out.k) == set(range(1, 2000, 2))


def test_semi_anti_composite_keys(ray_session):
    """Composite-key broadcast probe (VERDICT r3 #4): hash prefilter +
    merge verify must equal an exact pandas tuple filter — int×string
    keys, both directions, including a key absent from the big side."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from featureextraction_jl_ray.stages.joins import anti_join, semi_join

    rng = np.random.default_rng(11)
    n = 5000
    big = pd.DataFrame({
        "k1": rng.integers(0, 50, n),
        "k2": rng.choice(list("abcdefgh"), n),
        "val": rng.standard_normal(n),
    })
    keys = pd.DataFrame({
        "k1": [1, 1, 7, 49, 12, 12],
        "k2": ["a", "b", "c", "h", "z", "z"],  # ('12','z') absent; dup row
    })
    ds = ray_session.data.from_pandas(big).repartition(4)
    want = set(map(tuple, keys[["k1", "k2"]].itertuples(index=False)))
    in_mask = [
        (a, b) in want for a, b in zip(big.k1, big.k2)
    ]
    got_semi = semi_join(ds, keys, on=["k1", "k2"]).to_pandas()
    got_anti = anti_join(ds, keys, on=["k1", "k2"]).to_pandas()
    assert len(got_semi) == sum(in_mask) > 0
    assert len(got_anti) == n - sum(in_mask)
    assert sorted(got_semi.val) == sorted(big.val[np.array(in_mask)])
    assert all((a, b) in want for a, b in zip(got_semi.k1, got_semi.k2))
    assert not any((a, b) in want for a, b in zip(got_anti.k1, got_anti.k2))
