"""bucketed_hash_join (task-based big-big equi-join) vs a pandas-merge
oracle: inner / left-outer semantics, suffix collision, composite keys,
one-sided buckets, and plan equivalence with the native hash_join on
real tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from featureextraction_jl_ray.stages.joins import bucketed_hash_join

ORDERS = "/root/testdata/sf0.01/orders.parquet"
CUSTOMER = "/root/testdata/sf0.01/customer.parquet"


def _frames(seed=0, n_left=500, n_right=120):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, 200, n_left).astype(np.int64),
        "v": rng.normal(size=n_left).round(6),
        # collides with a right column name → suffix path
        "tag": [f"L{i}" for i in range(n_left)],
    })
    right = pd.DataFrame({
        # keys 100..299: half match, half don't; some left keys unmatched
        "rk": np.arange(100, 100 + n_right).astype(np.int64),
        "w": rng.normal(size=n_right).round(6),
        "tag": [f"R{i}" for i in range(n_right)],
    })
    return left, right


def _sorted(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(sorted(df.columns), ignore_index=True))


def _run(left, right, **kw):
    out = bucketed_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), **kw
    ).to_pandas()
    return _sorted(out)


def test_inner_matches_pandas(ray_session):
    left, right = _frames()
    got = _run(left, right, on="k", right_on="rk", how="inner",
               num_buckets=7)
    exp = left.merge(right, left_on="k", right_on="rk", how="inner",
                     suffixes=("", "_r")).drop(columns=["rk"])
    pd.testing.assert_frame_equal(got, _sorted(exp), check_like=True)


def test_left_outer_preserves_unmatched(ray_session):
    left, right = _frames()
    got = _run(left, right, on="k", right_on="rk", how="left",
               num_buckets=5)
    exp = left.merge(right, left_on="k", right_on="rk", how="left",
                     suffixes=("", "_r")).drop(columns=["rk"])
    assert len(got) == len(exp)
    # unmatched left rows (k < 100) appear exactly once with null right cols
    unmatched = got[got["k"] < 100]
    assert len(unmatched) == (left["k"] < 100).sum()
    assert unmatched["w"].isna().all() and unmatched["tag_r"].isna().all()
    pd.testing.assert_frame_equal(got, _sorted(exp), check_like=True)


def test_composite_key(ray_session):
    rng = np.random.default_rng(3)
    left = pd.DataFrame({"a": rng.integers(0, 10, 300).astype(np.int64),
                         "b": rng.integers(0, 10, 300).astype(np.int64),
                         "x": np.arange(300)})
    right = pd.DataFrame({"a": np.repeat(np.arange(10), 10).astype(np.int64),
                          "b": np.tile(np.arange(10), 10).astype(np.int64),
                          "y": np.arange(100) * 2})
    got = _run(left, right, on=["a", "b"], how="inner", num_buckets=4)
    exp = left.merge(right, on=["a", "b"], how="inner")
    pd.testing.assert_frame_equal(got, _sorted(exp), check_like=True)


def test_empty_right_side(ray_session):
    left, right = _frames()
    empty = right.iloc[:0]
    got_inner = _run(left, empty, on="k", right_on="rk", how="inner",
                     num_buckets=4)
    # fully-empty result: Ray 2.49 elides the schema at the boundary
    # (test_empty_inputs.py convention) — zero rows is the contract
    assert len(got_inner) == 0
    got_left = _run(left, empty, on="k", right_on="rk", how="left",
                    num_buckets=4)
    assert len(got_left) == len(left)
    assert got_left["w"].isna().all()


def test_matches_native_join_on_real_tables(ray_session):
    orders = rd.read_parquet(ORDERS, columns=["o_custkey", "o_totalprice"])
    cust = rd.read_parquet(CUSTOMER, columns=["c_custkey", "c_mktsegment"])
    got = bucketed_hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="inner",
        num_buckets=8,
    ).to_pandas()
    exp = pd.read_parquet(ORDERS, columns=["o_custkey", "o_totalprice"]).merge(
        pd.read_parquet(CUSTOMER, columns=["c_custkey", "c_mktsegment"]),
        left_on="o_custkey", right_on="c_custkey", how="inner",
    ).drop(columns=["c_custkey"])
    pd.testing.assert_frame_equal(_sorted(got), _sorted(exp), check_like=True)


# ---------------------------------------------------------------- coalesce


def test_coalesce_lookup_levels(ray_session):
    import pyarrow as pa

    from featureextraction_jl_ray.stages.joins import coalesce_lookup

    facts = pd.DataFrame({
        "fid": np.arange(6, dtype=np.int64),
        "ent": np.array([1, 2, 3, 1, 9, 9], dtype=np.int64),
        "cat": ["a", "b", "c", "c", "b", "z"],
    })
    lv_ent = pa.table({"ent": pa.array([1, 2], type=pa.int64()),
                       "v": pa.array([10, 20], type=pa.int64())})
    lv_cat = pa.table({"cat": pa.array(["b", "c"], type=pa.string()),
                       "v": pa.array([100, 200], type=pa.int64())})
    out = coalesce_lookup(
        rd.from_arrow(pa.Table.from_pandas(facts)),
        [(lv_ent, "ent", "v"), (lv_cat, "cat", "v")],
        out_col="rate", default=np.int64(-1),
    ).to_pandas().sort_values("fid", ignore_index=True)
    # ent override wins over cat; cat catches the rest; default at the end
    assert out.rate.tolist() == [10, 20, 200, 10, 100, -1]


def test_coalesce_lookup_null_without_default(ray_session):
    import pyarrow as pa

    from featureextraction_jl_ray.stages.joins import coalesce_lookup

    facts = pd.DataFrame({"fid": np.arange(3, dtype=np.int64),
                          "ent": np.array([7, 8, 1], dtype=np.int64)})
    lv = pa.table({"ent": pa.array([1], type=pa.int64()),
                   "v": pa.array([5], type=pa.int64())})
    out = coalesce_lookup(rd.from_arrow(pa.Table.from_pandas(facts)),
                          [(lv, "ent", "v")], out_col="rate"
                          ).to_pandas().sort_values("fid", ignore_index=True)
    assert out.rate.isna().tolist() == [True, True, False]
    assert out.rate.iloc[2] == 5
