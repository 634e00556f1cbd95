"""Guarded/distributed grouping sets (VERDICT r2 №3): the rollup/cube
driver pull must be loud past ``max_rows`` and the Dataset fallback must
re-aggregate distributed with identical results."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.groupagg import (
    cube_aggregate,
    rollup_aggregate,
)


def _norm(df: pd.DataFrame, keys) -> pd.DataFrame:
    df = df.copy()
    for k in keys:
        # int64 keys become float64 after null-padding in pandas — render
        # both paths to the same canonical string
        df[k] = df[k].map(
            lambda x: "∅" if pd.isna(x)
            else str(int(x)) if isinstance(x, (int, float, np.integer,
                                               np.floating))
            else str(x))
    return df.sort_values([*keys], ignore_index=True)


def _events(ray, n_keys: int, rows_per_key: int = 1):
    rng = np.random.default_rng(11)
    k1 = np.repeat(np.arange(n_keys, dtype=np.int64), rows_per_key)
    k2 = (k1 % 7).astype(np.int64)
    v = rng.standard_normal(len(k1))
    return ray.data.from_arrow(
        pa.table({"k1": pa.array(k1), "k2": pa.array(k2),
                  "v": pa.array(v)})
    ).repartition(4)


def test_rollup_dataset_path_equals_pandas(ray_session):
    ds = _events(ray_session, 50, rows_per_key=3)
    aggs = {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")}
    got_pd = rollup_aggregate(ds, ["k2", "k1"], aggs, num_buckets=4)
    got_ds = rollup_aggregate(ds, ["k2", "k1"], aggs, num_buckets=4,
                              output="dataset")
    assert not isinstance(got_pd, type(got_ds))
    a = _norm(got_pd, ["k2", "k1"])
    b = _norm(got_ds.to_pandas(), ["k2", "k1"])
    assert len(a) == len(b) == 50 + 7 + 1
    np.testing.assert_array_equal(a.k2.to_numpy(), b.k2.to_numpy())
    np.testing.assert_array_equal(a.n.to_numpy(int), b.n.to_numpy(int))
    np.testing.assert_allclose(a.s.to_numpy(float), b.s.to_numpy(float),
                               rtol=1e-12)
    np.testing.assert_allclose(a.mx.to_numpy(float), b.mx.to_numpy(float),
                               rtol=1e-12)


def test_cube_dataset_path_equals_pandas(ray_session):
    ds = _events(ray_session, 20, rows_per_key=2)
    aggs = {"n": ("v", "count"), "s": ("v", "sum")}
    got_pd = cube_aggregate(ds, ["k2", "k1"], aggs, num_buckets=4)
    got_ds = cube_aggregate(ds, ["k2", "k1"], aggs, num_buckets=4,
                            output="dataset").to_pandas()
    a = _norm(got_pd, ["k2", "k1"])
    b = _norm(got_ds, ["k2", "k1"])
    assert len(a) == len(b) == 20 + 7 + 20 + 1  # (k2,k1),(k2),(k1),()
    np.testing.assert_array_equal(a.n.to_numpy(int), b.n.to_numpy(int))
    np.testing.assert_allclose(a.s.to_numpy(float), b.s.to_numpy(float),
                               rtol=1e-12)


def test_rollup_guard_and_high_cardinality(ray_session):
    """≥10⁶ finest keys: 'pandas' output raises loudly, 'auto' switches
    to the Dataset path and completes with the right level row counts —
    no driver materialization of the finest level."""
    n = 1_000_000
    ds = _events(ray_session, n)
    aggs = {"n": ("v", "count"), "s": ("v", "sum")}
    with pytest.raises(RuntimeError, match="max_rows"):
        rollup_aggregate(ds, ["k1"], aggs, num_buckets=16,
                         max_rows=100_000, output="pandas")
    out = rollup_aggregate(ds, ["k1"], aggs, num_buckets=16,
                           max_rows=100_000, output="auto")
    assert not isinstance(out, pd.DataFrame)
    assert out.count() == n + 1
    total = out.filter(lambda r: r["k1"] is None).to_pandas()
    assert len(total) == 1 and total.n.iloc[0] == n


def test_grouped_string_agg_vs_duckdb(ray_session):
    """Ordered per-key concatenation: distinct + null skipping + value
    ordering, vs DuckDB's string_agg on the same frame."""
    import duckdb

    from featureextraction_jl_ray.stages.groupagg import grouped_string_agg

    rng = np.random.default_rng(5)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n),
        "v": pd.array(
            [None if i % 17 == 0 else f"t{int(x)}"
             for i, x in enumerate(rng.integers(0, 9, n))],
            dtype="string"),
    })
    ds = ray_session.data.from_pandas(df).repartition(4)

    for distinct in (False, True):
        got = (grouped_string_agg(ds, "k", "v", sep="|", out_col="agg",
                                  distinct=distinct, num_buckets=4)
               .to_pandas().sort_values("k", ignore_index=True))
        d = "DISTINCT " if distinct else ""
        want = duckdb.sql(
            f"SELECT k, string_agg({d}v, '|' ORDER BY v) AS agg "
            "FROM df GROUP BY k ORDER BY k").fetchdf()
        # keys whose values are all-null drop out engine-side (no row to
        # emit) but SQL emits NULL agg — align on the SQL frame
        want = want[want["agg"].notna()].reset_index(drop=True)
        assert got["k"].tolist() == want["k"].tolist()
        assert got["agg"].tolist() == want["agg"].tolist(), distinct
