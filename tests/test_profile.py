"""Column profiler vs DuckDB describe-style aggregates, including a
null-bearing column (the profile's reason to exist)."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa


def test_profile_with_nulls_vs_duckdb(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.profile import profile_columns

    t = pa.table({
        "x": pa.array([1.0, None, 3.0, 3.0, None], type=pa.float64()),
        "s": pa.array(["a", "b", None, "a", "a"]),
    })
    got = profile_columns(rd.from_arrow(t)).set_index("column")
    con = duckdb.connect()
    con.register("t", t)
    w = con.execute("""
        SELECT count(*) n, count(*) FILTER (x IS NULL) nn,
               count(DISTINCT x) nd, min(x) mn, max(x) mx,
               avg(x) mean, stddev_samp(x) std FROM t""").fetchone()
    r = got.loc["x"]
    assert (r.n, r.n_null, r.n_distinct) == (w[0], w[1], w[2])
    np.testing.assert_allclose(np.array([r["vmin"], r["vmax"], r["mean"], r["std"]], dtype=float),
                               np.array(w[3:], dtype=float), rtol=1e-9)
    rs = got.loc["s"]
    assert (rs.n, rs.n_null, rs.n_distinct) == (5, 1, 2)
    assert np.isnan(float(rs["vmin"])) and np.isnan(float(rs["mean"]))
