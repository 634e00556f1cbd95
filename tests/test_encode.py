"""Target / frequency encoding vs pandas + DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.encode import (
    fit_target_encoding,
    frequency_encode,
    target_encode,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(EVENTS, columns=["event_id", "event_type", "value"])


def test_target_encode_plain_mean(events_ds):
    out = target_encode(events_ds, "event_type", "value",
                        freq_col="event_type_freq").to_pandas()
    want = duckdb.sql(
        f"""
        SELECT e.event_id, a.m, a.n
        FROM '{EVENTS}' e
        JOIN (SELECT event_type, avg(value) m, count(*) n
              FROM '{EVENTS}' GROUP BY event_type) a USING (event_type)
        ORDER BY e.event_id
        """
    ).fetchdf()
    out = out.sort_values("event_id", ignore_index=True)
    np.testing.assert_allclose(out["event_type_te"], want["m"], rtol=1e-12)
    np.testing.assert_array_equal(out["event_type_freq"], want["n"])


def test_target_encode_smoothing_and_prefit_apply(events_ds, ray_session):
    import pyarrow as pa
    import ray.data as rd

    df = pd.read_parquet(EVENTS, columns=["event_type", "value"])
    m = 25.0
    prior = df["value"].mean()
    g = df.groupby("event_type")["value"].agg(["sum", "count"])
    want = ((g["sum"] + m * prior) / (g["count"] + m)).to_dict()
    enc = fit_target_encoding(events_ds, "event_type", "value", smoothing=m)
    got = dict(
        zip(enc.column("event_type").to_pylist(),
            enc.column("__te").to_pylist())
    )
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9
    # apply a TRAIN-fitted map to new rows; unseen category → null
    new = rd.from_arrow(
        pa.table({"event_type": ["click", "never_seen"], "x": [1, 2]})
    )
    rows = {r["event_type"]: r for r in
            target_encode(new, "event_type", "value", enc=enc).take_all()}
    assert abs(rows["click"]["event_type_te"] - want["click"]) < 1e-9
    assert rows["never_seen"]["event_type_te"] is None


def test_frequency_encode(events_ds):
    out = frequency_encode(events_ds.select_columns(["event_id", "event_type"]),
                           "event_type").to_pandas()
    counts = pd.read_parquet(EVENTS)["event_type"].value_counts()
    got = out.drop_duplicates("event_type").set_index("event_type")[
        "event_type_freq"
    ]
    for k in counts.index:
        assert got[k] == counts[k]


def test_pivot_aggregate_vs_duckdb(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import pivot_aggregate

    ds = rd.read_parquet(EVENTS, columns=["user_id", "event_type", "value"])
    out = pivot_aggregate(ds, "user_id", "event_type", "value",
                          aggs=("count", "sum"), prefix="et",
                          num_buckets=8).to_pandas()
    cats = sorted(duckdb.sql(
        f"SELECT DISTINCT event_type FROM '{EVENTS}'").fetchdf()["event_type"])
    sel = ",\n".join(
        f"count(*) FILTER (event_type = '{c}') AS et_{c}_n,"
        f"sum(CASE WHEN event_type = '{c}' THEN value ELSE 0 END) AS et_{c}_sum"
        for c in cats
    )
    want = duckdb.sql(
        f"SELECT user_id, {sel} FROM '{EVENTS}' GROUP BY user_id ORDER BY user_id"
    ).fetchdf()
    out = out.sort_values("user_id", ignore_index=True)
    assert len(out) == len(want)
    for c in cats:
        np.testing.assert_array_equal(out[f"et_{c}_n"], want[f"et_{c}_n"])
        np.testing.assert_allclose(out[f"et_{c}_sum"], want[f"et_{c}_sum"],
                                   rtol=1e-9, atol=1e-9)


def test_pivot_aggregate_pinned_vocab_unknown_zero(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import pivot_aggregate

    t = pa.table({"k": [1, 1, 2], "cat": ["a", "zz", "a"],
                  "v": [1.0, 5.0, 2.0]})
    out = pivot_aggregate(rd.from_arrow(t), "k", "cat", "v",
                          aggs=("count", "sum"), categories=["a", "b"],
                          prefix="p", num_buckets=2).to_pandas()
    out = out.sort_values("k", ignore_index=True)
    # unknown category 'zz' contributes to NO pinned column; 'b' is all-zero
    assert list(out.columns) == ["k", "p_a_n", "p_a_sum", "p_b_n", "p_b_sum"]
    np.testing.assert_array_equal(out["p_a_n"], [1, 1])
    np.testing.assert_allclose(out["p_a_sum"], [1.0, 2.0])
    np.testing.assert_array_equal(out["p_b_n"], [0, 0])
    np.testing.assert_allclose(out["p_b_sum"], [0.0, 0.0])


def test_cross_encode_unknowns_null(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import cross_encode

    t = pa.table({"a": ["x", "y", "zz"], "b": ["p", "q", "p"]})
    out = cross_encode(rd.from_arrow(t), "a", "b",
                       categories_a=["x", "y"], categories_b=["p", "q"],
                       out_col="c").to_pandas()
    # idx(x)=0, idx(y)=1; |Vb|=2; idx(p)=0, idx(q)=1; unknown 'zz' → null
    assert list(out.c[:2]) == [0, 3]
    assert pd.isna(out.c.iloc[2])


def test_melt_pivot_roundtrip(ray_session):
    """melt (wide→long) then pivot_aggregate (long→wide sums) equals a
    direct grouped sum of the original wide columns."""
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import pivot_aggregate
    from featureextraction_jl_ray.stages.reshape import melt

    rng = np.random.default_rng(2)
    t = pa.table({"k": pa.array(rng.integers(0, 5, 100), type=pa.int64()),
                  "a": rng.normal(size=100), "b": rng.normal(size=100)})
    long = melt(rd.from_arrow(t), "k", ["a", "b"], var_name="m",
                value_name="v")
    wide = pivot_aggregate(long, "k", "m", "v", aggs=("sum",),
                           categories=["a", "b"], prefix="p",
                           num_buckets=4).to_pandas()
    wide = wide.sort_values("k", ignore_index=True)
    ref = (t.to_pandas().groupby("k")[["a", "b"]].sum().reset_index()
           .sort_values("k", ignore_index=True))
    np.testing.assert_allclose(wide.p_a_sum, ref.a, rtol=1e-9)
    np.testing.assert_allclose(wide.p_b_sum, ref.b, rtol=1e-9)


def test_hashed_cross_fold_and_radix_guard(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.encode import hashed_cross
    from featureextraction_jl_ray.stages.split import hash_u32

    t = pa.table({
        "a": pa.array([0, 1, 5, 1 << 40], type=pa.int64()),
        "b": pa.array([0, 23, 7, 11], type=pa.int64()),
    })
    out = (hashed_cross(rd.from_arrow(t), ["a", "b"], [24], num_buckets=64)
           .to_pandas())
    key = t.column("a").to_numpy() * 24 + t.column("b").to_numpy()
    want = (hash_u32(key) % np.uint64(64)).astype(np.int64)
    assert out["a_x_b_bucket"].tolist() == want.tolist()
    # out-of-radix value must be LOUD, not a silent alias
    bad = pa.table({"a": pa.array([1], type=pa.int64()),
                    "b": pa.array([24], type=pa.int64())})
    with pytest.raises(Exception, match="radix"):
        hashed_cross(rd.from_arrow(bad), ["a", "b"], [24],
                     num_buckets=64).to_pandas()
    with pytest.raises(ValueError, match="one radix"):
        hashed_cross(rd.from_arrow(bad), ["a", "b"], [], num_buckets=4)
