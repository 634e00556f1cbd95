"""Target / frequency encoding vs pandas + DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
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
