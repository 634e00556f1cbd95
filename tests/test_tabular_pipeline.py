"""Composed tabular feature-prep: fit-on-train-only leakage contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from featureextraction_jl_ray.pipelines.tabular import run_feature_prep

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _run(df, ray):
    import ray.data as rd

    out, model = run_feature_prep(rd.from_pandas(df))
    return out.to_pandas().sort_values("event_id", ignore_index=True), model


def test_fit_uses_train_rows_only(ray_session):
    """Perturbing a NON-train row's value must leave every fitted
    quantity (te map, scaling moments) unchanged; perturbing a train
    row must move them.  This is the tabular analog of the engine's
    zero-temporal-leakage perturbation test."""
    df = pd.read_parquet(
        EVENTS, columns=["event_id", "user_id", "event_type", "value"]
    )
    base, model = _run(df, ray_session)
    split_of = base.set_index("event_id")["split"]

    # sf0.001 has few users — some split may be empty; any non-train works
    val_eid = base.loc[base["split"] != "train", "event_id"].iloc[0]
    trn_eid = base.loc[base["split"] == "train", "event_id"].iloc[0]

    bumped = df.copy()
    bumped.loc[bumped["event_id"] == val_eid, "value"] += 1e6
    pert_val, model_v = _run(bumped, ray_session)
    # fitted stats identical; only the perturbed row's own z/te change
    assert model_v["moments"].n == model["moments"].n
    np.testing.assert_array_equal(model_v["moments"].mean, model["moments"].mean)
    np.testing.assert_array_equal(
        model_v["enc"].column("__te").to_numpy(),
        model["enc"].column("__te").to_numpy(),
    )
    same = base["event_id"] != val_eid
    np.testing.assert_array_equal(
        pert_val.loc[same, "value_z"].to_numpy(),
        base.loc[same, "value_z"].to_numpy(),
    )

    bumped = df.copy()
    bumped.loc[bumped["event_id"] == trn_eid, "value"] += 1e6
    _, model_t = _run(bumped, ray_session)
    assert not np.array_equal(model_t["moments"].mean, model["moments"].mean)

    # split labels are a pure function of user_id — never perturbed
    assert (pert_val.set_index("event_id")["split"] == split_of).all()


def test_output_schema_and_onehot_partition(ray_session):
    df = pd.read_parquet(
        EVENTS, columns=["event_id", "user_id", "event_type", "value"]
    )
    out, model = _run(df, ray_session)
    oh_cols = [c for c in out.columns if c.startswith("event_type_")
               and c != "event_type_te"]
    assert sorted(oh_cols) == [f"event_type_{c}" for c in model["categories"]]
    # rows whose category was seen in train one-hot to exactly one column
    seen = out["event_type"].isin(model["categories"])
    assert (out.loc[seen, oh_cols].sum(axis=1) == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert "train" in set(out["split"])
