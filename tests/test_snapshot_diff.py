"""snapshot_diff (table-version delta / CDC) vs a pandas outer-merge
oracle: added/removed/changed classification, null-safe compares,
multi-column keys, multiple compare columns, empty deltas, and the
loud duplicate-key guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from featureextraction_jl_ray.stages.diff import snapshot_diff


def _sorted(df):
    return (df.reindex(sorted(df.columns), axis=1)
              .sort_values(sorted(df.columns), ignore_index=True))


def _oracle(old, new, key_cols, compare_cols):
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    compare_cols = ([compare_cols] if isinstance(compare_cols, str)
                    else list(compare_cols))
    m = old.merge(new, on=key_cols, how="outer", indicator=True,
                  suffixes=("_old", "_new"))
    added = (m["_merge"] == "right_only").to_numpy()
    removed = (m["_merge"] == "left_only").to_numpy()
    differs = np.zeros(len(m), dtype=bool)
    for c in compare_cols:
        a, b = m[f"{c}_old"], m[f"{c}_new"]
        differs |= (~((a == b) | (a.isna() & b.isna()))).to_numpy()
    changed = (m["_merge"] == "both").to_numpy() & differs
    keep = added | removed | changed
    out = m.loc[keep, key_cols].reset_index(drop=True)
    out["change"] = np.select([added[keep], removed[keep]],
                              ["added", "removed"], "changed")
    for c in compare_cols:
        out[f"old_{c}"] = m.loc[keep, f"{c}_old"].reset_index(drop=True)
        out[f"new_{c}"] = m.loc[keep, f"{c}_new"].reset_index(drop=True)
    return _sorted(out)


def _run(old, new, key_cols, compare_cols, **kw):
    got = snapshot_diff(rd.from_pandas(old), rd.from_pandas(new),
                        key_cols, compare_cols=compare_cols, **kw)
    return _sorted(got.to_pandas())


def _frames(seed=0, n=400):
    rng = np.random.default_rng(seed)
    old = pd.DataFrame({
        "k": np.arange(n, dtype=np.int64),
        "v": rng.normal(size=n).round(6),
        "s": [f"s{i % 17}" for i in range(n)],
    })
    new = old.copy()
    # remove a slice, change a slice, add new keys
    new = new[new.k % 7 != 3].reset_index(drop=True)
    chg = (new.k % 5 == 0).to_numpy()
    new.loc[chg, "v"] = new.loc[chg, "v"] + 1.0
    add = pd.DataFrame({
        "k": np.arange(n, n + 25, dtype=np.int64),
        "v": rng.normal(size=25).round(6),
        "s": ["new"] * 25,
    })
    return old, pd.concat([new, add], ignore_index=True)


def test_matches_pandas_oracle(ray_session):
    old, new = _frames()
    got = _run(old, new, "k", ["v", "s"], num_buckets=9)
    want = _oracle(old, new, "k", ["v", "s"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_change_labels(ray_session):
    old, new = _frames()
    got = _run(old, new, "k", ["v", "s"], num_buckets=5)
    by_change = got.groupby("change").size()
    assert by_change.get("removed", 0) == (old.k % 7 == 3).sum()
    assert by_change.get("added", 0) == 25
    # changed rows carry both sides; added/removed carry one side + nulls
    ch = got[got.change == "changed"]
    assert (ch.old_v + 1.0 == ch.new_v).all()
    assert got.loc[got.change == "added", "old_v"].isna().all()
    assert got.loc[got.change == "removed", "new_v"].isna().all()


def test_null_safe_compare(ray_session):
    # null vs null is EQUAL (dropped); null vs value is changed
    old = pd.DataFrame({"k": [1, 2, 3], "v": [None, None, 1.0]})
    new = pd.DataFrame({"k": [1, 2, 3], "v": [None, 5.0, 1.0]})
    got = _run(old, new, "k", "v", num_buckets=3)
    assert got.k.tolist() == [2]
    assert got.change.tolist() == ["changed"]


def test_composite_key(ray_session):
    old = pd.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "x"],
                        "v": [1.0, 2.0, 3.0]})
    new = pd.DataFrame({"a": [1, 2, 2], "b": ["x", "x", "y"],
                        "v": [9.0, 3.0, 4.0]})
    got = _run(old, new, ["a", "b"], "v", num_buckets=4)
    want = _oracle(old, new, ["a", "b"], "v")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_identical_snapshots_empty_delta(ray_session):
    old, _ = _frames(seed=3)
    got = snapshot_diff(rd.from_pandas(old), rd.from_pandas(old), "k",
                        compare_cols="v", num_buckets=4)
    assert got.count() == 0


def test_duplicate_key_is_loud(ray_session):
    old = pd.DataFrame({"k": [1, 1], "v": [1.0, 2.0]})
    new = pd.DataFrame({"k": [1], "v": [1.0]})
    with pytest.raises(Exception, match="duplicate key"):
        _run(old, new, "k", "v", num_buckets=2)
