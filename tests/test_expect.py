"""Declarative expectations engine vs hand-counted violations: every
rule kind, null handling, the expr escape hatch, multi-block partial
merging, and the uniqueness exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from featureextraction_jl_ray.stages.expect import expect


def _ds(df, blocks=3):
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


def _frame():
    return pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 5],               # one duplicate id
        "v": [1.0, None, 50.0, 200.0, -3.0, 7.0],
        "cat": ["a", "b", "zz", None, "a", "b"],
    })


def test_all_rule_kinds(ray_session):
    got = expect(_ds(_frame()), [
        ("not_null", "v"),
        ("in_range", "v", 0.0, 100.0),
        ("in_set", "cat", ["a", "b"]),
        ("matches", "cat", "[ab]"),
        ("unique", "id"),
    ]).set_index(["rule", "column"])
    assert got.loc[("not_null", "v"), "violations"] == 1
    # null, 200, -3 violate the range
    assert got.loc[("in_range", "v"), "violations"] == 3
    # 'zz' and null violate the set
    assert got.loc[("in_set", "cat"), "violations"] == 2
    assert got.loc[("matches", "cat"), "violations"] == 2
    assert got.loc[("unique", "id"), "violations"] == 1
    assert (got["evaluated"] == 6).all()
    assert got.loc[("unique", "id"), "pass_rate"] == 1.0 - 1.0 / 6.0


def test_expr_escape_hatch(ray_session):
    def even_ids(t: pa.Table):
        return (t.column("id").to_numpy(zero_copy_only=False) % 2) == 0

    got = expect(_ds(_frame()), [("expr", "even_ids", even_ids)])
    # ids [1,2,3,4,5,5]: the four odd values violate
    assert got.violations.item() == 4
    assert got["rule"].item() == "expr" and got["column"].item() == "even_ids"


def test_block_invariance(ray_session):
    df = pd.DataFrame({"v": np.arange(1000, dtype=np.float64)})
    rules = [("in_range", "v", 0.0, 499.0)]
    a = expect(_ds(df, blocks=1), rules)
    b = expect(_ds(df, blocks=17), rules)
    pd.testing.assert_frame_equal(a, b)
    assert a.violations.item() == 500


def test_full_match_not_substring(ray_session):
    df = pd.DataFrame({"s": ["ab", "xaby", "b"]})
    got = expect(_ds(df, blocks=1), [("matches", "s", "ab?")])
    # full-match: 'ab' ok, 'b' ok via ab? → wait 'ab?' matches 'a' or 'ab';
    # 'b' does NOT match, 'xaby' does not (substring would)
    assert got.violations.item() == 2


def test_unknown_rule_is_loud(ray_session):
    with pytest.raises(ValueError, match="unknown rule"):
        expect(_ds(_frame()), [("frobnicate", "v")])
