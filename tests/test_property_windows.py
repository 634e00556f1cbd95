"""Hypothesis property tests for the pure window kernel (SURVEY §5.2):
random per-entity event streams vs a DuckDB window-SQL oracle, no Ray
launch per example (the kernel is the same code the fused as-of stage
runs inside each bucket)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from featureextraction_jl_ray.stages.window import make_windows_frame_fn


@st.composite
def event_frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    n_entities = draw(st.integers(min_value=1, max_value=4))
    ents = draw(st.lists(st.integers(0, n_entities - 1), min_size=n, max_size=n))
    # tie-heavy timestamps (seconds) to exercise equal-ts ordering
    offs = draw(st.lists(st.integers(0, 30), min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n))
    df = pd.DataFrame({
        "eid": np.array(ents, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.array(offs, dtype=np.int64), unit="s"),
        "v": np.array(vals, dtype=np.float64),
        "rid": np.arange(n, dtype=np.int64),
    })
    return df.sort_values(["eid", "ts", "rid"], ignore_index=True)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(event_frames())
def test_lag_backfill_sessionize_match_duckdb(df):
    fn = make_windows_frame_fn("eid", "ts", lag_cols=["v"], lag_k=1,
                               session_gap="5s")
    got = fn(df.copy())
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT rid, lag1_v,
               CAST(sum(is_new) OVER (PARTITION BY eid ORDER BY ts, rid
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
        FROM (
          SELECT rid, eid, ts,
                 lag(v) OVER w AS lag1_v,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 5 SECOND
                      THEN 1 ELSE 0 END AS is_new
          FROM t
          WINDOW w AS (PARTITION BY eid ORDER BY ts, rid)
        )
        ORDER BY rid
    """).fetchdf()
    got = got.sort_values("rid", ignore_index=True)
    lag_g = got["lag1_v"].to_numpy()
    lag_w = want["lag1_v"].to_numpy()
    both_nan = np.isnan(lag_g) & np.isnan(lag_w)
    assert ((lag_g == lag_w) | both_nan).all()
    assert (got["session_id"].to_numpy() == want["session_id"].to_numpy()).all()


@settings(max_examples=60, deadline=None, derandomize=True)
@given(event_frames())
def test_rolling_trailing_window_matches_duckdb(df):
    """Trailing time-window count/sum/max vs DuckDB RANGE frames on
    tie-heavy timestamps.  SQL RANGE frames include current-row PEERS
    (equal-ts rows after the current one), so the engine runs in
    ties="peers" mode here; the streaming default (ties="row", no
    lookahead) is pinned by the next test.  This split was FOUND by this
    property test — a two-equal-ts-rows example falsified the naive
    row-mode comparison."""
    from featureextraction_jl_ray.stages.window import make_windows_frame_fn

    fn = make_windows_frame_fn(
        "eid", "ts",
        rolling={"value_col": "v", "window": "5s",
                 "aggs": ("count", "sum", "max"), "prefix": "roll_",
                 "ties": "peers"},
    )
    got = fn(df.copy()).sort_values("rid", ignore_index=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT rid,
               count(v) OVER w AS roll_count,
               sum(v)   OVER w AS roll_sum,
               max(v)   OVER w AS roll_max
        FROM t WINDOW w AS (PARTITION BY eid ORDER BY ts
                            RANGE BETWEEN INTERVAL 5 SECOND PRECEDING
                            AND CURRENT ROW)
        ORDER BY rid
    """).fetchdf()
    for c in ("roll_count", "roll_sum", "roll_max"):
        g = got[c].to_numpy(dtype=float)
        w = want[c].to_numpy(dtype=float)
        both_nan = np.isnan(g) & np.isnan(w)
        assert ((g == w) | both_nan).all(), c


@settings(max_examples=60, deadline=None, derandomize=True)
@given(event_frames())
def test_rolling_row_mode_is_streaming_prefix(df):
    """ties="row" (the streaming default): row i's window is exactly the
    rows 0..i of its entity within [t−w, t] — verified against a direct
    O(n²) reference scan (no lookahead, ever)."""
    from featureextraction_jl_ray.stages.window import make_windows_frame_fn

    fn = make_windows_frame_fn(
        "eid", "ts",
        rolling={"value_col": "v", "window": "5s",
                 "aggs": ("count", "sum"), "prefix": "roll_"},
    )
    got = fn(df.copy())
    w = pd.Timedelta("5s")
    for i in range(len(df)):
        e, t = df.eid.iloc[i], df.ts.iloc[i]
        prev = df.iloc[: i + 1]
        sel = prev[(prev.eid == e) & (prev.ts >= t - w) & (prev.ts <= t)]
        assert got.roll_count.iloc[i] == len(sel)
        assert abs(got.roll_sum.iloc[i] - sel.v.sum()) < 1e-9


@settings(max_examples=60, deadline=None, derandomize=True)
@given(event_frames())
def test_forward_rolling_matches_duckdb(df):
    """FORWARD label window [ts, ts+5s] vs DuckDB's CURRENT ROW …
    FOLLOWING RANGE frame on tie-heavy timestamps (peers mode — the
    frame includes equal-ts peers BEFORE the current row too)."""
    from featureextraction_jl_ray.stages.window import _rolling_frame

    got = _rolling_frame(df.copy(), "eid", "ts", "v", "5s",
                         ("count", "sum", "max"), "fwd_",
                         ties="peers", direction="forward")
    got = got.sort_values("rid", ignore_index=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT rid,
               count(v) OVER w AS fwd_count,
               sum(v)   OVER w AS fwd_sum,
               max(v)   OVER w AS fwd_max
        FROM t WINDOW w AS (PARTITION BY eid ORDER BY ts
                            RANGE BETWEEN CURRENT ROW
                            AND INTERVAL 5 SECOND FOLLOWING)
        ORDER BY rid
    """).fetchdf()
    for c in ("fwd_count", "fwd_sum", "fwd_max"):
        g = got[c].to_numpy(dtype=float)
        w = want[c].to_numpy(dtype=float)
        both_nan = np.isnan(g) & np.isnan(w)
        assert ((g == w) | both_nan).all(), c


@settings(max_examples=60, deadline=None, derandomize=True)
@given(event_frames())
def test_decayed_sum_matches_bruteforce(df):
    """Trailing exp-decayed sum vs a direct O(n²) reference (row-order
    prefix within each entity, current row included)."""
    from featureextraction_jl_ray.stages.window import _decayed_sum_frame

    tau_us = 7e6  # 7 s
    got = _decayed_sum_frame(df.copy(), "eid", "ts", "v", tau_us, "dec")
    ts = df.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    for i in range(len(df)):
        sel = (df.eid.to_numpy()[: i + 1] == df.eid.iloc[i])
        dt = (ts[i] - ts[: i + 1][sel]) / tau_us
        want = float(np.sum(df.v.to_numpy()[: i + 1][sel] * np.exp(-dt)))
        assert abs(got.dec.iloc[i] - want) <= 1e-9 * max(1.0, abs(want)), i


def test_decayed_sum_crosses_chunks():
    """Spans ≫ chunk_exponent·τ exercise the inter-chunk carry matrix."""
    from featureextraction_jl_ray.stages.window import _decayed_sum_frame

    tau_us = 1e6  # 1 s, chunk_exponent=5 → 5 s chunks
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 1, 7, 12, 33], unit="s")
    df = pd.DataFrame({"eid": np.zeros(5, np.int64), "ts": ts,
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    got = _decayed_sum_frame(df.copy(), "eid", "ts", "v", tau_us, "dec",
                             chunk_exponent=5.0)
    t = ts.astype("int64").to_numpy() / 1e9  # plain seconds
    for i in range(5):
        want = sum(df.v[j] * np.exp(-(t[i] - t[j])) for j in range(i + 1))
        np.testing.assert_allclose(got.dec.iloc[i], want, rtol=1e-12)


def test_decayed_sum_no_cross_segment_absorption():
    """A neighboring entity whose in-chunk exponents reach e^E must not
    absorb the next entity's small values (regression: global-cumsum
    segment offsets lose them to float64 absorption)."""
    from featureextraction_jl_ray.stages.window import _decayed_sum_frame

    tau_us = 1e6
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        [0, 150, 0, 1], unit="s")  # entity 0 spans 150τ; entity 1 tiny
    df = pd.DataFrame({"eid": np.array([0, 0, 1, 1], np.int64), "ts": ts,
                       "v": [1.0, 2.0, 3.0, 4.0]})
    df = df.sort_values(["eid", "ts"], ignore_index=True)
    got = _decayed_sum_frame(df.copy(), "eid", "ts", "v", tau_us, "dec")
    np.testing.assert_allclose(got.dec.to_numpy(),
                               [1.0, 2.0 + np.exp(-150.0), 3.0,
                                4.0 + 3.0 * np.exp(-1.0)], rtol=1e-12)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(st.lists(st.integers(0, 40), min_size=1, max_size=20),
       st.integers(2, 8), st.integers(1, 8))
def test_chunker_covers_every_token_exactly(token_counts, size, stride):
    """Property: with stride ≤ size every token index of every doc is
    covered, consecutive chunks overlap by exactly size − stride (except
    tails), and chunk token counts sum to n + (n_chunks−1)·overlap."""
    import pyarrow as pa

    from featureextraction_jl_ray.stages.text import chunk_documents

    stride = min(stride, size)
    texts = [" ".join(f"d{d}t{i}" for i in range(n))
             for d, n in enumerate(token_counts)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    import ray.data as rd
    out = chunk_documents(rd.from_arrow(t), size=size, stride=stride).to_pandas()
    if out.shape[1] == 0:  # all-empty Dataset loses schema (documented)
        assert all(n == 0 for n in token_counts)
        return
    for d, n in enumerate(token_counts):
        g = out[out.doc_id == d].sort_values("chunk_id")
        if n == 0:
            assert len(g) == 0
            continue
        seen = set()
        for _, row in g.iterrows():
            toks = row.chunk_text.split()
            assert len(toks) == row.n_tokens <= size
            seen.update(toks)
        assert seen == {f"d{d}t{i}" for i in range(n)}  # full coverage


def test_decayed_sum_half_life_equals_tau():
    """half_life=H is exactly tau=H/ln2 (factor-2 decay at H)."""
    from featureextraction_jl_ray.stages.window import _decayed_sum_frame

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 3600], unit="s")
    df = pd.DataFrame({"eid": np.zeros(2, np.int64), "ts": ts,
                       "v": [1.0, 0.0]})
    h_us = 3600e6
    got = _decayed_sum_frame(df.copy(), "eid", "ts", "v",
                             h_us / np.log(2.0), "dec")
    # one half-life later, the first event's unit mass has halved
    np.testing.assert_allclose(got.dec.iloc[1], 0.5, rtol=1e-12)
