"""Engine-semantics tests vs the DuckDB oracle (SURVEY.md §5.2 №3):
window operators and the as-of join over the driver's `events` table."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.asof import asof_join
from featureextraction_jl_ray.stages.window import (
    with_backfill,
    with_lag,
    with_rolling,
    with_sessionize,
    with_windows,
)

KEY = ["user_id", "ts", "event_id"]


@pytest.fixture(scope="module")
def db(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    return con


def events_ds(ray, sf_dir):
    return ray.data.read_parquet(f"{sf_dir}/events.parquet")


def cmp(ray_ds, oracle_df, check_cols, sort_key=KEY):
    got = ray_ds.to_pandas().sort_values(sort_key, ignore_index=True)
    want = oracle_df.sort_values(sort_key, ignore_index=True)
    assert len(got) == len(want), (len(got), len(want))
    for c in check_cols:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.to_numpy(dtype=float), w.to_numpy(dtype=float), rtol=1e-9, atol=1e-12,
                err_msg=c,
            )
        else:
            gv, wv = g.astype("object"), w.astype("object")
            gv = gv.where(pd.notna(gv), None)
            wv = wv.where(pd.notna(wv), None)
            assert (gv == wv).all(), f"mismatch in {c}"


def test_lag_lead_vs_duckdb(ray_session, sf_dir, db):
    ds = with_lag(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        ["value"],
        k=1,
        tiebreak_cols=("event_id",),
        num_buckets=16,
    )
    ds = with_lag(ds, "user_id", "ts", ["value"], k=2, lead=True,
                  tiebreak_cols=("event_id",), num_buckets=16)
    want = db.execute(
        """
        SELECT *,
          lag(value, 1) OVER w AS lag1_value,
          lead(value, 2) OVER w AS lead2_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    ).fetchdf()
    cmp(ds, want, ["lag1_value", "lead2_value"])


def test_sessionize_vs_duckdb(ray_session, sf_dir, db):
    ds = with_sessionize(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        gap="30min",
        num_buckets=16,
        tiebreak_cols=("event_id",),
    )
    want = db.execute(
        """
        SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - 1 AS session_id
        FROM (
          SELECT *, CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
          FROM events)
        """
    ).fetchdf()
    cmp(ds, want, ["session_id"])


def test_session_stats_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.window import with_session_stats

    ds = with_session_stats(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        gap="30min",
        value_col="value",
        num_buckets=16,
        tiebreak_cols=("event_id",),
    )
    want = db.execute(
        """
        WITH s AS (
          SELECT user_id, ts, value,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) - 1 AS session_id
          FROM (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               count(*) AS n_events,
               min(ts) AS t_start, max(ts) AS t_end,
               CAST(date_diff('microsecond', min(ts), max(ts)) AS DOUBLE) / 1e6
                 AS duration_secs,
               sum(value) AS sum_value
        FROM s GROUP BY user_id, session_id
        """
    ).fetchdf()
    key = ["user_id", "session_id"]
    cmp(ds, want,
        ["n_events", "t_start", "t_end", "duration_secs", "sum_value"],
        sort_key=key)


def test_rolling_vs_duckdb(ray_session, sf_dir, db):
    ds = with_rolling(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        "value",
        window="1h",
        aggs=("count", "sum", "mean", "max"),
        num_buckets=16,
        tiebreak_cols=("event_id",),
    )
    want = db.execute(
        """
        SELECT *,
          count(value) OVER w AS roll_value_count,
          sum(value)   OVER w AS roll_value_sum,
          avg(value)   OVER w AS roll_value_mean,
          max(value)   OVER w AS roll_value_max
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        """
    ).fetchdf()
    cmp(ds, want, ["roll_value_count", "roll_value_sum", "roll_value_mean", "roll_value_max"])


def test_forward_rolling_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.window import with_forward_rolling

    ds = with_forward_rolling(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        "value",
        window="1h",
        aggs=("count", "sum", "max"),
        num_buckets=16,
        tiebreak_cols=("event_id",),
        ties="peers",
    )
    want = db.execute(
        """
        SELECT *,
          count(value) OVER w AS fwd_value_count,
          sum(value)   OVER w AS fwd_value_sum,
          max(value)   OVER w AS fwd_value_max
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN CURRENT ROW AND INTERVAL 1 HOUR FOLLOWING)
        """
    ).fetchdf()
    cmp(ds, want, ["fwd_value_count", "fwd_value_sum", "fwd_value_max"])


def test_backfill_vs_duckdb(ray_session, sf_dir, db):
    # derive a sparse column: value only on 'click' rows, then ffill
    import pyarrow as pa
    import pyarrow.compute as pc

    def sparse(t: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(t["event_type"], "click"), t["value"], pa.scalar(None, pa.float64())
        )
        return t.append_column("sparse_value", v)

    ds = events_ds(ray_session, sf_dir).map_batches(sparse, batch_format="pyarrow")
    ds = with_backfill(ds, "user_id", "ts", ["sparse_value"], num_buckets=16,
                       tiebreak_cols=("event_id",))
    want = db.execute(
        """
        SELECT *, last_value(sparse_value IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS filled
        FROM (SELECT *, CASE WHEN event_type = 'click' THEN value END AS sparse_value
              FROM events)
        """
    ).fetchdf()
    got = ds.to_pandas().sort_values(KEY, ignore_index=True)
    want = want.sort_values(KEY, ignore_index=True)
    np.testing.assert_allclose(
        got["sparse_value"].to_numpy(dtype=float),
        want["filled"].to_numpy(dtype=float),
        rtol=1e-12,
    )


def test_fused_windows_single_pass(ray_session, sf_dir, db):
    ds = with_windows(
        events_ds(ray_session, sf_dir),
        "user_id",
        "ts",
        lag_cols=["value"],
        lag_k=1,
        session_gap="30min",
        rolling={"value_col": "value", "window": "1h", "aggs": ("count",)},
        num_buckets=16,
        tiebreak_cols=("event_id",),
    )
    want = db.execute(
        """
        SELECT *,
          lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag1_value,
          count(value) OVER (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            AS roll_value_count
        FROM events
        """
    ).fetchdf()
    cmp(ds, want, ["lag1_value", "roll_value_count"])


def test_asof_join_vs_duckdb(ray_session, sf_dir, db):
    """Left = all events; right = per-user 'purchase' state (unique per
    (user, ts)); attach latest purchase value at or before each event."""
    left = events_ds(ray_session, sf_dir)
    import pyarrow as pa
    import pyarrow.compute as pc

    right = (
        events_ds(ray_session, sf_dir)
        .map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
            batch_format="pyarrow",
        )
        .groupby(["user_id", "ts"])
        .max("value")
    )
    right = right.map_batches(
        lambda t: t.rename_columns(["user_id", "ts", "state_value"]),
        batch_format="pyarrow",
    )
    out = asof_join(
        left, right, on="ts", by="user_id", right_cols=["state_value"], num_buckets=16,
        left_tiebreak=("event_id",),
    )
    want = db.execute(
        """
        SELECT e.*, r.state_value
        FROM events e
        ASOF LEFT JOIN (
          SELECT user_id, ts, max(value) AS state_value
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        ) r ON e.user_id = r.user_id AND e.ts >= r.ts
        """
    ).fetchdf()
    cmp(out, want, ["state_value"])


def test_asof_tolerance_and_leakage(ray_session, sf_dir):
    """Tolerance variant + leakage probe: right rows strictly in the future
    must never be attached (BASELINE.json:6 zero temporal leakage)."""
    import pyarrow as pa

    left = ray_session.data.from_arrow(
        pa.table(
            {
                "e": ["a", "a", "b"],
                "ts": pa.array(
                    pd.to_datetime(["2024-01-01 10:00", "2024-01-01 12:00",
                                    "2024-01-01 10:00"]),
                    type=pa.timestamp("us"),
                ),
                "row": [0, 1, 2],
            }
        )
    )
    right = ray_session.data.from_arrow(
        pa.table(
            {
                "e": ["a", "a", "b"],
                "ts": pa.array(
                    pd.to_datetime(["2024-01-01 09:00", "2024-01-01 11:59",
                                    "2024-01-01 10:30"]),  # b's state is FUTURE
                    type=pa.timestamp("us"),
                ),
                "cap": ["old", "new", "LEAK_future"],
            }
        )
    )
    out = (
        asof_join(left, right, on="ts", by="e", right_cols=["cap"], num_buckets=4)
        .to_pandas()
        .sort_values("row", ignore_index=True)
    )
    assert out["cap"].tolist() == ["old", "new", None]
    # tolerance: 30min window drops the 09:00 state for the 10:00 row
    out2 = (
        asof_join(left, right, on="ts", by="e", right_cols=["cap"],
                  tolerance="30min", num_buckets=4)
        .to_pandas()
        .sort_values("row", ignore_index=True)
    )
    assert out2["cap"].tolist() == [None, "new", None]


def test_asof_empty_left_bucket_keeps_full_schema(ray_session):
    """A bucket containing ONLY right-side rows must still emit the full
    output schema (left cols + matched right cols + window_fn outputs) —
    round-1 ADVICE: the old early-return emitted a narrower, null-typed
    table and Ray warned about mismatched RefBundle schemas."""
    import pyarrow as pa

    from featureextraction_jl_ray.stages.asof import asof_join
    from featureextraction_jl_ray.stages.window import make_windows_frame_fn

    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"]).astype(
        "datetime64[us]")
    # left has only entity 0; right has entities 0..63 → with num_buckets=4
    # several buckets get right rows and no left rows
    left = ray_session.data.from_arrow(pa.table({
        "eid": pa.array([0, 0], type=pa.int64()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "v": pa.array([1.0, 2.0]),
    }))
    right = ray_session.data.from_arrow(pa.table({
        "eid": pa.array(list(range(64)), type=pa.int64()),
        "ts": pa.array([ts[0]] * 64, type=pa.timestamp("us")),
        "state": pa.array([float(i) for i in range(64)]),
    }))
    out = asof_join(
        left, right, on="ts", by="eid", right_cols=["state"], num_buckets=4,
        window_fn=make_windows_frame_fn("eid", "ts", lag_cols=("v",)),
        left_types={"eid": pa.int64(), "ts": pa.timestamp("us"), "v": pa.float64()},
        right_types_in={"eid": pa.int64(), "ts": pa.timestamp("us"),
                        "state": pa.float64()},
    )
    df = out.to_pandas()
    assert sorted(df.columns) == ["eid", "lag1_v", "state", "ts", "v"]
    assert len(df) == 2
    assert df.loc[df.v == 2.0, "state"].iloc[0] == 0.0
    schema = out.schema()
    assert set(schema.names) == {"eid", "ts", "v", "state", "lag1_v"}


def test_asof_left_salt_matches_unsalted(ray_session):
    """Hot-entity skew mitigation: salted left (right replicated per
    salt) returns EXACTLY the unsalted result, and window_fn+salt is
    rejected loudly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from featureextraction_jl_ray.stages.asof import asof_join

    rng = np.random.default_rng(5)
    n = 2000
    # one hot entity holds 80% of left rows
    ents = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 20, n)).astype(np.int64)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**6, n), unit="s"
    )
    left = pa.table({"eid": pa.array(ents), "ts": pa.array(ts),
                     "rid": pa.array(np.arange(n, dtype=np.int64))})
    r_ents = np.repeat(np.arange(20, dtype=np.int64), 10)
    r_ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        np.tile(np.arange(10), 20) * 10**5 + r_ents * 7, unit="s"
    )
    right = pa.table({"eid": pa.array(r_ents), "ts": pa.array(r_ts),
                      "state": pa.array(rng.standard_normal(200))})
    lds = ray_session.data.from_arrow(left).repartition(4)
    rds = ray_session.data.from_arrow(right).repartition(2)

    def run(salt):
        return (
            asof_join(lds, rds, on="ts", by="eid", right_cols=["state"],
                      num_buckets=8, left_tiebreak=("rid",), left_salt=salt)
            .to_pandas()
            .sort_values("rid", ignore_index=True)
        )

    base, salted = run(None), run(4)
    pd.testing.assert_frame_equal(base, salted)

    with pytest.raises(ValueError, match="left_salt"):
        asof_join(lds, rds, on="ts", by="eid", right_cols=["state"],
                  left_salt=4, window_fn=lambda df: df)


def test_range_join_overlapping_intervals(ray_session):
    """Overlapping windows produce one row per (event, window) pair;
    events outside every window drop (inner join); the per-entity
    density guard raises loudly."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from featureextraction_jl_ray.stages.joins import range_join

    base = pd.to_datetime("2024-01-01")
    ev = pa.table({
        "eid": pa.array([1, 1, 1, 2], type=pa.int64()),
        "rid": pa.array([10, 11, 12, 13], type=pa.int64()),
        "ts": pa.array([base + pd.Timedelta(m, "m") for m in (5, 15, 40, 5)]),
    })
    win = pa.table({
        "eid": pa.array([1, 1, 2], type=pa.int64()),
        "wid": pa.array([100, 101, 102], type=pa.int64()),
        "start_ts": pa.array([base, base + pd.Timedelta("10min"),
                              base + pd.Timedelta("20min")]),
        "end_ts": pa.array([base + pd.Timedelta("20min"),
                            base + pd.Timedelta("30min"),
                            base + pd.Timedelta("40min")]),
    })
    out = range_join(
        ray_session.data.from_arrow(ev).repartition(2),
        ray_session.data.from_arrow(win),
        by="eid", on="ts", start_col="start_ts", end_col="end_ts",
        right_cols=["wid", "start_ts", "end_ts"], num_buckets=4,
    ).to_pandas()
    got = sorted(zip(out.rid, out.wid))
    # rid 11 (t=15min) falls in BOTH eid-1 windows; rid 12 (40min) in
    # neither; rid 13 (eid 2, 5min) outside its window
    assert got == [(10, 100), (11, 100), (11, 101)]

    with pytest.raises(Exception, match="intervals"):
        range_join(
            ray_session.data.from_arrow(ev),
            ray_session.data.from_arrow(win),
            by="eid", on="ts", start_col="start_ts", end_col="end_ts",
            right_cols=["wid", "start_ts", "end_ts"], num_buckets=4,
            max_intervals_per_entity=1,
        ).to_pandas()


def test_ranks_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.window import with_ranks

    ds = with_ranks(
        events_ds(ray_session, sf_dir).select_columns(
            ["event_id", "user_id", "value"]
        ),
        "user_id",
        "value",
        ntile=4,
        tiebreak_cols=("event_id",),
        num_buckets=16,
    )
    want = db.execute(
        """
        SELECT event_id, user_id, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value, event_id) AS row_number,
          RANK() OVER (PARTITION BY user_id ORDER BY value) AS rank,
          DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value) AS dense_rank,
          PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value) AS percent_rank,
          CUME_DIST() OVER (PARTITION BY user_id ORDER BY value) AS cume_dist,
          NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS ntile_4
        FROM events
        """
    ).fetchdf()
    cmp(ds, want,
        ["row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
         "ntile_4"],
        sort_key=["event_id"])


def test_ntile_edge_cases_vs_duckdb(ray_session, db):
    """n < k, n == k, n % k ≠ 0 — the ntile size-split boundaries."""
    import pyarrow as pa
    from featureextraction_jl_ray.stages.window import with_ranks

    rows = [("a", i) for i in range(2)] + [("b", i) for i in range(4)] + [
        ("c", i) for i in range(7)
    ]
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )
    import ray.data as rd

    got = (
        with_ranks(rd.from_arrow(tbl), "k", "v", ntile=4, num_buckets=4)
        .to_pandas()
        .sort_values(["k", "v"], ignore_index=True)
    )
    want = duckdb.sql(
        """
        SELECT k, v, NTILE(4) OVER (PARTITION BY k ORDER BY v) AS t
        FROM tbl ORDER BY k, v
        """
    ).fetchdf()
    assert got["ntile_4"].tolist() == want["t"].tolist()


def test_cumulative_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.window import with_cumulative

    ds = with_cumulative(
        events_ds(ray_session, sf_dir).select_columns(KEY + ["value"]),
        "user_id",
        "ts",
        "value",
        aggs=("count", "sum", "mean", "min", "max"),
        tiebreak_cols=("event_id",),
        num_buckets=16,
    )
    want = db.execute(
        """
        SELECT event_id, user_id, ts, value,
          COUNT(*) OVER w AS cum_value_count,
          SUM(value) OVER w AS cum_value_sum,
          AVG(value) OVER w AS cum_value_mean,
          MIN(value) OVER w AS cum_value_min,
          MAX(value) OVER w AS cum_value_max
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """
    ).fetchdf()
    cmp(ds, want, ["cum_value_count", "cum_value_sum", "cum_value_mean",
                   "cum_value_min", "cum_value_max"])


def test_datetime_features_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.datetime import (
        with_datetime_features,
        with_time_since_prev,
    )

    ds = events_ds(ray_session, sf_dir).select_columns(KEY)
    ds = with_datetime_features(ds, "ts", parts=("year", "month", "day",
                                                 "hour", "minute", "second",
                                                 "isodow", "doy", "week"),
                                weekend_col="is_weekend")
    ds = with_time_since_prev(ds, "user_id", "ts",
                              tiebreak_cols=("event_id",), num_buckets=16)
    want = db.execute(
        """
        SELECT event_id, user_id, ts,
          date_part('year', ts) AS ts_year,
          date_part('month', ts) AS ts_month,
          date_part('day', ts) AS ts_day,
          date_part('hour', ts) AS ts_hour,
          date_part('minute', ts) AS ts_minute,
          date_part('second', ts) AS ts_second,
          date_part('isodow', ts) AS ts_isodow,
          date_part('doy', ts) AS ts_doy,
          date_part('week', ts) AS ts_week,
          date_part('isodow', ts) >= 6 AS is_weekend,
          epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
            AS secs_since_prev
        FROM events
        """
    ).fetchdf()
    cmp(ds, want, ["ts_year", "ts_month", "ts_day", "ts_hour", "ts_minute",
                   "ts_second", "ts_isodow", "ts_doy", "ts_week",
                   "is_weekend", "secs_since_prev"])


def test_datetime_features_validates_parts(ray_session, sf_dir):
    from featureextraction_jl_ray.stages.datetime import with_datetime_features

    with pytest.raises(ValueError):
        with_datetime_features(events_ds(ray_session, sf_dir), "ts",
                               parts=("century",))


def test_grouped_argmin_argmax_vs_duckdb(ray_session, sf_dir, db):
    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate

    ds = events_ds(ray_session, sf_dir).select_columns(
        ["event_id", "user_id", "ts", "event_type", "value"]
    )
    got = grouped_aggregate(
        ds, "user_id",
        {
            "first_type": ("event_type", "argmin", "ts"),
            "last_type": ("event_type", "argmax", "ts"),
            "first_value": ("value", "argmin", "ts"),
        },
        num_buckets=8,
    ).to_pandas().sort_values("user_id", ignore_index=True)
    want = db.execute(
        """
        SELECT DISTINCT user_id,
          FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_type) AS first_type,
          FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts DESC, event_type) AS last_type,
          FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, value) AS first_value
        FROM events ORDER BY user_id
        """
    ).fetchdf()
    for c in ["first_type", "last_type", "first_value"]:
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c


def test_grouped_argminmax_tie_resolution(ray_session):
    """Equal order values resolve to the SMALLEST value — pinned on a
    crafted all-ties frame so the contract can't silently drift."""
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "o": [1, 1, 1, 5, 5],
            "v": ["zebra", "apple", "mango", "y", "x"],
        }
    )
    out = {r["k"]: r for r in grouped_aggregate(
        rd.from_arrow(tbl), "k",
        {"fv": ("v", "argmin", "o"), "lv": ("v", "argmax", "o")},
        num_buckets=4,
    ).take_all()}
    assert out["a"]["fv"] == "apple" and out["a"]["lv"] == "apple"
    assert out["b"]["fv"] == "x" and out["b"]["lv"] == "x"
    with pytest.raises(ValueError):
        grouped_aggregate(rd.from_arrow(tbl), "k", {"bad": ("v", "argmid", "o")})


def test_rollup_aggregate_levels(ray_session, sf_dir, db):
    """All three ROLLUP levels (finest / per-flag / grand total) match
    DuckDB, including min/max re-aggregation at coarser levels."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.groupagg import rollup_aggregate

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id", "value"])
    got = rollup_aggregate(
        ds, ["event_type"],
        {"n": ("value", "count"), "vmin": ("value", "min"),
         "vmax": ("value", "max")}, num_buckets=4)
    want = db.execute("""
        SELECT event_type, count(value) AS n, min(value) AS vmin,
               max(value) AS vmax
        FROM events GROUP BY ROLLUP(event_type)
    """).fetchdf()
    key = got.event_type.fillna("__total__")
    wkey = want.event_type.fillna("__total__")
    got = got.assign(k=key).sort_values("k", ignore_index=True)
    want = want.assign(k=wkey).sort_values("k", ignore_index=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.n.to_numpy(int), want.n.to_numpy(int))
    np.testing.assert_allclose(got.vmin, want.vmin, rtol=1e-12)
    np.testing.assert_allclose(got.vmax, want.vmax, rtol=1e-12)


def test_resample_entity_grid_semantics(ray_session):
    """Grid pitch, floor origin, backward ffill, and NULL before the
    first event — on a hand-checkable frame."""
    import pyarrow as pa

    from featureextraction_jl_ray.stages.asof import resample_entity_grid

    ts = pd.to_datetime(["2024-01-01 00:30", "2024-01-01 02:10",
                         "2024-01-01 00:15"])
    t = pa.table({"eid": pa.array([0, 0, 1], type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "v": pa.array([1.0, 2.0, 9.0])})
    out = resample_entity_grid(ray_session.data.from_arrow(t), "eid", "ts",
                               ["v"], freq="1h", grid_col="gts",
                               num_buckets=2).to_pandas()
    out = out.sort_values(["eid", "gts"], ignore_index=True)
    e0 = out[out.eid == 0]
    # grid: 00:00 (before first event → NULL), 01:00 (v=1), 02:00 (v=1),
    # and stops at max ts 02:10 → last grid point 02:00
    assert list(e0.gts) == list(pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00"]))
    assert np.isnan(e0.v.iloc[0]) and list(e0.v.iloc[1:]) == [1.0, 1.0]
    e1 = out[out.eid == 1]
    assert list(e1.gts) == [pd.Timestamp("2024-01-01 00:00")]
    assert np.isnan(e1.v.iloc[0])


def test_grouped_ols_single_point_and_constant_x(ray_session):
    """Keys with < 2 points or zero x-variance yield null slope/R²,
    matching SQL regr_slope semantics."""
    import pyarrow as pa

    from featureextraction_jl_ray.stages.groupagg import grouped_ols

    t = pa.table({"k": [0, 1, 1, 2, 2, 2],
                  "x": [5.0, 3.0, 3.0, 1.0, 2.0, 3.0],
                  "y": [1.0, 2.0, 4.0, 1.0, 3.0, 5.0]})
    out = grouped_ols(ray_session.data.from_arrow(t), "k", "x", "y",
                      num_buckets=2).to_pandas()
    out = out.sort_values("k", ignore_index=True)
    assert np.isnan(out.slope[0])       # single point
    assert np.isnan(out.slope[1])       # constant x
    np.testing.assert_allclose(out.slope[2], 2.0, rtol=1e-12)  # perfect line
    np.testing.assert_allclose(out.r2[2], 1.0, rtol=1e-12)


def test_range_join_dense_tree_path_matches_merge_path(ray_session):
    """Forcing the interval-tree path (dense_threshold=0) must produce
    exactly the pairs the cross-merge path produces, including
    overlapping intervals, empty entities and NaT-free semantics."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from featureextraction_jl_ray.stages.joins import range_join

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01").value
    n_ev, n_win = 400, 120
    ev = pa.table({
        "eid": pa.array(rng.integers(0, 5, n_ev)),
        "rid": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": pa.array((base + rng.integers(0, 10**9 * 3600, n_ev)).view("datetime64[ns]")),
    })
    starts = base + rng.integers(0, 10**9 * 3600, n_win)
    ends = starts + rng.integers(0, 10**9 * 600, n_win)
    win = pa.table({
        "eid": pa.array(rng.integers(0, 5, n_win)),
        "wid": pa.array(np.arange(n_win, dtype=np.int64)),
        "start_ts": pa.array(starts.view("datetime64[ns]")),
        "end_ts": pa.array(ends.view("datetime64[ns]")),
    })

    def run(thresh):
        out = range_join(
            ray_session.data.from_arrow(ev).repartition(3),
            ray_session.data.from_arrow(win),
            by="eid", on="ts", start_col="start_ts", end_col="end_ts",
            right_cols=["wid", "start_ts", "end_ts"], num_buckets=4,
            dense_threshold=thresh,
        ).to_pandas()
        assert list(out.columns) == ["eid", "rid", "ts", "wid", "start_ts", "end_ts"]
        return sorted(zip(out.rid, out.wid))

    merged, treed = run(10**9), run(0)
    assert len(merged) > 50  # the fixture actually produces matches
    assert merged == treed


def test_resample_interpolate_semantics(ray_session):
    """Linear regridding: exact event → its value; between events →
    straight line; before first → null; after last → held."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from featureextraction_jl_ray.stages.asof import resample_entity_grid

    base = pd.Timestamp("2024-01-01 00:10:00")
    ev = pa.table({
        "eid": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([base, base + pd.Timedelta("50min"),
                        base + pd.Timedelta("110min")]),
        "v": pa.array([10.0, 20.0, 50.0]),
    })
    out = resample_entity_grid(
        ray_session.data.from_arrow(ev), "eid", "ts", ["v"],
        freq="30min", grid_col="gts", num_buckets=4, method="interpolate",
    ).to_pandas().sort_values("gts", ignore_index=True)
    # grid origin floors 00:10 to 00:00; span to 02:00
    got = dict(zip(out.gts.dt.strftime("%H:%M"), out.v))
    assert np.isnan(got["00:00"])                      # before first event
    assert got["00:30"] == 10.0 + (20.0 - 10.0) * (20 / 50)
    assert got["01:00"] == 20.0                        # exact event at 01:00
    assert got["01:30"] == 20.0 + (50.0 - 20.0) * (30 / 60)
    assert got["02:00"] == 50.0                        # exact last event


def test_funnel_planted_sequences(ray_session):
    """Funnel semantics: in-order completes; out-of-order doesn't;
    equal timestamps don't chain (strict >); partial depth reported;
    greedy-earliest completion_ts."""
    import ray as _ray

    from featureextraction_jl_ray.stages.window import funnel

    T = pd.Timestamp
    rows = [
        # u1: clean A<B<C
        (1, T("2024-01-01 00:00"), "view"),
        (1, T("2024-01-01 01:00"), "click"),
        (1, T("2024-01-01 02:00"), "purchase"),
        # u2: click BEFORE view -> only the view counts, depth 1
        (2, T("2024-01-01 00:00"), "click"),
        (2, T("2024-01-01 01:00"), "view"),
        # u3: tie timestamps -> strict > breaks the chain at click
        (3, T("2024-01-01 00:00"), "view"),
        (3, T("2024-01-01 00:00"), "click"),
        (3, T("2024-01-01 01:00"), "purchase"),
        # u4: completes despite an early stray purchase; greedy picks
        # the LATER purchase after the click
        (4, T("2024-01-01 00:00"), "purchase"),
        (4, T("2024-01-01 01:00"), "view"),
        (4, T("2024-01-01 02:00"), "click"),
        (4, T("2024-01-01 03:00"), "purchase"),
        # u5: never starts
        (5, T("2024-01-01 00:00"), "error"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ds = _ray.data.from_pandas(df)
    out = funnel(ds, "user_id", "ts", "event_type",
                 ["view", "click", "purchase"],
                 num_buckets=4).to_pandas().set_index("user_id")
    assert out.loc[1, "completed"] and out.loc[1, "steps_completed"] == 3
    assert out.loc[1, "completion_ts"] == T("2024-01-01 02:00")
    assert not out.loc[2, "completed"] and out.loc[2, "steps_completed"] == 1
    # u3: view at t0; click at the SAME t0 is not strictly after
    assert out.loc[3, "steps_completed"] == 1
    assert out.loc[4, "completed"]
    assert out.loc[4, "completion_ts"] == T("2024-01-01 03:00")
    assert out.loc[5, "steps_completed"] == 0
    assert pd.isna(out.loc[5, "completion_ts"])
    with pytest.raises(ValueError, match="at least 2"):
        funnel(ds, "user_id", "ts", "event_type", ["view"])


def test_cohort_retention_planted(ray_session):
    """Monday-start cohorts, distinct-per-week counting, exact offsets,
    and partial-sum correctness across buckets."""
    import ray as _ray

    from featureextraction_jl_ray.stages.groupagg import cohort_retention

    T = pd.Timestamp
    rows = [
        # u1: first active week of Mon 2024-01-01; returns weeks 0, 2
        (1, T("2024-01-03 10:00:00")),
        (1, T("2024-01-04 10:00:00")),   # same week: counted once
        (1, T("2024-01-17 10:00:00")),
        # u2: same cohort, only week 0
        (2, T("2024-01-07 23:00:00")),   # Sunday -> still week of 01-01
        # u3: cohort of Mon 2024-01-08, returns week 1
        (3, T("2024-01-08 00:00:00")),
        (3, T("2024-01-15 12:00:00")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    ds = _ray.data.from_pandas(df)
    out = cohort_retention(ds, "user_id", "ts", num_buckets=4).to_pandas()
    out = out.sort_values(["cohort_week", "week_offset"],
                          ignore_index=True)
    got = {(r.cohort_week, int(r.week_offset)): int(r.n_entities)
           for r in out.itertuples()}
    w1, w2 = T("2024-01-01"), T("2024-01-08")
    assert got == {(w1, 0): 2, (w1, 2): 1, (w2, 0): 1, (w2, 1): 1}


def test_cyclical_features_wraparound(ray_session):
    """sin/cos encode the circle: 23:00 and 00:00 are near neighbors
    in (sin, cos) space while raw hours are 23 apart; Sunday wraps to
    Monday; unknown cycle name raises."""
    import ray as _ray

    from featureextraction_jl_ray.stages.datetime import (
        with_cyclical_features,
    )

    T = pd.Timestamp
    df = pd.DataFrame({
        "i": range(4),
        "ts": [T("2024-01-01 00:00:00"), T("2024-01-01 23:00:00"),
               T("2024-01-07 12:00:00"),   # Sunday
               T("2024-06-15 06:00:00")],
    })
    out = with_cyclical_features(_ray.data.from_pandas(df), "ts"
                                 ).to_pandas().sort_values(
        "i", ignore_index=True)
    p0 = out.loc[0, ["ts_hour_sin", "ts_hour_cos"]].to_numpy(float)
    p23 = out.loc[1, ["ts_hour_sin", "ts_hour_cos"]].to_numpy(float)
    assert np.linalg.norm(p0 - p23) < 2 * np.sin(np.pi / 24) + 1e-9
    # midnight: angle 0
    np.testing.assert_allclose(p0, [0.0, 1.0], atol=1e-12)
    # Sunday: dow angle 2π·6/7
    np.testing.assert_allclose(
        out.loc[2, "ts_dow_sin"], np.sin(2 * np.pi * 6 / 7), atol=1e-12)
    # unit circle everywhere
    for c in ("hour", "dow", "month"):
        r = out[f"ts_{c}_sin"] ** 2 + out[f"ts_{c}_cos"] ** 2
        np.testing.assert_allclose(r, 1.0, atol=1e-12)
    with pytest.raises(ValueError, match="unknown cycles"):
        with_cyclical_features(_ray.data.from_pandas(df), "ts",
                               cycles=("minute",))


def test_interval_overlap_join_dense_matches_bruteforce(ray_session):
    """Dense-path (two-stab interval tree) == sparse merge+filter ==
    python brute force, incl. touching endpoints, nested, duplicate
    starts, invalid (start > end / null) intervals."""
    import ray as _ray

    from featureextraction_jl_ray.stages.joins import interval_overlap_join

    rng = np.random.default_rng(61)
    n_a, n_b = 40, 35
    ents = rng.choice(["u1", "u2"], n_a + n_b)
    s = rng.integers(0, 100, n_a + n_b).astype("float64")
    ln = rng.integers(0, 15, n_a + n_b).astype("float64")
    e = s + ln
    # planted edge cases: touching endpoints, nested, invalid, null
    s[0], e[0] = 10.0, 20.0
    s[n_a], e[n_a] = 20.0, 30.0          # touches left[0] at 20 -> match
    ents[0] = ents[n_a] = "u1"           # planted pair shares an entity
    s[1], e[1] = 50.0, 40.0              # invalid: start > end
    e[2] = np.nan                        # null end
    a = pd.DataFrame({"id_a": np.arange(n_a), "u": ents[:n_a],
                      "s_a": s[:n_a], "e_a": e[:n_a]})
    b = pd.DataFrame({"id_b": np.arange(n_b), "u": ents[n_a:],
                      "s_b": s[n_a:], "e_b": e[n_a:]})

    want = set()
    for ra in a.itertuples():
        if np.isnan(ra.s_a) or np.isnan(ra.e_a) or ra.s_a > ra.e_a:
            continue
        for rb in b.itertuples():
            if (rb.u != ra.u or np.isnan(rb.s_b) or np.isnan(rb.e_b)
                    or rb.s_b > rb.e_b):
                continue
            if ra.s_a <= rb.e_b and rb.s_b <= ra.e_a:
                want.add((ra.id_a, rb.id_b))

    for thresh in (512, 2):  # sparse path, then force the dense path
        out = interval_overlap_join(
            _ray.data.from_arrow(pa.Table.from_pandas(a)),
            _ray.data.from_arrow(pa.Table.from_pandas(b)),
            by="u", left_start="s_a", left_end="e_a",
            start_col="s_b", end_col="e_b", num_buckets=4,
            dense_threshold=thresh).to_pandas()
        got = set(zip(out.id_a.astype(int), out.id_b.astype(int)))
        assert got == want, f"dense_threshold={thresh}"
        # no duplicate pairs from the two-stab decomposition
        assert len(out) == len(got), f"dense_threshold={thresh}"
    assert (0, 0) in want  # the touching-endpoint pair really exercised


# ---------------------------------------------------------------------------
# with_ewma — EWMA mean + leakage-safe anomaly z-score
# ---------------------------------------------------------------------------

def _ref_ewma(df, tau_us, min_prev=2, min_weight=2.0):
    """Direct O(n²) reference over a (eid, ts)-sorted frame, replicating
    the documented gates (min_prev non-null previous events, Σw_prev ≥
    min_weight, var_prev > 0)."""
    n = len(df)
    eid = df["eid"].to_numpy()
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    v = df["v"].to_numpy(dtype="float64")
    mean = np.full(n, np.nan)
    z = np.full(n, np.nan)
    for i in range(n):
        sw = sv = svv = 0.0
        cnt_prev = 0
        for j in range(i + 1):
            if eid[j] != eid[i] or np.isnan(v[j]):
                continue
            w = np.exp(-(ts[i] - ts[j]) / tau_us)
            sw += w
            sv += w * v[j]
            svv += w * v[j] * v[j]
            if j < i:
                cnt_prev += 1
        if sw > 0:
            mean[i] = sv / sw
        if np.isnan(v[i]):
            continue
        swp, svp, svvp = sw - 1.0, sv - v[i], svv - v[i] * v[i]
        if cnt_prev < min_prev or swp < min_weight:
            continue
        mp = svp / swp
        varp = svvp / swp - mp * mp
        if varp > 0:
            z[i] = (v[i] - mp) / np.sqrt(varp)
    return mean, z


def test_ewma_frame_matches_bruteforce():
    from featureextraction_jl_ray.stages.window import _ewma_frame

    rng = np.random.default_rng(7)
    n = 300
    df = pd.DataFrame({
        "eid": np.sort(rng.choice(["a", "b", "c"], n)),
        "ts": pd.to_datetime(0) + pd.to_timedelta(
            np.concatenate([np.sort(rng.integers(0, 40_000, n - 2)),
                            [100, 100]]), unit="s"),
        "v": rng.normal(50.0, 20.0, n),
    })
    df.loc[rng.choice(n, 12, replace=False), "v"] = np.nan  # null contract
    df = df.sort_values(["eid", "ts"], ignore_index=True)
    tau_us = 3600e6
    want_mean, want_z = _ref_ewma(df, tau_us)
    got = _ewma_frame(df.copy(), "eid", "ts", "v", tau_us,
                      "m", "z", min_prev=2, min_weight=2.0)
    np.testing.assert_allclose(got["m"].to_numpy(), want_mean,
                               rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(got["z"].to_numpy(), want_z,
                               rtol=1e-7, equal_nan=True)
    assert np.isfinite(want_z).sum() > 100  # the z path really exercised


def test_ewma_is_leakage_free(ray_session):
    """Perturbing a FUTURE row's value must not change any earlier row's
    EWMA mean or z (strictly-backward contract)."""
    import ray as _r
    from featureextraction_jl_ray.stages.window import with_ewma

    rng = np.random.default_rng(11)
    n = 60
    base = pd.DataFrame({
        "eid": ["u"] * n,
        "ts": pd.to_datetime(0) + pd.to_timedelta(
            np.arange(n) * 600, unit="s"),
        "v": rng.normal(10.0, 3.0, n),
    })
    bumped = base.copy()
    bumped.loc[n - 1, "v"] += 1e6

    def run(df):
        ds = _r.data.from_arrow(pa.Table.from_pandas(df))
        out = with_ewma(ds, "eid", "ts", "v", tau="1h", num_buckets=2)
        return out.to_pandas().sort_values("ts", ignore_index=True)

    a, b = run(base), run(bumped)
    for c in ("ewma_v", "ewma_z_v"):
        np.testing.assert_array_equal(a[c].to_numpy()[: n - 1],
                                      b[c].to_numpy()[: n - 1], err_msg=c)
    assert a["ewma_v"].iloc[n - 1] != b["ewma_v"].iloc[n - 1]
    # the planted 1e6 spike is flagged as a gross anomaly
    assert abs(b["ewma_z_v"].iloc[n - 1]) > 100


def test_ewma_empty_frame():
    from featureextraction_jl_ray.stages.window import _ewma_frame

    df = pd.DataFrame({"eid": pd.Series(dtype="object"),
                       "ts": pd.Series(dtype="datetime64[us]"),
                       "v": pd.Series(dtype="float64")})
    got = _ewma_frame(df, "eid", "ts", "v", 3600e6, "m", "z", 2, 2.0)
    assert list(got.columns) == ["eid", "ts", "v", "m", "z"]
    assert len(got) == 0


# ---------------------------------------------------------------- tte


def _tte_bruteforce(df, horizon_s=None):
    """Pure-Python reference for with_time_to_event."""
    out = []
    for _, r in df.iterrows():
        later = df[(df.user == r.user)
                   & ((df.ts > r.ts)
                      | ((df.ts == r.ts) & (df.eid > r.eid)))
                   & df.is_t]
        earlier = df[(df.user == r.user)
                     & ((df.ts < r.ts)
                        | ((df.ts == r.ts) & (df.eid < r.eid)))
                     & df.is_t]
        nxt = later.ts.min() if len(later) else None
        prv = earlier.ts.max() if len(earlier) else None
        d = (nxt - r.ts).total_seconds() if nxt is not None else None
        if horizon_s is not None:
            obs = int(d is not None and d <= horizon_s)
            tte = d if obs else float(horizon_s)
        else:
            obs, tte = int(d is not None), d
        out.append({
            "eid": r.eid, "tte_s": tte, "observed": obs,
            "since_s": ((r.ts - prv).total_seconds()
                        if prv is not None else None),
        })
    return (pd.DataFrame(out).sort_values("eid", ignore_index=True)
            .astype({"tte_s": "float64", "since_s": "float64"}))


def _tte_run(df, **kw):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import with_time_to_event

    got = with_time_to_event(
        rd.from_pandas(df), "user", "ts", "is_t",
        tiebreak_cols=("eid",), num_buckets=4, **kw,
    ).to_pandas()
    return (got[["eid", "tte_s", "observed", "since_s"]]
            .sort_values("eid", ignore_index=True)
            .astype({"tte_s": "float64", "since_s": "float64",
                     "observed": "int64"}))


def _tte_frame(seed=0, n=300, n_users=12):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "user": rng.integers(0, n_users, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 30 * 86400, n), unit="s"),
        "is_t": rng.random(n) < 0.2,
    })
    # plant exact-tie timestamps to exercise the row-order tiebreak
    df.loc[5, ["user", "ts"]] = df.loc[4, ["user", "ts"]]
    return df


def test_tte_matches_bruteforce_censored(ray_session):
    df = _tte_frame()
    got = _tte_run(df, horizon="3d")
    want = _tte_bruteforce(df, horizon_s=3 * 86400)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # censored rows carry exactly the horizon and observed=0
    cens = got[got.observed == 0]
    assert len(cens) > 0 and (cens.tte_s == 3 * 86400.0).all()


def test_tte_uncensored_nulls(ray_session):
    df = _tte_frame(seed=1)
    got = _tte_run(df, horizon=None)
    want = _tte_bruteforce(df, horizon_s=None)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # after each user's last target, tte is null and observed 0
    assert got.tte_s.isna().any()
    assert (got.loc[got.tte_s.isna(), "observed"] == 0).all()


def test_tte_target_row_looks_forward_not_at_itself(ray_session):
    # single user, one target: the target row itself must be censored
    df = pd.DataFrame({
        "eid": np.arange(3, dtype=np.int64),
        "user": np.zeros(3, dtype=np.int64),
        "ts": pd.to_datetime([0, 100, 200], unit="s"),
        "is_t": [False, True, False],
    })
    got = _tte_run(df, horizon="1d")
    assert got.loc[got.eid == 0, "observed"].item() == 1
    assert got.loc[got.eid == 0, "tte_s"].item() == 100.0
    assert got.loc[got.eid == 1, "observed"].item() == 0   # no self-match
    assert got.loc[got.eid == 1, "since_s"].isna().item()  # strictly earlier
    assert got.loc[got.eid == 2, "since_s"].item() == 100.0


def test_tte_never_target_entity(ray_session):
    df = pd.DataFrame({
        "eid": np.arange(4, dtype=np.int64),
        "user": np.array([0, 0, 1, 1], dtype=np.int64),
        "ts": pd.to_datetime([0, 10, 0, 10], unit="s"),
        "is_t": [False, False, False, False],
    })
    got = _tte_run(df, horizon="1d")
    assert (got.observed == 0).all()
    assert (got.tte_s == 86400.0).all()
    assert got.since_s.isna().all()


# ---------------------------------------------------------------- scd2


def test_scd2_join_planted_versions(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.asof import scd2_join

    # dimension: user 1 has tier A [t0, t10), B [t10, t20); user 2 has
    # C [t5, t8) then a GAP (expired) until nothing
    dim = pd.DataFrame({
        "u": np.array([1, 1, 2], dtype=np.int64),
        "vts": pd.to_datetime([0, 10, 5], unit="s"),
        "valid_to": pd.to_datetime([10, 20, 8], unit="s"),
        "tier": ["A", "B", "C"],
    })
    facts = pd.DataFrame({
        "fid": np.arange(7, dtype=np.int64),
        "u": np.array([1, 1, 1, 1, 2, 2, 2], dtype=np.int64),
        "vts": pd.to_datetime([0, 9, 10, 25, 4, 6, 9], unit="s"),
    })
    out = scd2_join(rd.from_arrow(pa.Table.from_pandas(facts)),
                    rd.from_arrow(pa.Table.from_pandas(dim)),
                    on="vts", by="u", valid_from="vts",
                    valid_to="valid_to", dim_cols="tier",
                    num_buckets=4, left_tiebreak=("fid",)
                    ).to_pandas().sort_values("fid", ignore_index=True)
    # boundary semantics: from inclusive, to exclusive
    assert out.tier.tolist() == [
        "A",    # t0: first version starts (inclusive)
        "A",    # t9: still A
        "B",    # t10: B starts exactly (A's to is exclusive)
        None,   # t25: B expired at t20 → gap
        None,   # t4: before user 2's first version
        "C",    # t6: inside C
        None,   # t9: C expired at t8
    ]


def test_scd2_join_all_facts_survive(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.asof import scd2_join

    rng = np.random.default_rng(4)
    dim = pd.DataFrame({
        "u": np.arange(10, dtype=np.int64),
        "vts": pd.to_datetime(np.zeros(10), unit="s"),
        "valid_to": pd.to_datetime(np.full(10, 1000), unit="s"),
        "tier": [str(i % 3) for i in range(10)],
    })
    facts = pd.DataFrame({
        "fid": np.arange(200, dtype=np.int64),
        "u": rng.integers(0, 12, 200).astype(np.int64),  # 10,11 unmatched
        "vts": pd.to_datetime(rng.integers(0, 2000, 200), unit="s"),
    })
    out = scd2_join(rd.from_arrow(pa.Table.from_pandas(facts)),
                    rd.from_arrow(pa.Table.from_pandas(dim)),
                    on="vts", by="u", valid_from="vts",
                    valid_to="valid_to", dim_cols="tier",
                    num_buckets=4, left_tiebreak=("fid",)).to_pandas()
    assert len(out) == 200          # left join: every fact survives
    want_live = facts.u.lt(10) & facts.vts.lt(pd.Timestamp(1000, unit="s"))
    got = out.sort_values("fid", ignore_index=True)
    assert got.tier.notna().tolist() == want_live.tolist()
    exp = facts.u.astype(str).where(want_live, None)
    assert (got.tier.fillna("-") ==
            (facts.u % 3).astype(str).where(want_live, "-")).all()


# ---------------------------------------------------------------- runs


def test_run_length_stats_bruteforce(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import run_length_stats

    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "eid": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, 20, n).astype(np.int64),
        "ts": pd.to_datetime(rng.permutation(n) * 60, unit="s"),
        "hot": rng.random(n) < 0.45,
    })
    got = (run_length_stats(
        rd.from_arrow(pa.Table.from_pandas(df)), "u", "ts", "hot",
        min_run=3, num_buckets=4, tiebreak_cols=("eid",))
        .to_pandas().sort_values("u", ignore_index=True))
    # brute force
    rows = []
    for u, g in df.sort_values(["u", "ts", "eid"]).groupby("u"):
        runs, cur = [], 0
        for v in g.hot:
            if v:
                cur += 1
            elif cur:
                runs.append(cur); cur = 0
        if cur:
            runs.append(cur)
        if runs:
            rows.append({"u": u, "n_runs": len(runs), "max_run": max(runs),
                         "long_runs": sum(r >= 3 for r in runs)})
    want = pd.DataFrame(rows).sort_values("u", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_run_length_stats_edges(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import run_length_stats

    # entity with zero true rows is absent; all-true entity = one run
    df = pd.DataFrame({
        "eid": np.arange(6, dtype=np.int64),
        "u": np.array([1, 1, 1, 2, 2, 2], dtype=np.int64),
        "ts": pd.to_datetime(np.arange(6), unit="s"),
        "hot": [False, False, False, True, True, True],
    })
    got = run_length_stats(rd.from_arrow(pa.Table.from_pandas(df)),
                           "u", "ts", "hot", min_run=3,
                           num_buckets=2, tiebreak_cols=("eid",)
                           ).to_pandas()
    assert got.u.tolist() == [2]
    assert got.iloc[0][["n_runs", "max_run", "long_runs"]].tolist() == [1, 3, 1]


def test_user_theil_sen_vs_bruteforce(ray_session, sf_dir):
    import ray

    from featureextraction_jl_ray.stages.window import user_theil_sen

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"])
    out = (user_theil_sen(ds, "user_id", "ts", "value",
                          tiebreak_cols=("event_id",), num_buckets=4)
           .to_pandas().set_index("user_id").sort_index())
    df = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    for uid, g in df.groupby("user_id"):
        t = (g["ts"].to_numpy().astype("datetime64[us]")
             .astype(np.int64).astype(np.float64))
        v = g["value"].to_numpy(dtype=np.float64)
        i, j = np.triu_indices(len(g), k=1)
        # rows are ts-ordered in the fixture; guard anyway
        order = np.argsort(t, kind="mergesort")
        t, v = t[order], v[order]
        dt = t[j] - t[i]
        keep = dt != 0
        slopes = (v[j][keep] - v[i][keep]) / dt[keep]
        assert out.loc[uid, "n_pairs"] == len(slopes)
        np.testing.assert_allclose(out.loc[uid, "theil_sen"],
                                   np.median(slopes), rtol=0, atol=0)
    # robustness: one wild outlier barely moves Theil-Sen, wrecks OLS
    rng = np.random.default_rng(101)
    n = 101
    tt = np.arange(n, dtype=np.float64) * 1_000_000
    vv = 2e-6 * tt + rng.normal(0, 0.1, n)
    vv[50] += 1e4
    base = pd.Timestamp("2024-01-01").value // 1000
    tsc = pd.to_datetime((base + tt).astype(np.int64), unit="us")
    t2 = pa.table({"u": np.int64(1).repeat(n), "ts": tsc, "v": vv,
                   "eid": np.arange(n, dtype=np.int64)})
    import ray.data as rd
    got = user_theil_sen(rd.from_arrow(t2), "u", "ts", "v",
                         tiebreak_cols=("eid",), num_buckets=2).to_pandas()
    assert abs(got["theil_sen"].iloc[0] - 2e-6) < 2e-7
    ols = np.polyfit(tt, vv, 1)[0]
    assert abs(ols - 2e-6) > 5e-7   # OLS got dragged, Theil-Sen didn't


def test_user_theil_sen_guard(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import user_theil_sen

    n = 30
    ts = pd.date_range("2024-01-01", periods=n, freq="1min")
    t = pa.table({"u": np.int64(1).repeat(n), "ts": ts,
                  "v": np.arange(n, dtype=np.float64)})
    with pytest.raises(Exception, match="max_points"):
        user_theil_sen(rd.from_arrow(t), "u", "ts", "v",
                       max_points=10, num_buckets=2).materialize()


def test_linear_attribution_vs_bruteforce(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import linear_attribution

    rng = np.random.default_rng(103)
    n = 4000
    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(n):
        rows.append((int(rng.integers(0, 40)),
                     base + pd.Timedelta(seconds=int(rng.integers(0, 86400))),
                     rng.choice(["view", "click", "purchase", "error"]),
                     i))
    df = pd.DataFrame(rows, columns=["u", "ts", "et", "i"])
    df = df.drop_duplicates(["u", "ts"])  # mirror the no-collision contract
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = linear_attribution(ds, "u", "ts", "et",
                             touch_types=("view", "click"),
                             conversion_type="purchase", window="30m",
                             num_buckets=4).set_index("et").sort_index()
    # brute force
    credit = {}
    touched = {}
    w_us = 30 * 60 * 1_000_000
    for _, g in df.groupby("u"):
        g = g.sort_values("ts")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["et"].to_numpy()
        for ci in np.flatnonzero(et == "purchase"):
            inw = np.flatnonzero((t >= t[ci] - w_us) & (t < t[ci])
                                 & np.isin(et, ["view", "click"]))
            if not len(inw):
                continue
            for ti in inw:
                credit[et[ti]] = credit.get(et[ti], 0.0) + 1.0 / len(inw)
            for typ in np.unique(et[inw]):
                touched[typ] = touched.get(typ, 0) + 1
    for typ in sorted(credit):
        np.testing.assert_allclose(got.loc[typ, "credit"], credit[typ],
                                   rtol=1e-12)
        assert got.loc[typ, "n_conversions_touched"] == touched[typ]
    # conservation: total credit == number of conversions with ≥1 touch
    n_conv_with_touch = 0
    for _, g in df.groupby("u"):
        g = g.sort_values("ts")
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["et"].to_numpy()
        for ci in np.flatnonzero(et == "purchase"):
            if (((t >= t[ci] - w_us) & (t < t[ci])
                 & np.isin(et, ["view", "click"]))).any():
                n_conv_with_touch += 1
    np.testing.assert_allclose(got["credit"].sum(), n_conv_with_touch,
                               rtol=1e-12)


def test_linear_attribution_decay(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.window import linear_attribution

    # one user: touches view@0m click@10m view@20m, purchase@25m
    base = pd.Timestamp("2024-01-01")
    t = pa.table({
        "u": np.int64(1).repeat(4),
        "ts": [base, base + pd.Timedelta("10m"), base + pd.Timedelta("20m"),
               base + pd.Timedelta("25m")],
        "et": ["view", "click", "view", "purchase"],
    })
    got = linear_attribution(rd.from_arrow(t), "u", "ts", "et",
                             touch_types=("view", "click"),
                             conversion_type="purchase", window="1h",
                             decay=0.5, num_buckets=2).set_index("et")
    # weights oldest→newest: 0.25, 0.5, 1.0 → normalized /1.75
    np.testing.assert_allclose(got.loc["view", "credit"],
                               (0.25 + 1.0) / 1.75, rtol=1e-12)
    np.testing.assert_allclose(got.loc["click", "credit"], 0.5 / 1.75,
                               rtol=1e-12)
    assert got.loc["view", "n_conversions_touched"] == 1
    assert got.loc["click", "n_conversions_touched"] == 1
