"""Windowed per-entity operators — backfill, lag/lead, gap sessionize,
trailing rolling aggregates (SURVEY.md §2-B W1–W4; BASELINE.json:6/14
"backfill, lag/lead-k, gap-based sessionize … monotonic-deque/sorted-run
structure").

Every operator is a vectorized callback run under
:func:`..stages.partition.sorted_scan`: one hash shuffle on the entity
key, then per-bucket pandas DataFrames sorted by (entity, ts, tiebreak).
Per-entity semantics use pandas' C groupby kernels (shift / ffill /
cumsum) — no Python loop over rows.  Rolling max/min uses pandas'
time-based rolling, which implements the monotonic-deque algorithm
internally (O(1) amortized per row).

Leakage contract (BASELINE.json:6 "zero temporal leakage"): every
operator here looks strictly backward in event time — lag, ffill and
trailing windows use only rows with ts' ≤ ts of the same entity.  ``lead``
is provided for *label* construction and is documented as forward-looking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .partition import sorted_scan

__all__ = [
    "with_lag",
    "with_backfill",
    "with_sessionize",
    "with_rolling",
    "with_forward_rolling",
    "with_decayed_sum",
    "with_ewma",
    "with_windows",
    "with_ranks",
    "with_cumulative",
    "with_session_stats",
]

_AGG_NAMES = ("count", "sum", "mean", "min", "max", "std", "var", "median")


def _sessionize_frame(
    df: pd.DataFrame, entity_col: str, ts_col: str, gap_us: int, out_col: str
) -> pd.DataFrame:
    """session_id = running count of gap breaks within each entity (0-based)."""
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    # factorize → plain int codes (robust to nullable/EA entity dtypes)
    codes = pd.factorize(df[entity_col], use_na_sentinel=False)[0]
    ent_change = np.empty(len(df), dtype=bool)
    if len(df):
        ent_change[0] = True
        ent_change[1:] = codes[1:] != codes[:-1]
    gap_break = np.empty(len(df), dtype=bool)
    if len(df):
        gap_break[0] = False
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap_us
    new_session = ent_change | gap_break
    # cumsum of session starts, re-zeroed per entity
    run_id = np.cumsum(new_session)
    first_run_of_entity = np.where(ent_change, run_id, 0)
    first_run_of_entity = np.maximum.accumulate(first_run_of_entity)
    df[out_col] = (run_id - first_run_of_entity).astype(np.int64)
    return df


def _rolling_frame(
    df: pd.DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window: str | pd.Timedelta,
    aggs: tuple[str, ...],
    prefix: str,
    ties: str = "row",
    direction: str = "trailing",
) -> pd.DataFrame:
    """Trailing event-time window [ts − window, ts] per entity.

    ``direction="forward"`` flips the frame to [ts, ts + window] — the
    LABEL window (future outcome per event).  Implemented by running the
    same single-pass trailing kernel over the time-reversed, negated
    axis, so both directions share one C-implemented rolling path.

    ``ties``: "row" (default) = STREAMING semantics — row i's window
    holds rows 0..i of its entity (the reference's monotonic-deque
    model; no lookahead).  "peers" = SQL RANGE-frame semantics — rows
    with EQUAL ts all share the full tie group's aggregate (what
    ``RANGE ... AND CURRENT ROW`` means in DuckDB/standard SQL, which
    includes current-row peers).  The two differ only on tie-heavy
    timestamps; property tests pin both against oracles.

    Implementation: pandas ``groupby().rolling()`` pays per-group
    overhead that is catastrophic with many small entities, so instead
    the per-entity windows are computed in ONE pass over the whole
    (entity, ts)-sorted bucket using an entity-offset time axis:
    ``adj = entity_code · stride + (ts − ts₀)`` with
    ``stride > ts_range + window`` — windows then can never cross an
    entity boundary, and a single C-implemented rolling (internally the
    monotonic-deque/prefix structure) over ``adj`` yields every entity's
    trailing aggregates at once.
    """
    for agg in aggs:
        if agg not in _AGG_NAMES:
            raise ValueError(f"unsupported rolling agg {agg!r}; use {_AGG_NAMES}")
    w_us = int(pd.Timedelta(window).value // 1000)
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    codes = pd.factorize(df[entity_col], use_na_sentinel=False)[0].astype(np.int64)
    if len(df):
        rel = ts - ts.min()
        stride = int(rel.max()) + w_us + 2
        adj = codes * stride + rel
    else:
        adj = ts
    vals = df[value_col]
    if isinstance(vals.dtype, pd.api.extensions.ExtensionDtype):
        vals = vals.astype("float64")
    if direction not in ("trailing", "forward"):
        raise ValueError(f"direction must be 'trailing' or 'forward', got {direction!r}")
    v_axis = vals.to_numpy()
    if direction == "forward":
        # adj is globally non-decreasing (entity-major sort), so −adj
        # reversed is too; a trailing window on that axis is exactly the
        # forward window [adj, adj + w] in original order
        adj_axis, v_axis = -adj[::-1], v_axis[::-1]
    else:
        adj_axis = adj
    tmp = pd.DataFrame(
        {"__adj": adj_axis.view("datetime64[us]"), "__v": v_axis}
    )
    if ties not in ("row", "peers"):
        raise ValueError(f"ties must be 'row' or 'peers', got {ties!r}")
    r = tmp.rolling(window=pd.Timedelta(window), on="__adj", closed="both")["__v"]
    for agg in aggs:
        out = getattr(r, agg)().to_numpy()
        if direction == "forward":
            out = out[::-1]
        if agg == "count":
            out = out.astype(np.int64)
        df[f"{prefix}{agg}"] = out
    if ties == "peers" and len(df):
        # the row of an equal-(entity, ts) group whose row-ordered window
        # holds the full peer set is the LAST one for trailing frames and
        # the FIRST one for forward frames; broadcast it across the group
        pick = "last" if direction == "trailing" else "first"
        cols = [f"{prefix}{a}" for a in aggs]
        df[cols] = df.groupby([entity_col, ts_col], sort=False)[cols].transform(pick)
    return df


def with_lag(
    ds,
    entity_col: str,
    ts_col: str,
    cols,
    *,
    k: int = 1,
    lead: bool = False,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
    suffix: str | None = None,
):
    """Add ``lag{k}_<col>`` (or ``lead{k}_<col>``) within each entity (W2)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    shift = -k if lead else k
    name = suffix if suffix is not None else (f"lead{k}_" if lead else f"lag{k}_")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(entity_col, sort=False)
        for c in cols:
            df[f"{name}{c}"] = g[c].shift(shift)
        return df

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def with_backfill(
    ds,
    entity_col: str,
    ts_col: str,
    cols,
    *,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Forward-fill nulls from the nearest EARLIER row of the same entity
    (W1 — "backfill" in the north-star's sense: filling gaps backward in
    time never forward, so no leakage)."""
    cols = [cols] if isinstance(cols, str) else list(cols)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(entity_col, sort=False)
        for c in cols:
            df[c] = g[c].ffill()
        return df

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def with_sessionize(
    ds,
    entity_col: str,
    ts_col: str,
    *,
    gap: str | pd.Timedelta = "30min",
    out_col: str = "session_id",
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Gap-based session ids per entity (W3): a new session starts when
    ts − prev_ts > gap; ids are 0-based per entity."""
    gap_us = int(pd.Timedelta(gap).value // 1000)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _sessionize_frame(df, entity_col, ts_col, gap_us, out_col)

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def with_rolling(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    window: str | pd.Timedelta = "1h",
    aggs: tuple[str, ...] = ("count", "sum"),
    prefix: str | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
    ties: str = "row",
):
    """Trailing rolling aggregates over [ts − window, ts] per entity (W4)."""
    prefix = prefix if prefix is not None else f"roll_{value_col}_"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _rolling_frame(df, entity_col, ts_col, value_col, window, aggs,
                              prefix, ties=ties)

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def with_forward_rolling(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    window: str | pd.Timedelta = "1h",
    aggs: tuple[str, ...] = ("count", "sum"),
    prefix: str | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
    ties: str = "row",
):
    """FORWARD rolling aggregates over [ts, ts + window] per entity — the
    LABEL window (e.g. "purchases in the next hour").  Forward-looking by
    construction: legitimate ONLY for label/target columns, never for
    features (same contract as ``lead`` — see the module leakage note)."""
    prefix = prefix if prefix is not None else f"fwd_{value_col}_"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _rolling_frame(df, entity_col, ts_col, value_col, window, aggs,
                              prefix, ties=ties, direction="forward")

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def _decayed_sum_frame(
    df: pd.DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tau_us: float,
    out_col: str,
    chunk_exponent: float = 200.0,
) -> pd.DataFrame:
    """Trailing exponentially-decayed sum per entity:
    ``s_i = Σ_{j ≤ i} v_j · exp(−(t_i − t_j)/τ)`` (current row included,
    strictly backward in time — leakage-safe).

    Vectorized as ONE pass, no per-entity loop: within entity-relative
    time chunks of width ``chunk_exponent·τ`` the sum factorizes to
    ``exp(−(t_i−g)/τ) · cumsum(v_j · exp((t_j−g)/τ))`` (well-conditioned:
    the cumsum grows monotonically with the exponent, so relative error
    stays ~n·eps); across chunks the carry is a constant-ratio
    ``S_k = (S_{k−1} + U_{k−1}) · exp(−E)`` recurrence evaluated with a
    loop over CHUNK ordinals (span/(E·τ) iterations, each an O(entities)
    vector op).  Null values contribute 0.
    """
    n = len(df)
    if n == 0:
        df[out_col] = pd.Series(dtype="float64")
        return df
    E = float(chunk_exponent)
    ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    codes = pd.factorize(df[entity_col], use_na_sentinel=False)[0].astype(np.int64)
    new_ent = np.empty(n, dtype=bool)
    new_ent[0] = True
    new_ent[1:] = codes[1:] != codes[:-1]
    first_idx = np.maximum.accumulate(np.where(new_ent, np.arange(n), 0))
    t0 = ts[first_idx]
    chunk_us = max(int(E * tau_us), 1)
    m = (ts - t0) // chunk_us
    n_ent = int(codes.max()) + 1
    max_m = int(m.max()) + 1
    if n_ent * max_m > 50_000_000:
        raise ValueError(
            f"decayed_sum: {n_ent} entities × {max_m} decay chunks exceeds the "
            f"carry-matrix bound — tau ({tau_us/1e6:.3g}s) is far smaller than "
            "the entity time span; increase tau or chunk_exponent"
        )
    rel = (ts - (t0 + m * chunk_us)).astype(np.float64) / tau_us  # ∈ [0, E)
    v = np.nan_to_num(df[value_col].to_numpy(dtype=np.float64))
    w = v * np.exp(rel)
    new_seg = new_ent.copy()
    new_seg[1:] |= m[1:] != m[:-1]
    # TRUE segmented cumsum (pandas C kernel) — a global cumsum minus
    # per-segment offsets absorbs small segments catastrophically when a
    # neighboring segment's w terms sit at e^E scale
    seg_id = np.cumsum(new_seg)
    segcum = pd.Series(w).groupby(seg_id).cumsum().to_numpy()
    # chunk-level forward sums and the decayed carry matrix
    U = np.zeros((n_ent, max_m))
    np.add.at(U, (codes, m), w)
    S = np.zeros((n_ent, max_m))
    r = np.exp(-E)  # may underflow to 0 — mathematically negligible carry
    for k in range(1, max_m):
        S[:, k] = (S[:, k - 1] + U[:, k - 1]) * r
    carry = S[codes, m]
    df[out_col] = np.exp(-rel) * (segcum + carry)
    return df


def with_decayed_sum(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    tau: str | pd.Timedelta = "1h",
    half_life: str | pd.Timedelta | None = None,
    out_col: str | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Trailing exponentially-decayed value sum per entity at each event
    (recency-weighted activity — the feature a plain rolling sum
    approximates with a hard cutoff).  ``tau`` is the e-folding time;
    pass ``half_life`` instead to specify the half-life (τ = h/ln 2)."""
    if half_life is not None:
        tau_us = pd.Timedelta(half_life).value / 1000.0 / np.log(2.0)
    else:
        tau_us = float(pd.Timedelta(tau).value // 1000)
    out_col = out_col if out_col is not None else f"decayed_{value_col}"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _decayed_sum_frame(df, entity_col, ts_col, value_col, tau_us, out_col)

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def _ewma_frame(
    df: pd.DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tau_us: float,
    mean_col: str,
    z_col: str,
    min_prev: int,
    min_weight: float,
) -> pd.DataFrame:
    """EWMA mean + leakage-safe anomaly z-score over a sorted frame.

    At row i with weights ``w_j = exp(-(t_i - t_j)/tau)`` over rows j ≤ i
    of the same entity (null values carry weight 0):

      ``mean_col = Σ w_j v_j / Σ w_j``                (current row included)
      ``z_col   = (v_i − m_prev) / sqrt(var_prev)``   (PREVIOUS rows only)

    where m_prev / var_prev come from subtracting the current row's unit
    weight from the three decayed sums (Σw, Σwv, Σwv²).  z is null unless
    the row's value is non-null, the entity has ≥ ``min_prev`` previous
    non-null events, the previous-window EFFECTIVE sample size Σw_prev is
    ≥ ``min_weight``, and var_prev > 0 — the anomaly score never
    conditions on the value it is scoring (zero temporal leakage).  The
    min_weight gate is a numerical-conditioning requirement, not a
    nicety: when every previous event is many τ old, Σw_prev → 0 and
    var_prev = svv/sw − (sv/sw)² cancels catastrophically, turning ulp
    drift into unbounded z noise (measured: z≈2460 disagreeing at the
    1e-6 grid).  The variance expression is written in exactly the
    association the SQL oracle uses so both sides agree on the grid.
    """
    n = len(df)
    v_raw = pd.to_numeric(df[value_col], errors="coerce")
    nn = v_raw.notna().to_numpy()
    v = np.nan_to_num(v_raw.to_numpy(dtype=np.float64))
    df["_fx_w"] = nn.astype(np.float64)
    df["_fx_v2"] = v * v
    # the three decayed sums share one kernel (chunked segmented cumsum)
    df = _decayed_sum_frame(df, entity_col, ts_col, value_col, tau_us, "_fx_sv")
    df = _decayed_sum_frame(df, entity_col, ts_col, "_fx_v2", tau_us, "_fx_svv")
    df = _decayed_sum_frame(df, entity_col, ts_col, "_fx_w", tau_us, "_fx_sw")
    if n == 0:
        df[mean_col] = pd.Series(dtype="float64")
        df[z_col] = pd.Series(dtype="float64")
        return df.drop(columns=["_fx_w", "_fx_v2", "_fx_sv", "_fx_svv", "_fx_sw"])
    sv = df["_fx_sv"].to_numpy()
    svv = df["_fx_svv"].to_numpy()
    sw = df["_fx_sw"].to_numpy()
    # exact integer count of previous non-null events per entity (the
    # min_prev gate must be bit-exact vs the oracle's COUNT)
    codes = pd.factorize(df[entity_col], use_na_sentinel=False)[0]
    cnt_prev = (
        pd.Series(nn.astype(np.int64)).groupby(codes).cumsum().to_numpy()
        - nn.astype(np.int64)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        mean = np.where(sw > 0, sv / sw, np.nan)
        swp = sw - nn.astype(np.float64)
        svp = sv - v
        svvp = svv - v * v
        mp = svp / swp
        varp = svvp / swp - mp * mp
        ok = nn & (cnt_prev >= min_prev) & (swp >= min_weight) & (varp > 0)
        z = np.where(ok, (v - mp) / np.sqrt(np.where(ok, varp, 1.0)), np.nan)
    df[mean_col] = mean
    df[z_col] = z
    return df.drop(columns=["_fx_w", "_fx_v2", "_fx_sv", "_fx_svv", "_fx_sw"])


def with_ewma(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    tau: str | pd.Timedelta = "1h",
    half_life: str | pd.Timedelta | None = None,
    min_prev: int = 2,
    min_weight: float = 2.0,
    mean_col: str | None = None,
    z_col: str | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Trailing EWMA mean and a leakage-safe anomaly z-score per entity at
    each event (streaming anomaly detection: "how surprising is this value
    given the entity's recency-weighted history?").

    One bucketed exchange; the three decayed sums (Σw, Σwv, Σwv²) run the
    same vectorized chunked kernel as :func:`with_decayed_sum` inside a
    single sorted scan.  The z-score uses PREVIOUS rows only (current row
    subtracted from the sums) and is null until the entity has ≥
    ``min_prev`` previous non-null events AND previous effective sample
    size Σw ≥ ``min_weight`` (a stale history cannot anchor a variance)
    with positive variance — zero temporal leakage (BASELINE.json:6).
    """
    if half_life is not None:
        tau_us = pd.Timedelta(half_life).value / 1000.0 / np.log(2.0)
    else:
        tau_us = float(pd.Timedelta(tau).value // 1000)
    mean_col = mean_col if mean_col is not None else f"ewma_{value_col}"
    z_col = z_col if z_col is not None else f"ewma_z_{value_col}"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _ewma_frame(
            df, entity_col, ts_col, value_col, tau_us, mean_col, z_col,
            min_prev, min_weight,
        )

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def with_time_to_event(
    ds,
    entity_col: str,
    ts_col: str,
    target_col: str,
    *,
    horizon: str | pd.Timedelta | None = None,
    tte_col: str = "tte_s",
    observed_col: str = "observed",
    since_col: str | None = "since_s",
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Survival / time-to-event labels per entity (churn, LTV, next-
    purchase models): for every event, the seconds until the NEXT
    strictly-later target event of the same entity, right-censored at
    ``horizon``, plus the backward recency feature (seconds since the
    most recent strictly-earlier target event).

    ``target_col``: name of a BOOLEAN column marking target events
    (compute it upstream — e.g. ``event_type == 'purchase'``).

    Censoring semantics (standard survival encoding): with a horizon H,
    ``tte_col`` = Δ and ``observed_col`` = 1 when a target falls within
    H seconds, else ``tte_col`` = H and ``observed_col`` = 0 — never
    null, directly consumable by a Cox / AFT fit.  With ``horizon=None``
    the label is uncensored: Δ or null, ``observed_col`` = notnull.
    ``since_col`` is null before the entity's first target (no silent 0
    — "never purchased" ≠ "purchased just now"); pass None to skip it.

    "Strictly later/earlier" is ROW order (ts, then tiebreaks), so a
    target event's own row looks FORWARD to the next target, not at
    itself — the label never leaks its own outcome.  One bucketed
    exchange; inside a bucket the forward pass is a reversed cython
    ``groupby.cummin`` and the backward pass a ``groupby.cummax`` —
    no per-row Python.
    """
    horizon_us = (int(pd.Timedelta(horizon).value // 1000)
                  if horizon is not None else None)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = (df[ts_col].to_numpy().astype("datetime64[us]")
             .astype(np.int64))  # µs since epoch, resolution-normalized
        m = df[target_col].fillna(False).to_numpy(dtype=bool)
        ent = df[entity_col]
        # µs epochs (~1.7e15) are exact in float64 (< 2^53).  ±inf, not
        # NaN, as the "no target" sentinel: groupby cummin/cummax leave
        # NaN positions NaN instead of carrying the running extremum.
        tt = pd.Series(np.where(m, t.astype(np.float64), np.inf),
                       index=df.index)
        g_rev = tt.iloc[::-1].groupby(ent.iloc[::-1], sort=False)
        incl_next = g_rev.cummin().iloc[::-1]           # ≥ current row
        nxt = incl_next.groupby(ent, sort=False).shift(-1)  # strictly after
        delta = (nxt.to_numpy() - t) / 1e6
        delta = np.where(np.isfinite(delta), delta, np.nan)
        if horizon_us is not None:
            h_s = horizon_us / 1e6
            obs = np.where(np.isnan(delta), False, delta <= h_s)
            df[tte_col] = np.where(obs, delta, h_s)
            df[observed_col] = obs.astype(np.int64)
        else:
            df[tte_col] = delta
            df[observed_col] = (~np.isnan(delta)).astype(np.int64)
        if since_col is not None:
            bt = pd.Series(np.where(m, t.astype(np.float64), -np.inf),
                           index=df.index)
            incl_prev = bt.groupby(ent, sort=False).cummax()
            prv = incl_prev.groupby(ent, sort=False).shift(1)
            since = (t - prv.to_numpy()) / 1e6
            df[since_col] = np.where(np.isfinite(since), since, np.nan)
        return df

    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets,
        tiebreak_cols=tiebreak_cols,
    )


__all__.append("with_time_to_event")


def make_windows_frame_fn(
    entity_col: str,
    ts_col: str,
    *,
    lag_cols=(),
    lag_k: int = 1,
    backfill_cols=(),
    session_gap: str | None = None,
    session_col: str = "session_id",
    rolling: dict | None = None,
):
    """DataFrame→DataFrame window kernel over a (entity, ts)-sorted frame.

    Factored out so fused stages (e.g. the as-of join's ``window_fn``
    hook) can run ALL window features inside an existing entity-bucketed
    shuffle instead of paying a second exchange."""
    gap_us = int(pd.Timedelta(session_gap).value // 1000) if session_gap else None

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(entity_col, sort=False)
        for c in [lag_cols] if isinstance(lag_cols, str) else list(lag_cols):
            df[f"lag{lag_k}_{c}"] = g[c].shift(lag_k)
        for c in (
            [backfill_cols] if isinstance(backfill_cols, str) else list(backfill_cols)
        ):
            df[c] = g[c].ffill()
        if gap_us is not None:
            df = _sessionize_frame(df, entity_col, ts_col, gap_us, session_col)
        if rolling:
            df = _rolling_frame(
                df,
                entity_col,
                ts_col,
                rolling["value_col"],
                rolling.get("window", "1h"),
                tuple(rolling.get("aggs", ("count", "sum"))),
                rolling.get("prefix", f"roll_{rolling['value_col']}_"),
                ties=rolling.get("ties", "row"),
            )
        return df

    return fn


def with_windows(
    ds,
    entity_col: str,
    ts_col: str,
    *,
    lag_cols=(),
    lag_k: int = 1,
    backfill_cols=(),
    session_gap: str | None = None,
    session_col: str = "session_id",
    rolling: dict | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Fused one-pass variant: all requested window features in a SINGLE
    shuffle + scan (at 100 TB, four separate scans would mean four
    shuffles)."""
    fn = make_windows_frame_fn(
        entity_col,
        ts_col,
        lag_cols=lag_cols,
        lag_k=lag_k,
        backfill_cols=backfill_cols,
        session_gap=session_gap,
        session_col=session_col,
        rolling=rolling,
    )
    return sorted_scan(
        ds, entity_col, ts_col, fn, num_buckets=num_buckets, tiebreak_cols=tiebreak_cols
    )


def _ntile_vec(rn: np.ndarray, n: np.ndarray, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based row numbers and per-row group sizes:
    the first n % k tiles get ⌈n/k⌉ rows, the rest ⌊n/k⌋ (vectorized
    across groups of different sizes)."""
    q, r = n // k, n % k
    big = r * (q + 1)  # rows covered by the ⌈n/k⌉-sized tiles
    in_big = rn <= big
    tile_big = (rn - 1) // (q + 1) + 1
    tile_small = r + (rn - 1 - big) // np.maximum(q, 1) + 1
    return np.where(in_big, tile_big, tile_small).astype(np.int64)


def with_ranks(
    ds,
    part_col: str,
    order_col: str,
    *,
    ntile: int | None = None,
    prefix: str = "",
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Per-partition rank features ordered ascending by ``order_col``:
    row_number / rank / dense_rank / percent_rank (+ ntile_k when asked)
    — the SQL window-rank family as one bucketed scan.  Ties on
    ``order_col`` share rank/dense_rank/percent_rank/cume_dist;
    row_number and ntile need a total order, so pass unique
    ``tiebreak_cols`` for deterministic output (descending order = rank
    the negated column).  percent_rank = (rank − 1)/(n − 1), 0 for
    single-row partitions; cume_dist = rank_max/n — both exact integer
    divisions, bit-identical to the SQL oracle."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(part_col, sort=False)
        rn = (g.cumcount() + 1).to_numpy(dtype=np.int64)
        rnk = g[order_col].rank(method="min").to_numpy(dtype=np.int64)
        drnk = g[order_col].rank(method="dense").to_numpy(dtype=np.int64)
        rmax = g[order_col].rank(method="max").to_numpy(dtype=np.int64)
        n = g[order_col].transform("size").to_numpy(dtype=np.int64)
        pct = np.where(n > 1, (rnk - 1) / np.maximum(n - 1, 1), 0.0)
        df[f"{prefix}row_number"] = rn
        df[f"{prefix}rank"] = rnk
        df[f"{prefix}dense_rank"] = drnk
        df[f"{prefix}percent_rank"] = pct
        df[f"{prefix}cume_dist"] = rmax / n
        if ntile is not None:
            df[f"{prefix}ntile_{ntile}"] = _ntile_vec(rn, n, int(ntile))
        return df

    return sorted_scan(
        ds, part_col, order_col, fn,
        num_buckets=num_buckets, tiebreak_cols=tiebreak_cols,
    )


def with_cumulative(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    aggs: tuple[str, ...] = ("count", "sum"),
    prefix: str | None = None,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Running (expanding) aggregates per entity in event-time order,
    INCLUSIVE of the current row — SQL's ``ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW`` (e.g. a user's cumulative spend as of
    each event).  Strictly-prior variants compose as with_lag of these
    columns.  aggs ⊆ {count, sum, mean, min, max}; pandas C group
    kernels, one bucketed exchange."""
    prefix = prefix if prefix is not None else f"cum_{value_col}_"
    bad = set(aggs) - {"count", "sum", "mean", "min", "max"}
    if bad:
        raise ValueError(f"unsupported cumulative aggs: {sorted(bad)}")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(entity_col, sort=False)
        cnt = (g.cumcount() + 1).to_numpy(dtype=np.int64)
        if "count" in aggs:
            df[f"{prefix}count"] = cnt
        if "sum" in aggs or "mean" in aggs:
            s = g[value_col].cumsum().to_numpy(dtype=np.float64)
            if "sum" in aggs:
                df[f"{prefix}sum"] = s
            if "mean" in aggs:
                df[f"{prefix}mean"] = s / cnt
        if "min" in aggs:
            df[f"{prefix}min"] = g[value_col].cummin()
        if "max" in aggs:
            df[f"{prefix}max"] = g[value_col].cummax()
        return df

    return sorted_scan(
        ds, entity_col, ts_col, fn,
        num_buckets=num_buckets, tiebreak_cols=tiebreak_cols,
    )


def with_session_stats(
    ds,
    entity_col: str,
    ts_col: str,
    *,
    gap: str | pd.Timedelta = "30min",
    value_col: str | None = None,
    session_col: str = "session_id",
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Sessionize AND aggregate per session in the SAME bucketed scan:
    one row per (entity, session) with event count, start/end ts,
    duration in seconds (microsecond-exact) and, when ``value_col`` is
    given, the session's value sum.  Sessions never cross entities and
    entities never cross buckets, so the fused group-by is exact with
    zero additional exchange — the two-pass alternative (sessionize →
    keyed shuffle → aggregate) pays a second all-to-all for nothing."""
    gap_us = int(pd.Timedelta(gap).value // 1000)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = _sessionize_frame(df, entity_col, ts_col, gap_us, session_col)
        g = df.groupby([entity_col, session_col], sort=False)
        out = pd.DataFrame(index=g.size().index)
        out["n_events"] = g.size()
        out["t_start"] = g[ts_col].min()
        out["t_end"] = g[ts_col].max()
        dur = (
            out["t_end"].to_numpy().astype("datetime64[us]").astype(np.int64)
            - out["t_start"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        out["duration_secs"] = dur / 1e6
        if value_col is not None:
            out[f"sum_{value_col}"] = g[value_col].sum()
        return out.reset_index()

    return sorted_scan(
        ds, entity_col, ts_col, fn,
        num_buckets=num_buckets, tiebreak_cols=tiebreak_cols,
    )


def funnel(ds, entity_col: str, ts_col: str, type_col: str, steps,
           *, num_buckets: int = 64,
           completed_col: str = "completed",
           steps_col: str = "steps_completed",
           completion_ts_col: str = "completion_ts"):
    """Ordered event-SEQUENCE completion per entity (funnel analysis):
    did the entity perform step₁ < step₂ < … < stepₖ at strictly
    increasing timestamps?  Greedy-earliest matching — take the first
    step₁, the first step₂ after it, and so on — which decides
    EXISTENCE exactly (if any increasing subsequence exists, the greedy
    one completes), so the result is order-deterministic with no
    tiebreak needed.

    Emits one row per entity: ``steps_completed`` (how deep the entity
    got, 0..k), ``completed``, and ``completion_ts`` (the final step's
    greedy timestamp; null when incomplete).

    Scale shape: one blob-packed exchange keyed on the entity (the
    engine-standard ``bucketed_map_groups``); inside a bucket the match
    is k vectorized passes — boolean mask → strict-after filter against
    the previous step's per-entity time → grouped min — never a
    per-event Python loop.  Mirrors the SQL oracle's chained
    ``min(ts) … WHERE ts > prev`` CTEs bit-for-bit."""
    import pyarrow as pa

    from .partition import bucketed_map_groups

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")

    def per_bucket(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        users = pd.unique(df[entity_col])
        prev = None
        reached = []
        for i, step in enumerate(steps):
            sel = df[df[type_col] == step]
            if i > 0:
                pt = sel[entity_col].map(prev).to_numpy()
                keep = sel[ts_col].to_numpy() > pt  # NaT compares False
                sel = sel[keep]
            t = sel.groupby(entity_col, sort=False)[ts_col].min()
            prev = t.reindex(users)
            reached.append(prev.notna().to_numpy())
        n_steps = np.sum(np.stack(reached), axis=0).astype(np.int64)
        out = pd.DataFrame({
            entity_col: users,
            steps_col: n_steps,
            completed_col: reached[-1],
            completion_ts_col: prev.to_numpy(),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    pruned = ds.select_columns([entity_col, ts_col, type_col])
    return bucketed_map_groups(pruned, entity_col, per_bucket,
                               num_buckets=num_buckets, seed=17)


__all__.append("funnel")


def run_length_stats(
    ds,
    entity_col: str,
    ts_col: str,
    flag_col: str,
    *,
    min_run: int = 3,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Gaps-and-islands run statistics per entity: lengths of maximal
    runs of CONSECUTIVE flag=True events in time order — the
    consecutive-anomaly / streak detector ("N failures in a row", "k
    consecutive days active").  Emits one row per entity that has at
    least one True run: (entity, n_runs, max_run, long_runs) where
    ``long_runs`` counts runs of length ≥ ``min_run``.

    One bucketed exchange (entities never split); inside a bucket the
    island decomposition is fully vectorized: a run STARTS where the
    flag is True and (previous row's flag is False, or the row opens a
    new entity segment) — cumsum of starts numbers the islands, one
    bincount measures them.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 "n_runs": pd.Series(dtype=np.int64),
                                 "max_run": pd.Series(dtype=np.int64),
                                 "long_runs": pd.Series(dtype=np.int64)})
        fl = df[flag_col].fillna(False).to_numpy(dtype=bool)
        ent = df[entity_col].to_numpy()
        new_ent = np.ones(len(df), dtype=bool)
        new_ent[1:] = ent[1:] != ent[:-1]
        prev_false = np.ones(len(df), dtype=bool)
        prev_false[1:] = ~fl[:-1]
        start = fl & (prev_false | new_ent)
        island = np.cumsum(start) - 1          # id per True row; -1 pad ok
        lens = np.bincount(island[fl]) if fl.any() else np.empty(0, np.int64)
        if not fl.any():
            return pd.DataFrame({entity_col: ent[:0], "n_runs": [],
                                 "max_run": [], "long_runs": []})
        run_ent = ent[start]                   # entity of each run, in order
        out = (pd.DataFrame({entity_col: run_ent, "__len": lens})
               .groupby(entity_col, sort=False)["__len"]
               .agg(n_runs="size", max_run="max",
                    long_runs=lambda s: int((s >= min_run).sum()))
               .reset_index())
        out["n_runs"] = out["n_runs"].astype(np.int64)
        out["max_run"] = out["max_run"].astype(np.int64)
        out["long_runs"] = out["long_runs"].astype(np.int64)
        return out

    return sorted_scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets,
                       tiebreak_cols=tiebreak_cols)


__all__.append("run_length_stats")


def hopping_window_agg(
    ds,
    ts_col: str,
    value_col: str,
    *,
    window: str | pd.Timedelta = "1h",
    hop: str | pd.Timedelta = "15m",
    group_cols=None,
    num_buckets: int = 16,
):
    """HOPPING (sliding-grid) window aggregate: count + sum of
    ``value_col`` per overlapping window of length ``window`` advancing
    every ``hop`` — the streaming-dashboard window that tumbling grids
    can't express (an event at :59 must count toward the window that
    opened at :45).  ``window`` must be a whole multiple of ``hop``.

    Scale shape: each event expands to exactly ``window/hop`` grid rows
    (a bounded vectorized repeat inside ``map_batches`` — no range join,
    no per-window scan), and the expansion feeds the standard
    partial-aggregated groupby, so the exchange carries pre-combined
    (window, partial) rows, not the expanded events.  Window starts are
    epoch-aligned (``floor(ts/hop)·hop``), integer-µs arithmetic —
    bit-identical to the SQL mirror's ``floor(epoch_us(ts)/hop)``
    construction.

    Returns a Dataset ``(group_cols…, window_start, n, sum_value)``.
    """
    import pyarrow as pa

    from .groupagg import grouped_aggregate

    group_cols = ([group_cols] if isinstance(group_cols, str)
                  else list(group_cols or []))
    w_us = int(pd.Timedelta(window).value // 1000)
    h_us = int(pd.Timedelta(hop).value // 1000)
    if w_us <= 0 or h_us <= 0 or w_us % h_us:
        raise ValueError("window must be a positive whole multiple of hop")
    m = w_us // h_us

    def expand(t: pa.Table) -> pa.Table:
        ts = (t.column(ts_col).to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        n = len(ts)
        slot = ts // h_us          # ts ≥ epoch in this engine's tables
        ws = (np.repeat(slot, m) - np.tile(np.arange(m, dtype=np.int64), n)) \
            * h_us
        cols = {c: t.column(c).take(pa.array(np.repeat(np.arange(n), m)))
                for c in group_cols}
        cols["window_start"] = pa.array(ws.astype("datetime64[us]"),
                                        type=pa.timestamp("us"))
        cols["__v"] = pa.array(
            np.repeat(t.column(value_col).to_numpy(zero_copy_only=False)
                      .astype(np.float64), m))
        return pa.table(cols)

    expanded = ds.select_columns(
        [*group_cols, ts_col, value_col]
    ).map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_aggregate(
        expanded, [*group_cols, "window_start"],
        {"n": ("__v", "count"), "sum_value": ("__v", "sum")},
        num_buckets=num_buckets,
    )


__all__.append("hopping_window_agg")


def cusum_stats(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Per-entity CUSUM change-point score: the standardized maximum
    cumulative deviation of the (ts, tiebreak)-ordered value series,

        cusum = max_k |Σ_{i≤k}(xᵢ − x̄)| / (s·√n)        (s = ddof-1 std)

    — large when the series' mean SHIFTS mid-stream (regime change,
    instrumentation break), near the Brownian-bridge range (~0.3–1.2)
    when stationary.  Vectorized per bucket: cumdev_k = cumsum_k − k·x̄
    needs only groupby cumsum/cumcount — no per-entity loop.  Entities
    with n < 2 or zero variance are dropped (the oracle's HAVING).

    Returns one row per entity: ``(entity_col, n, cusum)``.
    """
    from .partition import sorted_scan as _scan

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 "n": pd.Series(dtype=np.int64),
                                 "cusum": pd.Series(dtype=np.float64)})
        g = df.groupby(entity_col, sort=False)[value_col]
        mu = g.transform("mean").to_numpy(dtype=np.float64)
        cs = g.cumsum().to_numpy(dtype=np.float64)
        k = (g.cumcount() + 1).to_numpy(dtype=np.float64)
        df = df.assign(__dev=np.abs(cs - k * mu))
        agg = (df.groupby(entity_col, sort=False)
                 .agg(n=(value_col, "size"), __mx=("__dev", "max"),
                      __sd=(value_col, "std"))
                 .reset_index())
        agg = agg[(agg["n"] >= 2) & (agg["__sd"] > 0)]
        out = agg[[entity_col]].copy()
        out["n"] = agg["n"].to_numpy(dtype=np.int64)
        out["cusum"] = (agg["__mx"]
                        / (agg["__sd"] * np.sqrt(agg["n"]))).to_numpy()
        return out

    return _scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets,
                 tiebreak_cols=tiebreak_cols)


__all__.append("cusum_stats")


def time_weighted_avg(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Per-entity TIME-WEIGHTED average under zero-order hold: each
    sample holds its value until the next sample, so

        twa = Σᵢ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t₁)

    — the irregular-sampling mean (sensor/price/state series), where
    the arithmetic mean over-weights bursts.  The last sample carries
    no weight (nothing is held after it).  Entities with fewer than two
    rows or zero time span are dropped (the oracle's HAVING).  Deltas
    are exact integer µs; one sorted bucketed scan, vectorized shift —
    no per-entity loop.

    Returns one row per entity: ``(entity_col, n, span_us, twa)``.
    """
    from .partition import sorted_scan as _scan

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 "n": pd.Series(dtype=np.int64),
                                 "span_us": pd.Series(dtype=np.int64),
                                 "twa": pd.Series(dtype=np.float64)})
        ts = (df[ts_col].to_numpy().astype("datetime64[us]")
              .astype(np.int64))
        g = df.groupby(entity_col, sort=False)
        nxt = g[ts_col].shift(-1)
        last = nxt.isna().to_numpy()        # NaT casts to INT64_MIN, mask first
        nxt_us = (nxt.to_numpy().astype("datetime64[us]")
                  .astype(np.int64).astype(np.float64))
        delta = np.where(last, 0.0, nxt_us - ts)   # µs to next row
        v = df[value_col].to_numpy(dtype=np.float64)
        df = df.assign(__num=v * delta)
        agg = (df.groupby(entity_col, sort=False)
                 .agg(n=(value_col, "size"), __num=("__num", "sum"),
                      __mn=(ts_col, "min"), __mx=(ts_col, "max"))
                 .reset_index())
        span = (agg["__mx"].to_numpy().astype("datetime64[us]")
                .astype(np.int64)
                - agg["__mn"].to_numpy().astype("datetime64[us]")
                .astype(np.int64))
        agg["span_us"] = span
        agg = agg[(agg["n"] >= 2) & (agg["span_us"] > 0)]
        out = agg[[entity_col]].copy()
        out["n"] = agg["n"].to_numpy(dtype=np.int64)
        out["span_us"] = agg["span_us"].to_numpy(dtype=np.int64)
        out["twa"] = (agg["__num"]
                      / agg["span_us"].astype(np.float64)).to_numpy()
        return out

    return _scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets,
                 tiebreak_cols=tiebreak_cols)


__all__.append("time_weighted_avg")


def user_trend_spearman(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    min_rows: int = 3,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Per-entity Spearman trend: rank correlation between time order
    (1..n) and the value's average-tie rank — the MONOTONIC-trend
    strength ("is this user's value drifting up?"), robust where the
    OLS slope (``user_value_trend``) is hostage to outliers.

        ρ = Pearson(rn, rank_avg(value))      within each entity

    computed from sufficient statistics over the bucketed sorted scan
    (pandas ``rank(method="average")`` per entity — C kernel, no Python
    loop).  Entities with < ``min_rows`` rows or zero rank variance
    (all values equal) are dropped (the oracle's HAVING).

    Returns ``(entity_col, n, spearman)``.
    """
    from .partition import sorted_scan as _scan

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({entity_col: df[entity_col],
                                 "n": pd.Series(dtype=np.int64),
                                 "spearman": pd.Series(dtype=np.float64)})
        g = df.groupby(entity_col, sort=False)
        x = (g.cumcount() + 1).to_numpy(dtype=np.float64)
        y = g[value_col].rank(method="average").to_numpy(dtype=np.float64)
        df = df.assign(__x=x, __y=y, __xy=x * y, __xx=x * x, __yy=y * y)
        a = (df.groupby(entity_col, sort=False)
               .agg(n=("__x", "size"), sx=("__x", "sum"),
                    sy=("__y", "sum"), sxy=("__xy", "sum"),
                    sxx=("__xx", "sum"), syy=("__yy", "sum"))
               .reset_index())
        n = a["n"].to_numpy(dtype=np.float64)
        vx = a["sxx"] - a["sx"] ** 2 / n
        vy = a["syy"] - a["sy"] ** 2 / n
        cov = a["sxy"] - a["sx"] * a["sy"] / n
        ok = (a["n"] >= min_rows) & (vx > 0) & (vy > 0)
        out = a.loc[ok, [entity_col]].copy()
        out["n"] = a.loc[ok, "n"].to_numpy(dtype=np.int64)
        out["spearman"] = (cov[ok] / np.sqrt(vx[ok] * vy[ok])).to_numpy()
        return out

    return _scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets,
                 tiebreak_cols=tiebreak_cols)


__all__.append("user_trend_spearman")


def user_theil_sen(
    ds,
    entity_col: str,
    ts_col: str,
    value_col: str,
    *,
    min_pairs: int = 1,
    max_points: int = 2000,
    num_buckets: int = 64,
    tiebreak_cols: tuple[str, ...] = (),
):
    """Per-entity Theil–Sen slope: the MEDIAN of all pairwise slopes
    (vⱼ−vᵢ)/(tⱼ−tᵢ) over i<j with tᵢ≠tⱼ — the 29%-breakdown robust
    trend estimator completing the family (``user_value_trend`` = OLS,
    poisoned by one outlier; ``user_trend_spearman`` = direction only;
    Theil–Sen = a robust SLOPE in value-units/second).

    Time enters as epoch MICROSECONDS cast to float64 (resolution-
    stable per the parquet convention), so an SQL oracle mirrors each
    slope bit-for-bit with ``(b.value−a.value)/(epoch_us(b.ts)−
    epoch_us(a.ts))``; the median of an even count averages the two
    middle slopes (np.median == quantile_cont(0.5) up to one ulp —
    pin with a round grid).

    Scale shape: one bucketed sorted-scan exchange (entities never
    split); the O(n²) pair enumeration is per-entity and vectorized
    (triu index arithmetic, no Python loop over pairs).  ``max_points``
    guards the quadratic blow-up LOUDLY — an entity series longer than
    that should be pre-thinned (``sample_k_per_user``) rather than
    silently subsampled here, so engine and oracle stay comparable.

    Entities with fewer than ``min_pairs`` valid pairs are dropped
    (the oracle's HAVING).  Returns ``(entity_col, n_pairs,
    theil_sen)``.
    """
    from .partition import sorted_scan as _scan

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for key, g in df.groupby(entity_col, sort=False):
            n = len(g)
            if n > max_points:
                raise ValueError(
                    f"user_theil_sen: entity {key!r} has {n} rows > "
                    f"max_points={max_points}; thin the series first "
                    "(sample_k_per_user) — a silent subsample here would "
                    "diverge from any oracle")
            if n < 2:
                continue
            t = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype(np.int64).astype(np.float64))
            v = g[value_col].to_numpy(dtype=np.float64)
            i, j = np.triu_indices(n, k=1)
            dt = t[j] - t[i]
            keep = dt != 0.0
            if not keep.any():
                continue
            slopes = (v[j][keep] - v[i][keep]) / dt[keep]
            if len(slopes) < min_pairs:
                continue
            out_rows.append((key, len(slopes), float(np.median(slopes))))
        return pd.DataFrame(out_rows,
                            columns=[entity_col, "n_pairs", "theil_sen"])

    return _scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets,
                 tiebreak_cols=tiebreak_cols)


__all__.append("user_theil_sen")


def linear_attribution(
    ds,
    entity_col: str,
    ts_col: str,
    type_col: str,
    *,
    touch_types: tuple[str, ...],
    conversion_type: str,
    window,
    decay: float | None = None,
    num_buckets: int = 64,
):
    """Multi-touch attribution: every ``conversion_type`` event
    distributes one unit of credit over the entity's ``touch_types``
    events in the preceding ``window`` — linear (equal split) by
    default, exponential position decay when ``decay`` is given
    (credit ∝ decay^(rank from conversion, nearest=0), normalized per
    conversion).  The marketing-analytics completion of the touch
    family (``first_last_touch`` = single-touch; this is fractional).

    One bucketed sorted-scan exchange co-partitioned on the entity;
    per entity the touch set is two ``searchsorted`` cuts per
    conversion (vectorized bounds; the inner credit assignment visits
    each (conversion, touch-in-window) pair once — bounded by the
    window, the same cost any windowed join pays).

    Credit fractions are exact small-integer ratios (1/k) or
    normalized geometric weights, so an SQL oracle (windowed self-join
    + COUNT per conversion) hash-matches on a round grid.  Returns
    ``(type_col, credit, n_conversions_touched)`` — total credit per
    touch type plus how many conversions each type touched.
    """
    from .partition import sorted_scan as _scan

    window_us = np.int64(pd.Timedelta(window).value // 1000)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        credit: dict[str, float] = {}
        touched: dict[str, int] = {}
        for _, g in df.groupby(entity_col, sort=False):
            t = (g[ts_col].to_numpy().astype("datetime64[us]")
                 .astype(np.int64))
            ty = g[type_col].to_numpy()
            is_touch = np.isin(ty, touch_types)
            tt = t[is_touch]
            tty = ty[is_touch]
            conv_t = t[ty == conversion_type]
            if not len(conv_t) or not len(tt):
                continue
            lo = np.searchsorted(tt, conv_t - window_us, side="left")
            hi = np.searchsorted(tt, conv_t, side="left")  # strictly before
            k = hi - lo
            m = k > 0
            lo, k = lo[m], k[m]
            if not k.size:
                continue
            # flatten every (conversion, touch-in-window) pair without a
            # Python loop: pair_conv repeats the conversion index, the
            # running offset rebuilds each window's local position
            pair_conv = np.repeat(np.arange(len(k)), k)
            pair_off = (np.arange(int(k.sum()))
                        - np.repeat(np.cumsum(k) - k, k))
            pair_touch = lo[pair_conv] + pair_off
            if decay is None:
                w = 1.0 / k[pair_conv]
            else:
                # nearest touch (latest in window) gets decay^0
                w = decay ** (k[pair_conv] - 1 - pair_off).astype(np.float64)
                w = w / np.bincount(pair_conv, weights=w)[pair_conv]
            codes, uniq = pd.factorize(tty[pair_touch])
            cr = np.bincount(codes, weights=w, minlength=len(uniq))
            # conversions touched: distinct (conversion, type) pairs
            dist = np.unique(pair_conv * np.int64(len(uniq)) + codes)
            tc = np.bincount((dist % len(uniq)).astype(np.int64),
                             minlength=len(uniq))
            for ti, typ in enumerate(uniq):
                credit[typ] = credit.get(typ, 0.0) + float(cr[ti])
                touched[typ] = touched.get(typ, 0) + int(tc[ti])
        return pd.DataFrame(
            [(k, credit[k], touched[k]) for k in sorted(credit)],
            columns=[type_col, "credit", "n_conversions_touched"])

    partials = _scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets)
    out = partials.to_pandas()
    if not len(out):
        return out
    return (out.groupby(type_col, sort=True)
            .agg(credit=("credit", "sum"),
                 n_conversions_touched=("n_conversions_touched", "sum"))
            .reset_index())


__all__.append("linear_attribution")
