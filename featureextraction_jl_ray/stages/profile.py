"""Column profiling — the `describe` of this engine: one row per column
with row/null counts, numeric min/max/mean/std (sample, ddof=1) and the
EXACT distinct count.

Scale shape: counts and moments come from ONE streaming mergeable pass
(per-block partials, constant-size merge state — no exchange); distinct
counts are inherently an exchange, so each profiled column runs a
hash-collapsed distinct (distinct values only through the shuffle, not
rows).  Profile a bounded column list (the default excludes binary /
nested types); at corpus scale swap the exact distinct for the HLL
sketch (``grouped_count_distinct_hll``) if ±2% suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns"]

_NUMERIC_KINDS = ("int", "uint", "float", "double", "decimal")


def _is_numeric(t: pa.DataType) -> bool:
    return (pa.types.is_integer(t) or pa.types.is_floating(t)
            or pa.types.is_decimal(t))


def _profilable(t: pa.DataType) -> bool:
    return not (pa.types.is_binary(t) or pa.types.is_large_binary(t)
                or pa.types.is_nested(t))


def profile_columns(ds, columns: list[str] | None = None) -> pd.DataFrame:
    """One row per column: (column, n, n_null, n_distinct, vmin, vmax,
    mean, std).  Non-numeric columns carry NULL numeric stats; distinct
    excludes nulls (SQL count(DISTINCT) convention)."""
    from ray.data.aggregate import AggregateFn

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    if columns is None:
        columns = [c for c in schema.names if _profilable(types[c])]
    numeric = [c for c in columns if _is_numeric(types[c])]

    def acc(state, block):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        out = dict(state) if state else {"__rows": 0}
        out["__rows"] = out.get("__rows", 0) + tbl.num_rows
        for c in columns:
            col = tbl.column(c)
            out[f"null:{c}"] = out.get(f"null:{c}", 0) + col.null_count
            if c in numeric and tbl.num_rows > col.null_count:
                x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
                x = x[~np.isnan(x)]
                if len(x):
                    out[f"sum:{c}"] = out.get(f"sum:{c}", 0.0) + float(x.sum())
                    out[f"sq:{c}"] = out.get(f"sq:{c}", 0.0) + float((x * x).sum())
                    out[f"cnt:{c}"] = out.get(f"cnt:{c}", 0) + len(x)
                    out[f"min:{c}"] = min(out.get(f"min:{c}", np.inf), float(x.min()))
                    out[f"max:{c}"] = max(out.get(f"max:{c}", -np.inf), float(x.max()))
        return out

    def merge(a, b):
        if not a:
            return b
        if not b:
            return a
        out = dict(a)
        for k, v in b.items():
            if k.startswith("min:"):
                out[k] = min(out.get(k, np.inf), v)
            elif k.startswith("max:"):
                out[k] = max(out.get(k, -np.inf), v)
            else:
                out[k] = out.get(k, 0) + v
        return out

    agg = AggregateFn(init=lambda _: {}, accumulate_block=acc, merge=merge,
                      name="profile")
    st = ds.aggregate(agg).get("profile") or {}

    distinct: dict[str, int] = {}
    for c in columns:
        dcol = (ds.select_columns([c])
                .map_batches(lambda b, col=c: b.filter(pc.is_valid(b.column(col))),
                             batch_format="pyarrow", zero_copy_batch=True)
                .groupby(c).count())
        distinct[c] = dcol.count()

    rows = []
    for c in columns:
        n_valid = st.get(f"cnt:{c}", 0)
        mean = st.get(f"sum:{c}", 0.0) / n_valid if n_valid else None
        if n_valid > 1:
            var = (st[f"sq:{c}"] - st[f"sum:{c}"] ** 2 / n_valid) / (n_valid - 1)
            std = float(np.sqrt(max(var, 0.0)))
        else:
            std = None
        rows.append({
            "column": c,
            "n": st.get("__rows", 0),
            "n_null": st.get(f"null:{c}", 0),
            "n_distinct": distinct[c],
            "vmin": st.get(f"min:{c}"),
            "vmax": st.get(f"max:{c}"),
            "mean": mean,
            "std": std,
        })
    out = pd.DataFrame(rows)
    for c in ("vmin", "vmax", "mean", "std"):
        out[c] = out[c].astype("float64")
    return out


def categorical_association(ds, col_a: str, col_b: str, *,
                            num_buckets: int = 16,
                            max_cells: int = 1_000_000) -> pd.DataFrame:
    """Pearson χ² test of independence + Cramér's V between two
    categorical columns — the feature-selection screen ("does this
    category carry signal about that one?").

    One bounded exchange: per-(a, b) counts partial-aggregate inside
    ``map_batches`` before the keyed shuffle (the combiner pattern), so
    the exchange and the driver pull are bounded by the CONTINGENCY
    TABLE size, never the row count (loud ``max_cells`` guard).  χ²
    sums (o−e)²/e over the FULL cartesian grid including zero-observed
    cells (the textbook statistic — an observed-cells-only sum
    understates χ² whenever a combination never occurs).  Returns one
    row: (n, dof, chi2, cramers_v)."""
    from .groupagg import grouped_aggregate

    counts = grouped_aggregate(
        ds.select_columns([col_a, col_b]), [col_a, col_b],
        {"o": (col_b, "count")}, num_buckets=num_buckets,
    ).to_pandas()
    if counts.empty:
        # empty input loses its schema through Ray's empty-block elision;
        # return the degenerate-but-typed contract row
        return pd.DataFrame({"n": [np.int64(0)], "dof": [np.int64(0)],
                             "chi2": [np.nan], "cramers_v": [np.nan]})
    if len(counts) > max_cells:
        raise ValueError(
            f"categorical_association: contingency table has {len(counts)} "
            f"cells (> max_cells={max_cells}); χ² over a grid this wide is "
            f"driver-bounded by design — raise max_cells deliberately"
        )
    grid = counts.pivot_table(index=col_a, columns=col_b, values="o",
                              fill_value=0, aggfunc="sum")
    O = grid.to_numpy(dtype=np.float64)
    n = O.sum()
    ra = O.sum(axis=1, keepdims=True)
    cb = O.sum(axis=0, keepdims=True)
    E = ra * cb / n
    chi2 = float(((O - E) ** 2 / E).sum())
    ca, cbn = O.shape
    dof = (ca - 1) * (cbn - 1)
    v = float(np.sqrt(chi2 / (n * min(ca - 1, cbn - 1)))) if dof > 0 else np.nan
    return pd.DataFrame({"n": [np.int64(n)], "dof": [np.int64(dof)],
                         "chi2": [chi2], "cramers_v": [v]})


__all__.append("categorical_association")


def population_stability(ref_ds, cur_ds, col: str, *, bins: int = 10,
                         method: str = "exact",
                         smooth: float = 0.5):
    """Population Stability Index — the standard production
    drift-monitoring statistic between a REFERENCE distribution (e.g.
    training data) and a CURRENT one (live traffic): bin edges are the
    reference's ``bins``-quantiles, both sides histogram against them,
    PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref).  Rule of thumb: < 0.1
    stable, 0.1–0.25 drifting, > 0.25 shifted.

    Scale shape: the edge fit is :func:`~.scale.fit_quantiles`
    (``method="sketch"`` for the corpus-scale ±ε path, "exact" =
    quantile_cont parity for the gate); each side then needs only ONE
    column-pruned streaming pass emitting a (bins+1)-long bincount
    partial per batch (null values drop; values outside the reference
    range clamp into the edge bins via searchsorted).  Counts are
    Laplace-smoothed by ``smooth`` so an empty current bin contributes a
    finite penalty instead of ±inf — mirrored exactly in the SQL
    oracle.  Returns a (bins)-row pandas DataFrame (bin, p_ref, p_cur,
    contrib) — sum ``contrib`` for the scalar PSI."""
    from .scale import fit_quantiles

    qs = tuple(i / bins for i in range(1, bins))
    q = fit_quantiles(ref_ds, col, qs=qs, method=method)
    edges = np.array([q[x] for x in qs], dtype=np.float64)

    def counts(ds) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False).astype(
                np.float64)
            v = v[~np.isnan(v)]
            b = np.searchsorted(edges, v, side="right")
            return pa.table({"c": pa.array(
                np.bincount(b, minlength=bins).astype(np.int64))})

        out = np.zeros(bins, dtype=np.int64)
        parts = ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True)
        for t in parts.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            c = t.column("c").to_numpy(zero_copy_only=False)
            # every partial is exactly bins rows; a batch is whole
            # partials concatenated
            assert len(c) % bins == 0, (len(c), bins)
            out += c.reshape(-1, bins).sum(axis=0)
        return out

    c_ref = counts(ref_ds)
    c_cur = counts(cur_ds)
    p_ref = (c_ref + smooth) / (c_ref.sum() + smooth * bins)
    p_cur = (c_cur + smooth) / (c_cur.sum() + smooth * bins)
    contrib = (p_cur - p_ref) * np.log(p_cur / p_ref)
    return pd.DataFrame({
        "bin": np.arange(bins, dtype=np.int64),
        "p_ref": np.round(p_ref, 6),
        "p_cur": np.round(p_cur, 6),
        "contrib": np.round(contrib, 6),
    })


__all__.append("population_stability")


def categorical_drift(ref_ds, cur_ds, col: str, *, num_buckets: int = 16,
                      max_categories: int = 1_000_000) -> pd.DataFrame:
    """Categorical drift between a REFERENCE and a CURRENT dataset —
    the categorical sibling of :func:`population_stability`: per
    category, both sides' counts and shares plus the per-category χ²
    contribution of the two-sample homogeneity test (expected =
    pooled share × side total); sum ``chi2_contrib`` over BOTH sides'
    rows for the test statistic (dof = categories − 1).

    One bounded keyed exchange per side (map-side count combine — the
    contingency table, never the row count; loud ``max_categories``
    guard); the category-bounded tables merge on the driver.  Returns
    one row per category: (category, n_ref, n_cur, p_ref, p_cur,
    chi2_contrib)."""
    from .groupagg import grouped_aggregate

    def side_counts(ds) -> pd.DataFrame:
        out = grouped_aggregate(
            ds.select_columns([col]), [col], {"n": (col, "count")},
            num_buckets=num_buckets).to_pandas()
        if out.empty:
            out = pd.DataFrame({col: pd.Series(dtype="object"),
                                "n": pd.Series(dtype="int64")})
        if len(out) > max_categories:
            raise ValueError(
                f"categorical_drift: {len(out)} categories exceed "
                f"max_categories={max_categories}; the category table is "
                f"driver state by design — raise the cap deliberately")
        return out

    r = side_counts(ref_ds).rename(columns={"n": "n_ref"})
    c = side_counts(cur_ds).rename(columns={"n": "n_cur"})
    m = r.merge(c, on=col, how="outer")
    m[["n_ref", "n_cur"]] = m[["n_ref", "n_cur"]].fillna(0).astype(np.int64)
    t_ref, t_cur = int(m.n_ref.sum()), int(m.n_cur.sum())
    pooled = (m.n_ref + m.n_cur) / max(t_ref + t_cur, 1)
    e_ref = pooled * t_ref
    e_cur = pooled * t_cur
    with np.errstate(divide="ignore", invalid="ignore"):
        chi = np.where(e_ref > 0, (m.n_ref - e_ref) ** 2 / e_ref, 0.0) \
            + np.where(e_cur > 0, (m.n_cur - e_cur) ** 2 / e_cur, 0.0)
    out = pd.DataFrame({
        col: m[col],
        "n_ref": m.n_ref,
        "n_cur": m.n_cur,
        "p_ref": np.round(m.n_ref / max(t_ref, 1), 6),
        "p_cur": np.round(m.n_cur / max(t_cur, 1), 6),
        "chi2_contrib": np.round(chi, 6),
    })
    return out.sort_values(col, ignore_index=True)


__all__.append("categorical_drift")


def anova_f(ds, group_col: str, value_col: str, *,
            num_buckets: int = 16) -> pd.DataFrame:
    """One-way ANOVA F of a numeric column across the levels of a
    categorical column — the numeric-feature-vs-categorical-target
    selection screen (the sibling of :func:`categorical_association`
    for numeric features).

    One bounded exchange: per-group (n, Σv, Σv²) partial-aggregate
    inside ``map_batches`` before the keyed shuffle; the driver sees one
    row per LEVEL, never row-scale data.  Closed form from the
    sufficient statistics:

        SSB = Σ_g s_g²/n_g − S²/N        (between groups)
        SSW = Σ_g ss_g − Σ_g s_g²/n_g    (within groups)
        F   = (SSB/(k−1)) / (SSW/(N−k)),  eta² = SSB/(SSB+SSW)

    Returns one row (k, n, f_stat, eta_sq); F is null when k < 2 or
    N ≤ k or SSW = 0 (constant-within-groups), matching the SQL-oracle
    formulation over the same statistics."""
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def widen(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column(value_col), pa.float64())
        return pa.table({group_col: t.column(group_col), "__v": v,
                         "__vv": pc.multiply(v, v)})

    g = grouped_aggregate(
        ds.select_columns([group_col, value_col])
          .map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        group_col,
        {"__n": ("__v", "count"), "__s": ("__v", "sum"),
         "__ss": ("__vv", "sum")},
        num_buckets=num_buckets,
    ).to_pandas()
    if g.empty:
        return pd.DataFrame({"k": [np.int64(0)], "n": [np.int64(0)],
                             "f_stat": [np.nan], "eta_sq": [np.nan]})
    # deterministic summation order: driver sums over key-sorted levels,
    # the same order the SQL oracle's per-level sums reduce in
    g = g.sort_values(group_col, ignore_index=True)
    n_g = g["__n"].to_numpy(dtype=np.float64)
    s_g = g["__s"].to_numpy(dtype=np.float64)
    ss_g = g["__ss"].to_numpy(dtype=np.float64)
    k, n = len(g), n_g.sum()
    sg2 = (s_g * s_g / n_g).sum()
    ssb = sg2 - (s_g.sum() ** 2) / n
    ssw = ss_g.sum() - sg2
    if k < 2 or n <= k or ssw <= 0:
        f = np.nan
    else:
        f = (ssb / (k - 1)) / (ssw / (n - k))
    eta = ssb / (ssb + ssw) if (ssb + ssw) > 0 else np.nan
    return pd.DataFrame({"k": [np.int64(k)], "n": [np.int64(n)],
                         "f_stat": [f], "eta_sq": [eta]})


__all__.append("anova_f")


def psi_timeline(ds, ts_col: str, value_col: str, *,
                 bin_width: float = 25.0, n_bins: int = 20,
                 eps: float = 0.5, num_buckets: int = 16) -> pd.DataFrame:
    """Temporal drift monitor: population-stability index of a numeric
    column between each calendar day and the PREVIOUS observed day —
    the ops dashboard behind "did yesterday's ingest shift the
    distribution?" (the timeline extension of
    :func:`population_stability`).

    Fixed equal-width bins (``bin_width`` × ``n_bins``, last bin
    clamps overflow); one bounded (day, bin)-count exchange via
    map-side partials; the driver sees days × n_bins cells.  PSI uses
    add-``eps`` smoothing per cell (denominator + eps·n_bins) so
    empty bins never produce ±inf.  Returns (day, psi) for every day
    with a predecessor, day-ascending."""
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def widen(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t.column(ts_col), unit="day"),
                      pa.date32())
        v = pc.cast(t.column(value_col), pa.float64())
        bin_ = pc.min_element_wise(
            pc.cast(pc.floor(pc.divide(v, bin_width)), pa.int64()),
            pa.scalar(n_bins - 1, pa.int64()))
        bin_ = pc.max_element_wise(bin_, pa.scalar(0, pa.int64()))
        return pa.table({"__day": day, "__bin": bin_})

    cnt = grouped_aggregate(
        ds.select_columns([ts_col, value_col])
          .map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        ["__day", "__bin"], {"__n": ("__bin", "count")},
        num_buckets=num_buckets,
    ).to_pandas()
    if cnt.empty:
        return pd.DataFrame({"day": pd.Series(dtype="object"),
                             "psi": pd.Series(dtype="float64")})
    days = np.sort(cnt["__day"].unique())
    # dense (day, bin) grid so empty bins participate via smoothing
    grid = (cnt.set_index(["__day", "__bin"])["__n"]
            .reindex(pd.MultiIndex.from_product(
                [days, range(n_bins)], names=["__day", "__bin"]),
                fill_value=0)
            .unstack())                       # days × n_bins
    n = grid.to_numpy(dtype=np.float64)
    tot = n.sum(axis=1, keepdims=True)
    p = (n + eps) / (tot + eps * n_bins)
    cur, prv = p[1:], p[:-1]
    psi = ((cur - prv) * np.log(cur / prv)).sum(axis=1)
    return pd.DataFrame({"day": days[1:], "psi": psi})


__all__.append("psi_timeline")


def benford_deviation(ds, value_col: str, group_cols=None, *,
                      scale: float = 1_000_000.0, num_buckets: int = 16):
    """Benford first-significant-digit QA — the forensic drift check
    for value columns that SHOULD follow Benford's law (naturally-grown
    monetary/measurement data spanning orders of magnitude): per group,
    the chi-square statistic of the observed leading-digit distribution
    against expected p_d = log10(1 + 1/d), d ∈ 1..9.  A fabricated,
    truncated, or unit-swapped feed shows up as a chi2 spike long
    before summary moments move.

    Determinism contract (SQL-mirrorable bit-for-bit): the leading
    digit comes from the INTEGER floor(|v|·scale) via its decimal
    string — never from floor(log10(v)), whose IEEE result at exact
    powers of ten is libm-dependent.  Rows with floor(|v|·scale) = 0
    (zeros / sub-resolution values) are excluded, like the oracle's
    WHERE.

    Scale shape: one partial-aggregated exchange of (group, digit)
    count rows — 9 rows per group per batch, combiner pattern — then
    the chi-square over the bounded (groups × 9) table.  Returns a
    pyarrow Table ``(group_cols…, n, benford_chi2)``.
    """
    from .groupagg import grouped_aggregate

    group_cols = ([group_cols] if isinstance(group_cols, str)
                  else list(group_cols or []))

    def digits(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False)
        iv = np.floor(np.abs(v.astype(np.float64)) * scale)
        ok = iv > 0
        iv = iv[ok].astype(np.int64)
        # leading decimal digit via the exact integer string — identical
        # to SUBSTRING(CAST(iv AS VARCHAR), 1, 1) in the oracle
        d = np.char.ljust(iv.astype("U19"), 1).astype(np.int64)
        cols = {c: b.column(c).filter(pa.array(ok)) for c in group_cols}
        cols["__digit"] = pa.array(d)
        return pa.table(cols)

    counts = grouped_aggregate(
        ds.map_batches(digits, batch_format="pyarrow", zero_copy_batch=True),
        group_cols + ["__digit"], {"__cnt": ("__digit", "count")},
        num_buckets=num_buckets,
    )
    t = pa.concat_tables(
        list(counts.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    df = t.to_pandas()
    if group_cols:
        gkey = list(group_cols)
    else:
        df["__g"] = 0
        gkey = ["__g"]
    exp_p = np.log10(1.0 + 1.0 / np.arange(1, 10))

    out_rows = {c: [] for c in gkey}
    ns, chis = [], []
    for key, g in df.groupby(gkey, sort=True):
        key = key if isinstance(key, tuple) else (key,)
        cnt = np.zeros(9)
        cnt[g["__digit"].to_numpy() - 1] = g["__cnt"].to_numpy()
        n = cnt.sum()
        exp = n * exp_p
        chi2 = (((cnt - exp) * (cnt - exp)) / exp).sum()
        for c, v in zip(gkey, key):
            out_rows[c].append(v)
        ns.append(int(n))
        chis.append(chi2)
    cols = {}
    for c in group_cols:
        cols[c] = pa.array(out_rows[c])
    cols["n"] = pa.array(ns, type=pa.int64())
    cols["benford_chi2"] = pa.array(chis, type=pa.float64())
    return pa.table(cols)


__all__.append("benford_deviation")


def mutual_information(ds, x_col: str, y_col: str, *,
                       num_buckets: int = 8) -> pd.DataFrame:
    """Mutual information between two categorical columns — the
    model-free dependence screen that catches what chi-square's linear
    statistic dilutes (χ² and Cramér's V live in
    :func:`categorical_association`; WoE/IV in encode.py — MI completes
    the screen family with the information-theoretic view).

        MI  = Σ_xy p(x,y) · ln( p(x,y) / (p(x)·p(y)) )
        NMI = MI / √(H(x)·H(y))          (0 when either entropy is 0)

    Scale shape: ONE partial-aggregated (x, y) count exchange — the
    combiner ships at most |X|·|Y| rows per block — then the closed
    form over the bounded contingency table on the driver.  Null
    categories count as their own level only if present in BOTH the
    engine input and the oracle's GROUP BY (DuckDB groups NULLs
    together, matching pandas dropna=False); rows with a null in
    either column are EXCLUDED here to keep the SQL mirror simple.

    Returns one row: ``(n, mi, h_x, h_y, nmi)`` in nats.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t.column(x_col)),
                       pc.is_valid(t.column(y_col)))
        t = t.filter(keep)
        return pa.table({x_col: t.column(x_col), y_col: t.column(y_col)})

    c = grouped_aggregate(
        ds.select_columns([x_col, y_col])
          .map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        [x_col, y_col], {"__n": (x_col, "count")},
        num_buckets=num_buckets,
    ).to_pandas()
    if c.empty:
        return pd.DataFrame({"n": [np.int64(0)], "mi": [np.nan],
                             "h_x": [np.nan], "h_y": [np.nan],
                             "nmi": [np.nan]})
    # deterministic driver-side order (the SQL oracle rounds anyway)
    c = c.sort_values([x_col, y_col], ignore_index=True)
    nxy = c["__n"].to_numpy(dtype=np.float64)
    n = nxy.sum()
    nx = c.groupby(x_col, sort=False)["__n"].transform("sum") \
          .to_numpy(dtype=np.float64)
    ny = c.groupby(y_col, sort=False)["__n"].transform("sum") \
          .to_numpy(dtype=np.float64)
    pxy = nxy / n
    mi = float((pxy * np.log(nxy * n / (nx * ny))).sum())
    px = c.groupby(x_col, sort=True)["__n"].sum() \
          .to_numpy(dtype=np.float64) / n
    py = c.groupby(y_col, sort=True)["__n"].sum() \
          .to_numpy(dtype=np.float64) / n
    hx = float(-(px * np.log(px)).sum())
    hy = float(-(py * np.log(py)).sum())
    nmi = mi / np.sqrt(hx * hy) if hx > 0 and hy > 0 else np.nan
    return pd.DataFrame({"n": [np.int64(n)], "mi": [mi], "h_x": [hx],
                         "h_y": [hy], "nmi": [nmi]})


__all__.append("mutual_information")
