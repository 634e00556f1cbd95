"""Column-wise feature scaling / encoding stages (classic tabular
feature engineering over plain numeric columns, reusing the same
distributed sufficient-statistics machinery the PCA path runs on).

Everything here is two-phase: a FIT that streams one ``map_batches``
pass over the input and tree-merges tiny partials (Moments for
mean/cov/corr, per-column min/max for range scaling — both mergeable,
so no shuffle and nothing larger than O(p²) ever leaves a task), and a
TRANSFORM that is a stateless vectorized ``map_batches`` over the full
table with the O(p) fitted model captured in the task closure (a few
floats — no actor pool, no ray.put needed).

Scale notes (100 TB): fit partials are (p+p²) floats per input block
regardless of row count; transforms are embarrassingly parallel row
maps with zero exchange.  The only driver-side work is merging
≤ num_blocks/fan_in partial rows (O(p²) each) and, for one-hot, holding
the category vocabulary (bounded by definition of "categorical").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state.moments import Moments

__all__ = [
    "fit_numeric_moments",
    "fit_min_max",
    "fit_quantiles",
    "corr_table",
    "standard_scale",
    "min_max_scale",
    "robust_scale",
    "equal_width_bin",
    "one_hot_encode",
    "assemble_vector",
    "quantile_bin",
    "winsorize",
]


def _cols_matrix(batch: pa.Table, cols) -> np.ndarray:
    """Stack plain numeric columns into an (n, p) float64 matrix."""
    return np.column_stack(
        [
            batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols
        ]
    )


def fit_numeric_moments(ds, cols, *, fan_in: int = 64, batch_size=None) -> Moments:
    """One streaming pass over plain numeric ``cols`` → global
    :class:`Moments` (mean + centered scatter), the same partial/merge
    shape as :func:`~..state.moments.fit_moments` over a vector column.
    """
    cols = list(cols)

    def partial(batch: pa.Table) -> pa.Table:
        return Moments.of(_cols_matrix(batch, cols)).to_row()

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    merged = partials.map_batches(
        lambda b: Moments.from_rows(b).to_row(),
        batch_format="pyarrow",
        batch_size=fan_in,
    )
    final = pa.concat_tables(
        list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    return Moments.from_rows(final)


def fit_min_max(ds, cols, *, fan_in: int = 64, batch_size=None) -> dict:
    """Global per-column (min, max) in one streaming pass (mergeable
    partials, no shuffle).  Returns {col: (min, max)} floats."""
    cols = list(cols)
    empty = pa.table(
        {
            "mn": pa.array([], type=pa.list_(pa.float64())),
            "mx": pa.array([], type=pa.list_(pa.float64())),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        X = _cols_matrix(batch, cols)
        if X.shape[0] == 0:
            return empty
        return pa.table(
            {
                "mn": pa.array([X.min(axis=0).tolist()], type=pa.list_(pa.float64())),
                "mx": pa.array([X.max(axis=0).tolist()], type=pa.list_(pa.float64())),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty
        mn = np.asarray(batch.column("mn").to_pylist(), dtype=np.float64)
        mx = np.asarray(batch.column("mx").to_pylist(), dtype=np.float64)
        return pa.table(
            {
                "mn": pa.array([mn.min(axis=0).tolist()], type=pa.list_(pa.float64())),
                "mx": pa.array([mx.max(axis=0).tolist()], type=pa.list_(pa.float64())),
            }
        )

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    merged = partials.map_batches(merge, batch_format="pyarrow", batch_size=fan_in)
    final = pa.concat_tables(
        list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    if final.num_rows == 0:
        raise ValueError("fit_min_max over an empty dataset")
    mn = np.asarray(final.column("mn").to_pylist(), dtype=np.float64).min(axis=0)
    mx = np.asarray(final.column("mx").to_pylist(), dtype=np.float64).max(axis=0)
    return {c: (float(mn[i]), float(mx[i])) for i, c in enumerate(cols)}


def corr_table(moments: Moments, cols, *, ndigits: int | None = None) -> pa.Table:
    """Upper-triangle (i < j) Pearson correlations from the merged
    scatter: corr_ij = m2_ij / √(m2_ii · m2_jj) — the n−ddof divisor
    cancels, so this is the exact sample correlation."""
    cols = list(cols)
    m2 = moments.scatter()
    d = np.sqrt(np.diag(m2))
    a_names, b_names, vals = [], [], []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            a_names.append(cols[i])
            b_names.append(cols[j])
            v = m2[i, j] / (d[i] * d[j])
            vals.append(round(v, ndigits) if ndigits is not None else v)
    return pa.table(
        {
            "col_a": pa.array(a_names, type=pa.string()),
            "col_b": pa.array(b_names, type=pa.string()),
            "corr": pa.array(vals, type=pa.float64()),
        }
    )


def standard_scale(ds, cols, moments: Moments, *, suffix: str = "_z", ddof: int = 1):
    """Append ``col<suffix>`` = (x − μ) / σ per column (σ from the
    n−ddof sample covariance diagonal).  The O(p)-float model rides the
    task closure; stateless tasks, zero exchange."""
    cols = list(cols)
    mean = moments.mean.copy()
    sd = np.sqrt(np.diag(moments.cov(ddof))).copy()

    def fn(batch: pa.Table) -> pa.Table:
        for i, c in enumerate(cols):
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.append_column(
                c + suffix, pa.array((x - mean[i]) / sd[i], type=pa.float64())
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def min_max_scale(ds, cols, bounds: dict, *, suffix: str = "_mm"):
    """Append ``col<suffix>`` = (x − min) / (max − min) per column.
    Bit-deterministic: the same IEEE ops in the same association an SQL
    oracle's ``(x − mn) / (mx − mn)`` evaluates, with exact min/max."""
    cols = list(cols)
    lohi = [bounds[c] for c in cols]

    def fn(batch: pa.Table) -> pa.Table:
        for i, c in enumerate(cols):
            lo, hi = lohi[i]
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.append_column(
                c + suffix, pa.array((x - lo) / (hi - lo), type=pa.float64())
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def equal_width_bin(ds, col: str, *, num_bins: int, lo: float, hi: float,
                    out_col: str | None = None):
    """Append int64 ``out_col`` = clip(⌊(x − lo) · num_bins / (hi − lo)⌋,
    0, num_bins − 1) — equal-width discretization with x == hi folded
    into the top bin, matching the SQL mirror
    ``LEAST(GREATEST(CAST(FLOOR(...) AS BIGINT), 0), num_bins − 1)``."""
    out_col = out_col or f"{col}_bin"
    nb = int(num_bins)

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((x - lo) * nb / (hi - lo))
        b = np.clip(b, 0, nb - 1).astype(np.int64)
        return batch.append_column(out_col, pa.array(b, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _sanitize(cat) -> str:
    s = str(cat)
    return "".join(ch if (ch.isalnum() or ch == "_") else "_" for ch in s)


def one_hot_encode(ds, col: str, *, categories=None, prefix: str | None = None,
                   drop_input: bool = False):
    """Append one int64 indicator column per category.

    ``categories=None`` runs a distributed distinct pass (``ds.unique``
    — tiny output by definition of "categorical") and sorts the
    vocabulary for a stable column order; pass an explicit list to pin
    the schema across datasets (the train/serve contract).  Unknown
    categories encode as all-zeros rather than erroring — the standard
    handle-unknown='ignore' behavior.
    """
    prefix = prefix if prefix is not None else col
    if categories is None:
        categories = sorted(ds.unique(col))
    categories = list(categories)
    names = [f"{prefix}_{_sanitize(c)}" for c in categories]

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        for cat, name in zip(categories, names):
            flag = pc.cast(
                pc.fill_null(pc.equal(arr, pa.scalar(cat)), False), pa.int64()
            )
            batch = batch.append_column(name, flag)
        if drop_input:
            batch = batch.drop_columns([col])
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fit_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75), *,
                  method: str = "exact", sketch_size: int = 4096) -> dict:
    """Global quantiles of one numeric column → {q: value}.

    ``method='exact'``: funnels the (single, column-pruned) column into
    ONE group — exact linear-interpolation quantiles (quantile_cont
    convention, matching the SQL oracle) but bounded by one task's
    memory; the model-fit / gate-scale path, same contract as
    :func:`..stages.groupagg.grouped_quantile` and flagged the same way.
    ``method='sketch'``: the mergeable KMV bottom-k sketch (±ε rank
    error, exchange bounded at sketch_size rows/batch) — the 100-TB
    path.
    """
    from .groupagg import grouped_quantile, grouped_quantile_sketch

    keyed = ds.select_columns([col]).map_batches(
        lambda b: b.append_column(
            "__k", pa.array(np.zeros(b.num_rows, dtype=np.int8))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if method == "exact":
        out = grouped_quantile(keyed, "__k", col, qs, num_buckets=1)
    elif method == "sketch":
        out = grouped_quantile_sketch(keyed, "__k", col, qs, num_buckets=1,
                                      sketch_size=sketch_size)
    else:
        raise ValueError("method must be 'exact' or 'sketch'")
    rows = out.take_all()
    assert len(rows) == 1
    return {q: float(rows[0][f"q{int(q * 100)}"]) for q in qs}


def robust_scale(ds, cols, quants: dict, *, suffix: str = "_rs"):
    """Append ``col<suffix>`` = (x − median) / (q75 − q25) per column —
    outlier-resistant scaling.  ``quants``: {col: {0.25: v, 0.5: v,
    0.75: v}} from :func:`fit_quantiles` (any method)."""
    cols = list(cols)
    params = []
    for c in cols:
        qd = quants[c]
        params.append((float(qd[0.5]), float(qd[0.75]) - float(qd[0.25])))

    def fn(batch: pa.Table) -> pa.Table:
        for i, c in enumerate(cols):
            med, iqr = params[i]
            x = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            batch = batch.append_column(
                c + suffix, pa.array((x - med) / iqr, type=pa.float64())
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def assemble_vector(ds, cols, *, out_col: str = "features",
                    drop_inputs: bool = False, value_type=None,
                    fill_null: float | None = None):
    """Gather scalar feature columns into ONE fixed_size_list vector
    column (the assembler step feeding PCA / whitening / kNN): per
    batch a zero-exchange numpy column stack.  ``fill_null`` imputes
    nulls (required if any source column is nullable — vectors must be
    dense); without it a null raises loudly."""
    import numpy as np

    from ..functions.veccol import numpy_to_fixed_list_column

    cols = [cols] if isinstance(cols, str) else list(cols)
    vt = value_type if value_type is not None else pa.float64()

    def fn(t: pa.Table) -> pa.Table:
        mats = []
        for c in cols:
            col = t.column(c)
            if col.null_count:
                if fill_null is None:
                    raise ValueError(
                        f"assemble_vector: column {c!r} has nulls; pass "
                        "fill_null= to impute (vectors must be dense)")
                col = pc.fill_null(col, fill_null)
            mats.append(pc.cast(col, vt).to_numpy(zero_copy_only=False))
        mat = np.column_stack(mats) if mats else np.empty((t.num_rows, 0))
        t = t.append_column(out_col, numpy_to_fixed_list_column(mat, vt))
        if drop_inputs:
            t = t.drop_columns(cols)
        return t

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quantile_bin(ds, col: str, *, quants: dict, out_col: str | None = None):
    """Equal-FREQUENCY discretization from fitted quantile boundaries:
    bucket = number of boundaries strictly below x (so the b+1 buckets
    split at the fitted quantiles; ties at a boundary fall LEFT, the
    `x > boundary` convention the SQL mirror states).  Stateless
    vectorized transform; fit via :func:`fit_quantiles` (exact or KMV
    sketch at corpus scale)."""
    out_col = out_col if out_col is not None else f"{col}_qbin"
    bounds = np.asarray([quants[q] for q in sorted(quants)], dtype=np.float64)

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = (x[:, None] > bounds[None, :]).sum(axis=1).astype(np.int64)
        return batch.append_column(out_col, pa.array(b))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def winsorize(ds, col: str, *, lo: float, hi: float,
              out_col: str | None = None):
    """Clip ``col`` to fitted [lo, hi] bounds (tail winsorization — the
    outlier guard before z-scaling).  Exact IEEE min/max, no grid."""
    import pyarrow.compute as pc

    out_col = out_col if out_col is not None else f"{col}_w"

    def fn(batch: pa.Table) -> pa.Table:
        x = pc.max_element_wise(
            pc.min_element_wise(pc.cast(batch.column(col), pa.float64()),
                                pa.scalar(float(hi))),
            pa.scalar(float(lo)))
        return batch.append_column(out_col, x)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def grouped_mad(ds, key_cols, value_col: str, *, num_buckets: int = 16,
                max_keys: int = 1_000_000):
    """Per-key MEDIAN and MAD (median absolute deviation, unscaled —
    the DuckDB/classic convention) — the robust spread statistic outlier
    thresholds use when variance is poisoned by the outliers themselves.

    MAD is a nested median, so it needs two exact quantile exchanges:
    (1) per-key median; (2) medians broadcast via ``ray.put`` (bounded
    by the key count, loud ``max_keys`` guard) → stateless |x − median|
    map → per-key median of deviations.  Both exchanges move (key,
    value) pairs like :func:`grouped_quantile` — at corpus scale swap
    in the KMV sketch path for ±ε like the quantile docstring says.
    Returns (keys…, median, mad)."""
    import ray

    from .groupagg import grouped_quantile

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    med = grouped_quantile(ds, key_cols, value_col, qs=(0.5,),
                           num_buckets=num_buckets, prefix="__med").to_pandas()
    if med.empty:
        # Ray elides fully-empty blocks (schema lost at to_pandas) —
        # pin the contract columns at this driver-side boundary
        return pd.DataFrame({**{k: pd.Series(dtype="object")
                                for k in key_cols},
                             "median": pd.Series(dtype="float64"),
                             "mad": pd.Series(dtype="float64")})
    if len(med) > max_keys:
        raise ValueError(
            f"grouped_mad: {len(med)} keys exceed max_keys={max_keys}; the "
            f"median table is broadcast state by design — raise max_keys "
            f"deliberately")
    med = med.rename(columns={"__med50": "median"})
    med_ref = ray.put(med.set_index(key_cols)["median"])

    def absdev(batch: pa.Table) -> pa.Table:
        df = batch.select(key_cols + [value_col]).to_pandas()
        m = ray.get(med_ref)
        idx = (pd.MultiIndex.from_frame(df[key_cols]) if len(key_cols) > 1
               else pd.Index(df[key_cols[0]]))
        dev = (df[value_col].to_numpy(dtype=np.float64)
               - m.reindex(idx).to_numpy(dtype=np.float64))
        df["__absdev"] = np.abs(dev)
        return pa.Table.from_pandas(df[key_cols + ["__absdev"]],
                                    preserve_index=False)

    devs = ds.map_batches(absdev, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
    mad = grouped_quantile(devs, key_cols, "__absdev", qs=(0.5,),
                           num_buckets=num_buckets, prefix="__mad"
                           ).to_pandas().rename(columns={"__mad50": "mad"})
    out = med.merge(mad, on=key_cols, how="left")
    return out


__all__.append("grouped_mad")


def grouped_quantile_bucket(ds, key_cols, value_col: str, *,
                            qs=(1.0 / 3.0, 2.0 / 3.0), labels=None,
                            out_col: str = "qbucket",
                            method: str = "sketch",
                            sketch_size: int = 4096,
                            num_buckets: int = 16,
                            max_keys: int = 1_000_000):
    """Per-key quantile-bucket assignment WITHOUT co-locating a key's
    rows — the corpus-scale path behind ntile-style stratification
    (e.g. CCNet head/middle/tail per language): ntile needs a per-key
    total order, so one task owns the WHOLE key (fatal when a key is
    30% of a 100 TB corpus); thresholds need only a per-key quantile
    fit.

    Fit: per-key quantiles at ``qs`` via the mergeable bottom-k sketch
    (``method="sketch"``, rank error O(1/√sketch_size)) or the exact
    exchange (``method="exact"``, gate-grade, still co-locates values —
    use at test scale).  The (key → thresholds) table is bounded by the
    key count (loud ``max_keys`` guard) and broadcast via ``ray.put``;
    assignment is one stateless vectorized pass: bucket(v) = #{j :
    v ≥ threshold_j} (ties go UP), so bucket len(qs) is the top
    stratum.  ``labels`` (len(qs)+1 strings) emits labels instead of
    int64 indices; NaN values and unseen keys emit null."""
    import ray

    from .groupagg import grouped_quantile, grouped_quantile_sketch

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    qs = sorted(float(q) for q in qs)
    if labels is not None and len(labels) != len(qs) + 1:
        raise ValueError(
            f"labels must have len(qs)+1={len(qs) + 1} entries, "
            f"got {len(labels)}")
    fit = grouped_quantile if method == "exact" else grouped_quantile_sketch
    if method not in ("exact", "sketch"):
        raise ValueError(f"method must be 'exact' or 'sketch', got {method!r}")
    kw = {} if method == "exact" else {"sketch_size": sketch_size}
    th = fit(ds, key_cols, value_col, qs=tuple(qs),
             num_buckets=num_buckets, prefix="__th", **kw).to_pandas()
    th_cols = [f"__th{int(q * 100)}" for q in qs]
    if len(th) > max_keys:
        raise ValueError(
            f"grouped_quantile_bucket: {len(th)} keys exceed "
            f"max_keys={max_keys}; the threshold table is broadcast "
            f"state by design — raise max_keys deliberately")
    if not th.empty:
        thm = th.set_index(key_cols[0] if len(key_cols) == 1 else key_cols)
        thm = thm[th_cols].astype(np.float64)
    else:
        thm = pd.DataFrame(columns=th_cols, dtype=np.float64)
    th_ref = ray.put(thm)

    def assign(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            typ = pa.string() if labels is not None else pa.int64()
            return batch.append_column(out_col, pa.array([], type=typ))
        df = batch.select(key_cols + [value_col]).to_pandas()
        t = ray.get(th_ref)
        idx = (pd.MultiIndex.from_frame(df[key_cols]) if len(key_cols) > 1
               else pd.Index(df[key_cols[0]]))
        T = t.reindex(idx).to_numpy(dtype=np.float64)  # (n, len(qs))
        v = df[value_col].to_numpy(dtype=np.float64)
        ok = ~(np.isnan(v) | np.isnan(T).any(axis=1))
        b = (v[:, None] >= T).sum(axis=1)
        if labels is not None:
            lab = np.asarray(list(labels), dtype=object)
            out = np.where(ok, lab[np.minimum(b, len(qs))], None)
            col = pa.array(out, type=pa.string())
        else:
            col = pa.array(np.where(ok, b, 0).astype(np.int64),
                           mask=~ok)
        return batch.append_column(out_col, col)

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


__all__.append("grouped_quantile_bucket")


def grouped_robust_scale(ds, key_cols, value_col: str, *,
                         out_col: str | None = None,
                         num_buckets: int = 16,
                         max_keys: int = 1_000_000):
    """Per-key ROBUST z-score: (x − median_key) / mad_key — the
    outlier-resistant standardization (mean/std are poisoned by the
    outliers themselves; median/MAD are 50%-breakdown).  Zero-MAD keys
    (constant or half-constant values) emit null rather than ±inf.

    Fit = :func:`grouped_mad` (two exact quantile exchanges; swap the
    sketch in at corpus scale per its docstring); the fitted (median,
    mad) table is key-bounded (loud ``max_keys``), broadcasts via
    ``ray.put``, and the transform is one stateless vectorized pass."""
    import pyarrow as pa
    import ray

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    out_col = out_col or f"{value_col}_rz"
    stats = grouped_mad(ds, key_cols, value_col, num_buckets=num_buckets,
                        max_keys=max_keys)
    ref = ray.put(stats.set_index(
        key_cols[0] if len(key_cols) == 1 else key_cols))

    def transform(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        df = batch.select(key_cols).to_pandas()
        idx = (pd.MultiIndex.from_frame(df[key_cols]) if len(key_cols) > 1
               else pd.Index(df[key_cols[0]]))
        med = st["median"].reindex(idx).to_numpy(dtype=np.float64)
        mad = st["mad"].reindex(idx).to_numpy(dtype=np.float64)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (v - med) / mad
        ok = np.isfinite(z)
        return batch.append_column(
            out_col, pa.array(np.where(ok, z, 0.0), mask=~ok))

    return ds.map_batches(transform, batch_format="pyarrow",
                          zero_copy_batch=True)


__all__.append("grouped_robust_scale")


def yeo_johnson_apply(x: np.ndarray, lam: float) -> np.ndarray:
    """Vectorized Yeo–Johnson ψ(x, λ) (Yeo & Johnson 2000) — the power
    transform defined on ALL of ℝ (Box–Cox needs x > 0):

        x ≥ 0:  ((1+x)^λ − 1)/λ        (λ ≠ 0),  ln(1+x)   (λ = 0)
        x < 0:  −((1−x)^{2−λ} − 1)/(2−λ) (λ ≠ 2), −ln(1−x)  (λ = 2)

    ``np.log(1.0 + x)`` (not log1p) on purpose: the SQL oracle mirror is
    ``ln(1.0 + x)`` and the two must be the SAME IEEE op sequence."""
    x = np.asarray(x, dtype=np.float64)
    pos = x >= 0
    out = np.empty(x.shape, dtype=np.float64)
    if lam == 0.0:
        out[pos] = np.log(1.0 + x[pos])
    else:
        out[pos] = (np.power(1.0 + x[pos], lam) - 1.0) / lam
    if lam == 2.0:
        out[~pos] = -np.log(1.0 - x[~pos])
    else:
        out[~pos] = -(np.power(1.0 - x[~pos], 2.0 - lam) - 1.0) / (2.0 - lam)
    return out


def fit_yeo_johnson(ds, col: str, *, lambdas=None, fan_in: int = 64,
                    batch_size=None) -> dict:
    """Fit the Yeo–Johnson λ by profile log-likelihood over a grid —
    the leakage-free Gaussianizing power transform (the parametric
    sibling of :func:`~.sort.with_rank_gauss`; unlike RankGauss it is
    smooth, invertible in closed form, and applies to unseen data).

        LL(λ) = −n/2 · ln(σ̂²_MLE(ψ(x,λ))) + (λ−1) · Σ sgn(x)·ln(1+|x|)

    One streaming pass, NO shuffle: each batch emits one (λ, n, Σψ,
    Σψ², Σjac) row per grid point (grid-bounded partial ~ KB), a
    ``fan_in``-ary map_batches layer tree-merges them, and the driver
    reduces the grid-sized remainder — the same mergeable-partial shape
    as :func:`fit_numeric_moments`.  Ties on LL break to the SMALLEST
    λ (mirror an SQL oracle with ``ORDER BY ll DESC, lam``).

    Returns ``{"lam": best λ, "ll": {λ: LL}, "n": N}``.
    """
    if lambdas is None:
        lambdas = np.linspace(-2.0, 2.0, 17)
    lams = np.asarray(sorted({float(l) for l in lambdas}), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        jac = float(np.where(x >= 0, np.log(1.0 + x),
                             -np.log(1.0 - x)).sum()) if len(x) else 0.0
        n, s, ss = [], [], []
        for lam in lams:
            y = yeo_johnson_apply(x, lam)
            n.append(len(x))
            s.append(float(y.sum()))
            ss.append(float((y * y).sum()))
        return pa.table({"lam": pa.array(lams),
                         "n": pa.array(n, type=pa.int64()),
                         "s": pa.array(s), "ss": pa.array(ss),
                         "jac": pa.array([jac] * len(lams))})

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("lam", sort=True, as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)
    merged = partials.map_batches(merge, batch_format="pyarrow",
                                  batch_size=fan_in * len(lams))
    final = pa.concat_tables(
        list(merged.iter_batches(batch_size=None, batch_format="pyarrow")))
    df = final.to_pandas().groupby("lam", sort=True, as_index=False).sum()
    if not len(df) or int(df["n"].iloc[0]) == 0:
        raise ValueError("fit_yeo_johnson over an empty column")
    n = df["n"].to_numpy(dtype=np.float64)
    mean = df["s"].to_numpy() / n
    var = df["ss"].to_numpy() / n - mean * mean
    if (var <= 0).any():
        raise ValueError("fit_yeo_johnson: zero-variance transform "
                         "(constant column?)")
    lam_arr = df["lam"].to_numpy()
    ll = -0.5 * n * np.log(var) + (lam_arr - 1.0) * df["jac"].to_numpy()
    best = int(np.lexsort((lam_arr, -ll))[0])   # max LL, tie → smallest λ
    return {"lam": float(lam_arr[best]),
            "ll": dict(zip(lam_arr.tolist(), ll.tolist())),
            "n": int(df["n"].iloc[0])}


def power_transform(ds, col: str, lam: float, *, out_col: str | None = None):
    """Apply ψ(·, λ) per row (stateless vectorized map_batches; pair
    with :func:`fit_yeo_johnson` for the fitted λ)."""
    out_col = out_col or f"{col}_yj"

    def fn(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False)
        return batch.append_column(out_col,
                                   pa.array(yeo_johnson_apply(x, lam)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


__all__ += ["yeo_johnson_apply", "fit_yeo_johnson", "power_transform"]
