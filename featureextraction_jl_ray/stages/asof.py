"""Sorted-merge as-of join — THE core engine operator (SURVEY.md §2-B
J1/J2; BASELINE.json:6 "a sorted-merge as-of join assigns each image its
latest-available caption/phash state").

Semantics (backward as-of): for each left row (entity e, time t), attach
the columns of the right row with the same e and the greatest right-ts
≤ t (strictly earlier-or-equal ⇒ zero temporal leakage); optionally
require t − ts_r ≤ tolerance (J2).  ``direction="forward"`` /
``allow_exact_matches`` mirror pandas/DuckDB variants.

Scale shape
-----------
Both sides are bucketed by the SAME stable hash of the entity key and
exchanged in ONE shuffle: each batch's per-bucket slices are packed into
compressed Arrow-IPC blobs (``stages/blobshuffle.py`` — side-specific
schemas, no null padding, ~half the wire bytes) and
``groupby(bucket).map_groups`` co-locates each bucket's left+right blobs.
Inside a bucket the merge is ``pd.merge_asof`` (C-implemented galloping
merge over ts-sorted frames, ``by=entity``).  No global sort, no
broadcast of the big side; buckets scale with the cluster, and an entity
never spans buckets.  Hot entities can be mitigated upstream by salting
only the LEFT side per (entity, salt) — the right side is replicated per
salt — via ``left_salt``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from .blobshuffle import _BLOB, _SIDE, pack_by_bucket, unpack_blobs
from .partition import _BUCKET

__all__ = ["asof_join", "resample_entity_grid"]


def asof_join(
    left,
    right,
    *,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | pd.Timedelta | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_r",
    num_buckets: int = 64,
    left_tiebreak: tuple[str, ...] = (),
    window_fn=None,
    left_types: dict | None = None,
    right_types_in: dict | None = None,
    left_salt: int | None = None,
    bucket_sink=None,
):
    """As-of join ``left`` with ``right`` on time column ``on`` per entity
    column ``by``; returns left rows + matched right columns (left join —
    unmatched rows keep nulls).

    ``right`` must be unique per (by, on) for deterministic results (the
    engine does not pick among simultaneous right rows; pre-reduce them).

    ``window_fn`` (DataFrame→DataFrame over a (by, on, tiebreak)-sorted
    frame, e.g. from ``make_windows_frame_fn``) runs INSIDE the same
    bucketed exchange right after the merge — the flagship's windowed
    features therefore cost zero extra shuffles.

    ``bucket_sink`` (``(bucket_id, table) → table``, e.g.
    ``sources.io.make_bucket_writer``) runs on each bucket's FINAL output
    (post-merge, post-``window_fn``) inside the same exchange, and its
    return value (e.g. a manifest row) is emitted instead of the data —
    a co-partitioned write therefore costs ZERO extra shuffles.  The
    bucket id handed to the sink is the same
    ``bucket_of(entity, num_buckets, seed=0)`` the standalone
    ``checkpointed_write`` computes, so resume manifests interoperate.
    Incompatible with ``left_salt`` (salted buckets are not entity
    partitions).

    ``left_salt=s`` spreads a HOT entity: left rows bucket by
    (entity, hash(ts) % s) and the right side is replicated once per
    salt, so no bucket holds more than ~1/s of a hot entity's left rows
    while every bucket still sees the entity's full right history — the
    per-left-row asof match is unchanged (it depends only on that row
    and the right side).  Exchange cost rises by (s−1)·|right|; use only
    when the left side is the skewed one.  Incompatible with
    ``window_fn`` (window features need an entity's FULL left history in
    one place) — that combination raises.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if left_salt is not None and left_salt > 1 and window_fn is not None:
        raise ValueError(
            "left_salt splits an entity's left rows across buckets; "
            "window_fn needs the full per-entity history — drop one"
        )
    if left_salt is not None and left_salt > 1 and bucket_sink is not None:
        raise ValueError(
            "bucket_sink writes one partition per entity bucket; salted "
            "buckets are not entity partitions — drop one"
        )
    n_salts = int(left_salt) if left_salt else 1
    tol = pd.Timedelta(tolerance) if tolerance is not None else None
    # composite entity keys: ``by`` may be one column or a list — the
    # bucket hash covers the tuple and merge_asof takes by=list
    by_cols = [by] if isinstance(by, str) else list(by)

    # Schema discovery: ds.schema() on a lazy chain partially EXECUTES the
    # upstream pipeline (actor pools and all) just to learn column types —
    # callers that know their schemas pass left_types / right_types_in
    # ({name: arrow type}, in column order) and skip that cost entirely.
    if left_types is None:
        s = left.schema()
        left_types = dict(zip(s.names, s.types))
    if right_types_in is None:
        s = right.schema()
        right_types_in = dict(zip(s.names, s.types))
    left_names = list(left_types)
    if right_cols is None:
        right_cols = [c for c in right_types_in if c != on and c not in by_cols]
    rename = {c: (c + suffix if c in left_names else c) for c in right_cols}

    # ---- blob-packed exchange (stages/blobshuffle.py) ------------------------
    # Each side keeps its OWN schema inside compressed IPC blobs; the
    # shuffle moves (bucket, side, blob) rows only — no null-padded union,
    # ~half the bytes and 2-3 orders of magnitude fewer sort rows.
    right_proj = right.select_columns([*by_cols, on, *right_cols])

    right_types = {rename[c]: right_types_in[c] for c in right_cols}
    left_pa_schema = pa.schema(
        [pa.field(n, t) for n, t in left_types.items()]
    )
    right_out_schema = pa.schema(
        [*(pa.field(c, left_types.get(c, right_types_in[c])) for c in by_cols),
         pa.field(on, left_types.get(on, right_types_in[on])),
         *(pa.field(n, t) for n, t in right_types.items())]
    )

    from ..functions.hashing import bucket_of_multi

    def _bucket_plain(batch: pa.Table) -> np.ndarray:
        cols = [batch.column(c).to_numpy(zero_copy_only=False) for c in by_cols]
        # single-key path stays on bucket_of so ids line up with
        # checkpointed_write / read_entity_partitions (same hash, seed 0)
        if len(cols) == 1:
            return bucket_of(cols[0], num_buckets)
        return bucket_of_multi(cols, num_buckets, seed=0)

    def _bucket_salted(batch: pa.Table, salt: np.ndarray) -> np.ndarray:
        cols = [batch.column(c).to_numpy(zero_copy_only=False) for c in by_cols]
        return bucket_of_multi([*cols, salt], num_buckets, seed=0)

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.select(left_names)
        if n_salts > 1:
            from ..functions.hashing import stable_hash_array

            ts = batch.column(on).to_numpy(zero_copy_only=False)
            salt = (stable_hash_array(ts.view(np.int64), seed=67)
                    % np.uint64(n_salts)).astype(np.int64)
            b = _bucket_salted(batch, salt)
        else:
            b = _bucket_plain(batch)
        return pack_by_bucket(batch, b, side=0)

    def tag_right(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {
                **{c: batch.column(c) for c in by_cols},
                on: batch.column(on),
                **{rename[c]: batch.column(c) for c in right_cols},
            }
        )
        if n_salts > 1:
            # replicate the right side once per salt so every salted
            # bucket sees the entity's full right history (same blob
            # bytes shipped n_salts times — replication factor unchanged,
            # each copy now compressed)
            n = batch.num_rows
            pieces = [
                pack_by_bucket(
                    out,
                    _bucket_salted(batch, np.full(n, s, dtype=np.int64)),
                    side=1,
                )
                for s in range(n_salts)
            ]
            return pa.concat_tables(pieces)
        return pack_by_bucket(out, _bucket_plain(batch), side=1)

    # batch_size=None → tag the WHOLE upstream block per call: per-blob
    # IPC overhead (~0.7 KB schema+header) amortizes over block/buckets
    # rows instead of 1024/buckets rows (the map_batches default)
    tagged_left = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tagged_right = right_proj.map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    unioned = tagged_left.union(tagged_right)

    def merge_bucket(tbl: pa.Table) -> pa.Table:
        bid = int(tbl.column(_BUCKET)[0].as_py()) if tbl.num_rows else -1
        sides = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        blobs = tbl.column(_BLOB)
        l = arrow_to_pandas_safe(
            unpack_blobs(
                (blobs[i] for i in np.flatnonzero(sides == 0)), left_pa_schema
            )
        )
        r = arrow_to_pandas_safe(
            unpack_blobs(
                (blobs[i] for i in np.flatnonzero(sides == 1)), right_out_schema
            )
        )
        # NB: no early return for an empty left side — merge_asof and the
        # window_fn kernels are empty-safe and preserve dtypes, so the
        # emitted (possibly empty) table carries the FULL output schema
        # (left cols + renamed right cols + window outputs); an early
        # return used to emit a narrower schema and null-typed columns
        # (round-1 ADVICE finding).
        # merge_asof needs both frames sorted on the `on` column (galloping
        # per-entity merge happens internally via by=)
        l = l.sort_values([on, *left_tiebreak], kind="mergesort", ignore_index=True)
        r = r.sort_values([on, *by_cols], kind="mergesort", ignore_index=True)
        merged = pd.merge_asof(
            l,
            r,
            on=on,
            by=by_cols if len(by_cols) > 1 else by_cols[0],
            direction=direction,
            tolerance=tol,
            allow_exact_matches=allow_exact_matches,
        )
        if window_fn is not None:
            merged = merged.sort_values(
                [*by_cols, on, *left_tiebreak], kind="mergesort", ignore_index=True
            )
            merged = window_fn(merged)
        out = pandas_to_arrow(merged)
        if bucket_sink is not None:
            return bucket_sink(bid, out)
        return out

    return unioned.groupby(_BUCKET).map_groups(merge_bucket, batch_format="pyarrow")


def resample_entity_grid(
    ds,
    entity_col: str,
    ts_col: str,
    value_cols,
    *,
    freq: str | pd.Timedelta = "1h",
    grid_col: str | None = None,
    num_buckets: int = 64,
    max_grid_rows_per_entity: int = 1_000_000,
    method: str = "asof",
):
    """Regular-grid as-of snapshot series per entity: generate timestamps
    from floor(min ts, freq) to max ts at ``freq`` pitch and attach each
    grid point's latest-available values (backward as-of, leakage-safe)
    — the feature-store EXPORT op (models want features on a regular
    grid, events arrive on an irregular one).

    ``method="interpolate"`` linearly interpolates each grid point
    between its bracketing events instead (exact event → its value;
    after the last event → held last value; before the first → null).
    Interpolation reads the NEXT event, i.e. the FUTURE — it is an
    offline-analytics/series-regridding semantics, NOT leakage-safe
    point-in-time features; the default backward snapshot is.

    One bucketed exchange (the sorted_scan); per bucket the grids are
    built vectorized (per-entity repeat + arange) and joined with ONE
    ``pd.merge_asof``.  Input rows must be unique per (entity, ts) for
    deterministic snapshots — pre-aggregate duplicates upstream (the
    driver query does groupby-max, mirrored in its oracle).  A loud
    guard bounds grid fan-out when freq ≪ entity span."""
    from .partition import sorted_scan

    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    f_us = int(pd.Timedelta(freq).value // 1000)
    out_ts = grid_col if grid_col is not None else ts_col

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                entity_col: pd.Series(dtype=df[entity_col].dtype),
                out_ts: pd.Series(dtype="datetime64[us]"),
                **{c: pd.Series(dtype="float64") for c in value_cols},
            })
        ts = df[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        g = df.groupby(entity_col, sort=False)[ts_col]
        lo = g.min().to_numpy().astype("datetime64[us]").astype(np.int64)
        hi = g.max().to_numpy().astype("datetime64[us]").astype(np.int64)
        ents = g.min().index.to_numpy()
        t0 = (lo // f_us) * f_us  # floor to the grid origin
        counts = (hi - t0) // f_us + 1
        if counts.max() > max_grid_rows_per_entity:
            raise ValueError(
                f"resample_entity_grid: an entity needs {counts.max()} grid "
                f"rows at freq={freq} (span ≫ freq); raise "
                "max_grid_rows_per_entity or coarsen freq")
        total = int(counts.sum())
        ent_rep = np.repeat(ents, counts)
        starts = np.cumsum(counts) - counts
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        gts = np.repeat(t0, counts) + offs * f_us
        grid = pd.DataFrame({
            # match the source entity dtype exactly — merge_asof(by=...)
            # refuses int64 vs nullable-Int64 mixes
            entity_col: pd.Series(ent_rep).astype(df[entity_col].dtype),
            "__gts": gts.view("datetime64[us]"),
        })
        grid = grid.sort_values("__gts", kind="mergesort", ignore_index=True)
        right = df[[entity_col, ts_col, *value_cols]].sort_values(
            ts_col, kind="mergesort", ignore_index=True)
        merged = pd.merge_asof(grid, right, left_on="__gts", right_on=ts_col,
                               by=entity_col, direction="backward")
        if method == "interpolate":
            fwd = pd.merge_asof(grid, right, left_on="__gts", right_on=ts_col,
                                by=entity_col, direction="forward")
            t = grid["__gts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            tp = merged[ts_col].to_numpy().astype("datetime64[us]").astype(np.float64)
            tn = fwd[ts_col].to_numpy().astype("datetime64[us]").astype(np.float64)
            # same float expression as the SQL oracle, same association:
            # vp + (vn - vp) * (dt / den), dt/den both float64 casts
            with np.errstate(invalid="ignore", divide="ignore"):
                w = (t.astype(np.float64) - tp) / (tn - tp)
            for c in value_cols:
                vp = merged[c].to_numpy(dtype=np.float64)
                vn = fwd[c].to_numpy(dtype=np.float64)
                out = vp + (vn - vp) * w
                # exact event / after-last → held prev; before-first → null
                out = np.where(np.isnan(tn) | (tn == tp), vp, out)
                merged[c] = np.where(np.isnan(tp), np.nan, out)
        merged = merged.drop(columns=[ts_col]).rename(columns={"__gts": out_ts})
        return merged

    return sorted_scan(ds, entity_col, ts_col, fn, num_buckets=num_buckets)


def scd2_join(facts, dim, *, on: str, by: str, valid_from: str,
              valid_to: str, dim_cols, suffix: str = "_r",
              num_buckets: int = 64, left_tiebreak: tuple[str, ...] = (),
              **asof_kw):
    """Point-in-time join to an SCD2 (effective-dated) dimension: each
    fact row picks the dimension row of the same ``by`` key whose
    ``[valid_from, valid_to)`` interval contains the fact's ``on``
    timestamp; facts in a coverage GAP (expired dimension, or before
    the first version) get nulls — the feature-store correctness rule
    that a training row must see the attribute value that was live at
    event time, never a later one.

    Composition, one exchange: because SCD2 intervals are
    NON-OVERLAPPING per key, "the interval containing ts" is exactly
    "the latest valid_from ≤ ts" — a backward as-of join — followed by
    a vectorized expiry null-out of matches with ts ≥ valid_to.  The
    dimension rides the as-of's blob exchange; no range-join blow-up.
    ``dim_cols``: the attribute columns to carry (``valid_to`` is
    carried internally and dropped).
    """
    import pyarrow.compute as pc

    dim_cols = [dim_cols] if isinstance(dim_cols, str) else list(dim_cols)
    # contract: dim_cols / valid_to must not collide with fact column
    # names (the as-of suffix-rename would shift them silently); the
    # expire pass below fails LOUDLY on a missing column if violated
    out = asof_join(
        facts,
        dim,
        on=on,
        by=by,
        right_cols=[*dim_cols, valid_to],
        direction="backward",
        suffix=suffix,
        num_buckets=num_buckets,
        left_tiebreak=left_tiebreak,
        **asof_kw,
    )

    def expire(t: pa.Table) -> pa.Table:
        vt = t.column(valid_to)
        live = pc.and_kleene(pc.is_valid(vt),
                             pc.less(t.column(on), vt))
        for c in dim_cols:
            idx = t.schema.get_field_index(c)
            if idx < 0:
                raise KeyError(
                    f"scd2_join: dim column {c!r} missing after the as-of "
                    "join — dim_cols must not collide with fact columns")
            t = t.set_column(
                idx, c,
                pc.if_else(live, t.column(c),
                           pa.scalar(None, t.schema.field(c).type)))
        return t.drop_columns([valid_to])

    return out.map_batches(expire, batch_format="pyarrow",
                           zero_copy_batch=True)


__all__.append("scd2_join")
