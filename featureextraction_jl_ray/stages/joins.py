"""Join operators (SURVEY.md §2-B J3–J5).

- ``broadcast_join``: the small side (dimension table) is materialized
  once, ``ray.put`` into the object store, and probed per batch with a
  pandas hash merge — zero shuffle of the big side.  This is the default
  for star-schema joins at 100 TB (fact side streams; dim side is MBs).
- ``semi_join`` / ``anti_join``: broadcast the key set, filter with a
  vectorized ``isin`` — no shuffle, no row expansion.
- ``hash_join``: thin wrapper over Ray Data's native hash-partitioned
  ``Dataset.join`` for big-big joins (both sides shuffle).
- ``bucketed_hash_join``: TASK-BASED big-big equi-join on the engine's
  standard blob-packed bucketed exchange + per-bucket Acero join.
  Preferred over ``hash_join`` on contended/shared hosts: the native
  join spawns up to 64 aggregator ACTOR processes per call (fresh
  interpreter each), which serializes under load — measured 3.2 s warm
  (stable) vs 7-67 s for the native plan on the same query (round 5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow

__all__ = ["broadcast_join", "semi_join", "anti_join", "hash_join",
           "bucketed_hash_join", "range_join", "build_bloom",
           "bloom_semi_join", "bloom_anti_join", "BloomFilter",
           "pair_values_attach"]


def pair_values_attach(pairs, values, *, pair_col: str, id_col: str = "id",
                       val_col: str, out_col: str, num_buckets: int = 64):
    """Attach ``values[val_col]`` to ``pairs`` where
    ``pairs[pair_col] == values[id_col]`` (inner) via ONE co-bucketed
    exchange — the SHARDED alternative to broadcasting an id→value dict
    when the candidate payload exceeds a byte budget (VERDICT r2 №4).

    Both sides hash-bucket on the join key and meet in a tagged union
    with side-specific schemas (the ``range_join`` trick), so list-typed
    values — which Acero join payloads reject — ride the exchange
    untouched and per-task memory is bounded by bucket size, not by the
    total candidate-value bytes.
    """
    from ..functions.hashing import bucket_of
    from .partition import _BUCKET

    p_schema = pairs.schema()
    p_names = list(p_schema.names)
    p_types = dict(zip(p_schema.names, p_schema.types))
    v_types = dict(zip(values.schema().names, values.schema().types))
    side, key = "__fx_pside", "__fx_pkey"

    def tag_pairs(batch: pa.Table) -> pa.Table:
        k = batch.column(pair_col)
        batch = batch.append_column(key, k)
        batch = batch.append_column(out_col, pa.nulls(batch.num_rows,
                                                      v_types[val_col]))
        batch = batch.append_column(_BUCKET, pa.array(
            bucket_of(k.to_numpy(zero_copy_only=False), num_buckets, seed=43),
            type=pa.int64()))
        batch = batch.append_column(side, pa.array(
            np.zeros(batch.num_rows, dtype=np.int8)))
        return batch.select(sorted(batch.column_names))

    def tag_values(batch: pa.Table) -> pa.Table:
        k = batch.column(id_col)
        out = pa.table({key: k, out_col: batch.column(val_col)})
        for c in p_names:
            out = out.append_column(c, pa.nulls(batch.num_rows, p_types[c]))
        out = out.append_column(_BUCKET, pa.array(
            bucket_of(k.to_numpy(zero_copy_only=False), num_buckets, seed=43),
            type=pa.int64()))
        out = out.append_column(side, pa.array(
            np.ones(batch.num_rows, dtype=np.int8)))
        return out.select(sorted(out.column_names))

    unioned = (
        pairs.map_batches(tag_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)
        .union(values.select_columns([id_col, val_col])
               .map_batches(tag_values, batch_format="pyarrow",
                            zero_copy_batch=True))
    )

    def attach(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        is_v = df[side].to_numpy() == 1
        l = df.loc[~is_v, [*p_names, key]]
        r = df.loc[is_v, [key, out_col]]
        m = l.merge(r, on=key, how="inner")
        return pandas_to_arrow(m[[*p_names, out_col]])

    return unioned.groupby(_BUCKET).map_groups(attach, batch_format="pyarrow")


def _concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    """concat that tolerates Ray's empty schema-less blocks (a map/
    groupby plan can emit zero-column empties alongside real blocks)."""
    real = [t for t in tables if t.num_columns > 0]
    if not real:
        return tables[0] if tables else pa.table({})
    return pa.concat_tables(real, promote_options="default")


def _small_side_to_pandas(small) -> pd.DataFrame:
    if isinstance(small, pd.DataFrame):
        return small
    if isinstance(small, pa.Table):
        return arrow_to_pandas_safe(small)
    # a Dataset: materialize — caller asserts it is the SMALL side
    return arrow_to_pandas_safe(_concat_nonempty(
        [ray.get(r) for r in small.to_arrow_refs()]))


def _small_side_to_arrow(small) -> pa.Table:
    if isinstance(small, pa.Table):
        return small
    if isinstance(small, pd.DataFrame):
        return pa.Table.from_pandas(small, preserve_index=False)
    # a Dataset: materialize — caller asserts it is the SMALL side
    return _concat_nonempty([ray.get(r) for r in small.to_arrow_refs()])


def broadcast_join(
    big,
    small,
    *,
    on,
    right_on=None,
    how: str = "left",
    suffix: str = "_r",
    concurrency=None,
    batch_size: int | None = None,
):
    """Stream ``big`` and hash-probe the broadcast ``small`` per batch —
    Arrow-native end to end (``pa.Table.join`` is Acero's C++ hash join;
    no arrow↔pandas round-trips), as STATELESS TASKS by default so the
    scheduler uses every free CPU instead of a capped actor pool (the
    round-1 cap made the broadcast plan lose to the two-sided shuffle).
    The dim table ships once via ``ray.put`` and resolves zero-copy from
    the local object store in every task.

    ``small`` may be a pandas DataFrame, Arrow table, or a (small!)
    Dataset.  ``how`` ∈ {left, inner}.
    """
    if how not in ("left", "inner"):
        raise ValueError("broadcast_join supports how='left'|'inner'")
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    join_type = "left outer" if how == "left" else "inner"
    dim = _small_side_to_arrow(small)
    ref = ray.put(dim)

    def probe(batch: pa.Table) -> pa.Table:
        return batch.join(
            ray.get(ref),
            keys=on,
            right_keys=right_on,
            join_type=join_type,
            right_suffix=suffix,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    if concurrency is None:
        return big.map_batches(probe, **kwargs)

    class Probe:
        def __init__(self):
            self._dim = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self._dim, keys=on, right_keys=right_on,
                              join_type=join_type, right_suffix=suffix)

    return big.map_batches(Probe, concurrency=concurrency, **kwargs)


def _key_set_filter(big, keys, on, keep_in: bool):
    """Stateless broadcast set-probe: the key set ships once via ray.put
    (resolved from the LOCAL object store per task), single-key probes are
    vectorized ``pc.is_in`` (C hash probe, any arrow type); composite keys
    probe via a C-speed pandas inner merge against the deduped key frame —
    no per-row Python tuple loop (VERDICT r3 #4; measured 284→150 ms per
    1M rows × 10k int-pair keys).  Stateless tasks, not an actor pool —
    a capped pool only adds spin-up latency to a pure filter."""
    import pyarrow.compute as pc

    on = [on] if isinstance(on, str) else list(on)

    if isinstance(keys, (pd.DataFrame, pa.Table)):
        keys_df = _small_side_to_pandas(keys) if not isinstance(keys, pd.DataFrame) else keys
    else:
        keys_df = keys.to_pandas()
    if len(on) == 1:
        value_set = pa.array(keys_df[on[0]].unique())
        ref = ray.put(value_set)

        def probe(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(on[0]), value_set=ray.get(ref))
            if not keep_in:
                mask = pc.invert(pc.fill_null(mask, False))
            return batch.filter(mask)

    else:
        keys_u = keys_df[on].drop_duplicates(ignore_index=True)
        ref = ray.put(keys_u)

        def probe(batch: pa.Table) -> pa.Table:
            ku = ray.get(ref)
            cdf = pd.DataFrame(
                {c: batch.column(c).to_numpy(zero_copy_only=False) for c in on}
            )
            cdf["__fx_pos"] = np.arange(batch.num_rows)
            hit = cdf.merge(ku, on=on, how="inner")["__fx_pos"].to_numpy()
            mask = np.zeros(batch.num_rows, dtype=bool)
            mask[hit] = True
            if not keep_in:
                mask = ~mask
            return batch.filter(pa.array(mask))

    return big.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def semi_join(big, keys, *, on):
    """Rows of ``big`` whose key appears in ``keys`` (broadcast set probe)."""
    return _key_set_filter(big, keys, on, keep_in=True)


def anti_join(big, keys, *, on):
    """Rows of ``big`` whose key does NOT appear in ``keys``."""
    return _key_set_filter(big, keys, on, keep_in=False)


def hash_join(left, right, *, on, right_on=None, how: str = "inner",
              num_partitions: int | None = None):
    """Big-big equi-join via Ray Data's native hash-partitioned join.

    ``num_partitions=None`` → max(16, 2× cluster CPUs): the join's reduce
    wave runs one task per partition, so partitions must cover the
    cluster (a fixed 16 left a 32-cpu box half idle — measured 3.5 →
    2.9 s on the bench join at 64)."""
    if num_partitions is None:
        from .partition import _cluster_cpus

        num_partitions = max(16, 2 * _cluster_cpus())
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = on if right_on is None else (
        (right_on,) if isinstance(right_on, str) else tuple(right_on)
    )
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=on,
        right_on=right_on,
    )


def bucketed_hash_join(
    left,
    right,
    *,
    on,
    right_on=None,
    how: str = "inner",
    num_buckets: int | None = None,
    seed: int = 0,
    suffix: str = "_r",
    left_types: dict | None = None,
    right_types: dict | None = None,
):
    """Big-big equi-join as a TASK-BASED bucketed exchange + per-bucket
    Acero hash join — the no-actor-spawn sibling of :func:`hash_join`.

    Why it exists: Ray 2.49's native ``Dataset.join`` runs its hash
    shuffle on AGGREGATOR ACTORS — up to ``max_hash_shuffle_aggregators``
    (default 64) fresh actor processes started PER JOIN CALL, each a new
    Python interpreter import (~1-2 s CPU).  On a loaded host that spawn
    storm serializes: BENCH_r04 recorded the native-join query at 41.7 s
    (and an r5 in-sequence sample at 67 s) vs 3-5 s isolated, while
    neighboring task-based queries inflated only ~2x.  This variant rides
    the engine-standard exchange instead (``stages/blobshuffle.py``):
    both sides hash-bucket on the key with the SAME stable SipHash used
    by every co-partitioned stage, pack per-bucket compressed IPC blobs,
    meet in ONE tagged union + ``groupby(_BUCKET).map_groups`` shuffle,
    and join inside the bucket with ``pa.Table.join`` (Acero C++ hash
    join).  All stages are plain tasks that reuse the session's idle
    worker pool — no actor startup on the critical path, and the same
    scale shape as the native join (keys never split buckets; bucket
    count scales with the cluster).

    ``how`` ∈ {"inner", "left"}.  Right key columns are dropped from the
    output (join-key identity), non-key right columns colliding with a
    left name get ``suffix``.  ``left_types`` / ``right_types``
    ({name: arrow type}, in column order) skip the ``ds.schema()``
    partial-execution cost exactly as in :func:`~.asof.asof_join`.
    """
    from ..functions.hashing import bucket_of_multi
    from .blobshuffle import _BLOB, _SIDE, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET, _cluster_cpus

    if how not in ("inner", "left"):
        raise ValueError("bucketed_hash_join supports how='inner'|'left'")
    join_type = "left outer" if how == "left" else "inner"
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if num_buckets is None:
        num_buckets = max(16, 2 * _cluster_cpus())

    def _as_pa_type(t):
        # ds.schema() on a pandas-block dataset reports numpy dtypes and
        # bare `object` for strings, not arrow DataTypes
        if isinstance(t, pa.DataType):
            return t
        if t is object or t is str:
            return pa.string()
        return pa.from_numpy_dtype(t)

    if left_types is None:
        s = left.schema()
        left_types = dict(zip(s.names, s.types))
    if right_types is None:
        s = right.schema()
        right_types = dict(zip(s.names, s.types))
    left_schema = pa.schema(
        [pa.field(n, _as_pa_type(t)) for n, t in left_types.items()]
    )
    right_schema = pa.schema(
        [pa.field(n, _as_pa_type(t)) for n, t in right_types.items()]
    )

    def _tag(key_cols, side):
        def tag(batch: pa.Table) -> pa.Table:
            b = bucket_of_multi(
                [batch.column(c).to_numpy(zero_copy_only=False)
                 for c in key_cols],
                num_buckets,
                seed=seed,
            )
            return pack_by_bucket(batch, b, side=side)

        return tag

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=None)
    tagged = left.map_batches(_tag(on, 0), **kwargs).union(
        right.map_batches(_tag(right_on, 1), **kwargs)
    )

    def join_bucket(tbl: pa.Table) -> pa.Table:
        sides = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        blobs = tbl.column(_BLOB)
        l = unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 0)), left_schema
        )
        r = unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 1)), right_schema
        )
        # no early return on an empty side: the (possibly empty) Acero
        # result still carries the FULL joined schema, so empty buckets
        # can't narrow the dataset schema (round-1 ADVICE class)
        return l.join(r, keys=on, right_keys=right_on, join_type=join_type,
                      right_suffix=suffix)

    return tagged.groupby(_BUCKET).map_groups(
        join_bucket, batch_format="pyarrow"
    )


def range_join(
    left,
    right,
    *,
    by: str,
    on: str,
    start_col: str,
    end_col: str,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
    suffix: str = "_r",
    max_intervals_per_entity: int = 100_000,
    dense_threshold: int = 512,
):
    """Interval join: left rows (entity e, time t) × right intervals
    (entity e, [start, end]) with start ≤ t ≤ end — INNER, one output row
    per matching (row, interval) pair (intervals may overlap).

    Scale shape mirrors the as-of join: both sides bucket by the SAME
    stable entity hash and co-locate in ONE exchange.  Inside a bucket,
    SPARSE entities (≤ ``dense_threshold`` intervals) match via one
    C-implemented entity-equi merge + vectorized interval filter
    (cost rows_e × intervals_e — fine when intervals_e is small);
    DENSE entities switch to pandas' C interval tree
    (``IntervalIndex.get_indexer_non_unique``), whose cost is
    O((rows_e + intervals_e)·log + |matches|) — no quadratic
    pair materialization (VERDICT r2 "missing" #4).

    ``max_intervals_per_entity`` stays as the loud memory guard: one
    entity's intervals + rows must still fit a single bucket frame.
    """
    from ..functions.hashing import bucket_of
    from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
    from .blobshuffle import _BLOB, _SIDE, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET

    if right_cols is None:
        s = right.schema()
        right_cols = [c for c in s.names if c not in (by,)]
    left_names = list(left.schema().names)
    rename = {c: (c + suffix if c in left_names else c) for c in right_cols}

    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    left_pa_schema = pa.schema([pa.field(n, l_schema[n]) for n in left_names])
    right_pa_schema = pa.schema(
        [pa.field(by, r_schema[by]),
         *(pa.field(rename[c], r_schema[c]) for c in right_cols)]
    )

    # blob exchange (same wire format as the as-of join): each side keeps
    # its own schema INSIDE compressed IPC blobs, so no null-padding
    # columns ride the all-to-all and the shuffle sorts blob rows (a few
    # per input block), not data rows
    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.select(left_names)
        ent = batch.column(by).to_numpy(zero_copy_only=False)
        return pack_by_bucket(batch, bucket_of(ent, num_buckets), side=0)

    def tag_right(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {by: batch.column(by),
             **{rename[c]: batch.column(c) for c in right_cols}}
        )
        ent = batch.column(by).to_numpy(zero_copy_only=False)
        return pack_by_bucket(out, bucket_of(ent, num_buckets), side=1)

    unioned = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        right.select_columns([by, *right_cols]).map_batches(
            tag_right, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
    )
    start_r, end_r = rename[start_col], rename[end_col]

    def _tree_match(li: "pd.DataFrame", ri: "pd.DataFrame") -> "pd.DataFrame":
        """One dense entity: C interval tree stab queries, output-bounded."""
        starts = ri[start_r].to_numpy()
        ends = ri[end_r].to_numpy()
        valid = ~(pd.isna(starts) | pd.isna(ends)) & (starts <= ends)
        ri = ri.loc[valid]
        starts, ends = starts[valid], ends[valid]
        t = li[on].to_numpy()
        tvalid = ~pd.isna(t)
        li, t = li.loc[tvalid], t[tvalid]
        if not len(ri) or not len(li):
            return None
        ii = pd.IntervalIndex.from_arrays(starts, ends, closed="both")
        idx, _ = ii.get_indexer_non_unique(pd.Index(t))
        # per-target match counts (searchsorted trick) attribute the flat
        # indexer back to queries; a 0-count query contributes one -1
        counts = (
            np.searchsorted(np.sort(starts), t, side="right")
            - np.searchsorted(np.sort(ends), t, side="left")
        )
        rep = np.repeat(np.arange(len(t)), counts + (counts == 0))
        keep = idx >= 0
        lpart = li.iloc[rep[keep]].reset_index(drop=True)
        rpart = ri.iloc[idx[keep]].drop(columns=[by]).reset_index(drop=True)
        return pd.concat([lpart, rpart], axis=1)

    def match(tbl: pa.Table) -> pa.Table:
        sides = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        blobs = tbl.column(_BLOB)
        l = arrow_to_pandas_safe(unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 0)), left_pa_schema))
        r = arrow_to_pandas_safe(unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 1)), right_pa_schema))
        dense_ents = None
        if len(r):
            sizes = r.groupby(by, sort=False).size()
            if sizes.max() > max_intervals_per_entity:
                raise RuntimeError(
                    f"range_join: an entity carries {int(sizes.max())} "
                    f"intervals (> {max_intervals_per_entity}); its rows + "
                    "intervals exceed the per-bucket memory budget — trim or "
                    "pre-reduce the hot entity upstream"
                )
            dense_ents = sizes.index[sizes > dense_threshold]
        pieces = []
        if dense_ents is not None and len(dense_ents):
            dense_l = l[by].isin(dense_ents).to_numpy()
            dense_r = r[by].isin(dense_ents).to_numpy()
            # ONE groupby pass per side to slice each dense entity's
            # frame (per-entity equality masks would rescan the whole
            # bucket n_dense times)
            l_groups = dict(iter(l.loc[dense_l].groupby(by, sort=False)))
            for ent, ri in r.loc[dense_r].groupby(by, sort=False):
                li = l_groups.get(ent)
                if li is None:
                    continue
                p = _tree_match(li, ri)
                if p is not None:
                    pieces.append(p)
            l = l.loc[~dense_l]
            r = r.loc[~dense_r]
        m = l.merge(r, on=by, how="inner")
        keep = (m[on] >= m[start_r]) & (m[on] <= m[end_r])
        pieces.append(m.loc[keep])
        out = pd.concat(pieces, ignore_index=True) if len(pieces) > 1 else (
            pieces[0].reset_index(drop=True)
        )
        return pandas_to_arrow(out)

    return unioned.groupby(_BUCKET).map_groups(match, batch_format="pyarrow")


class BloomFilter:
    """Immutable bloom filter over a key column: ``m`` bits, ``k``
    double-hashed probes (h1 + j·h2 mod m) from the repo's stable
    SipHash (`functions/hashing.py`) — deterministic across processes."""

    def __init__(self, bits: np.ndarray, num_hashes: int):
        self.bits = bits  # uint8 bitmap, len = m/8
        self.k = int(num_hashes)
        self.m = int(len(bits)) * 8

    def _positions(self, values) -> np.ndarray:
        from ..functions.hashing import stable_hash_array

        h1 = stable_hash_array(values, seed=0xB100F)
        h2 = stable_hash_array(values, seed=0xB200F) | np.uint64(1)
        j = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(self.m)

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test → bool mask (false positives only)."""
        pos = self._positions(values)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)


def build_bloom(keys, col: str, *, bits_per_key: int = 16,
                num_hashes: int | None = None) -> BloomFilter:
    """Build a bloom filter of ``keys[col]`` with a MERGEABLE per-block
    bitmap OR-reduce (``Dataset.aggregate``), so the key side streams —
    only m/8-byte bitmaps travel the reduce tree.  FP rate ≈
    0.6185^bits_per_key (~4e-4 at 16 bits).  The bitmap must fit one
    worker heap (2 GB per 10⁹ keys at 16 bits); shard the filter by key
    hash beyond that."""
    if isinstance(keys, (pd.DataFrame, pa.Table)):
        df = _small_side_to_pandas(keys)
        n = max(len(df), 1)
    else:
        n = max(keys.count(), 1)
    k = num_hashes if num_hashes is not None else max(int(round(0.693 * bits_per_key)), 1)
    m = ((n * bits_per_key + 63) // 64) * 64  # byte/word aligned
    if isinstance(keys, (pd.DataFrame, pa.Table)):
        bf = BloomFilter(np.zeros(m // 8, dtype=np.uint8), k)
        bf.add(df[col].to_numpy())
        return bf

    from ray.data.aggregate import AggregateFn

    def acc_block(acc: np.ndarray, block) -> np.ndarray:
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        bf = BloomFilter(acc, k)
        bf.add(tbl.column(col).to_numpy(zero_copy_only=False))
        return bf.bits

    agg = AggregateFn(
        init=lambda _: np.zeros(m // 8, dtype=np.uint8),
        accumulate_block=acc_block,
        merge=np.bitwise_or,
        name="bloom",
    )
    bits = keys.aggregate(agg)["bloom"]
    return BloomFilter(bits, k)


def bloom_semi_join(big, keys, *, on: str, right_on: str | None = None,
                    bits_per_key: int = 16, verify: bool = True,
                    num_partitions: int = 16):
    """Semi-join for key sets too big to broadcast exactly: a bloom
    bitmap of the key side ships once (bits_per_key bits/key vs 64+ for
    the exact set) and prefilters the big side BEFORE any shuffle; the
    surviving ~|match| + FP·|big| rows then exact-verify through a
    hash-partitioned inner join against the DISTINCT keys.  Output is
    EXACT (the bloom only bounds the shuffle volume).  ``verify=False``
    skips the join and returns the approximate prefilter (FP rate
    ≈0.6185^bits_per_key) — the cheap path when downstream tolerates it."""
    right_on = on if right_on is None else right_on
    bf = build_bloom(keys, right_on, bits_per_key=bits_per_key)

    def prefilter(batch: pa.Table) -> pa.Table:
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bf.contains(vals)))

    survivors = big.map_batches(prefilter, batch_format="pyarrow",
                                zero_copy_batch=True)
    if not verify:
        return survivors
    if isinstance(keys, (pd.DataFrame, pa.Table)):
        df = _small_side_to_pandas(keys)[[right_on]].drop_duplicates()
        df = df.rename(columns={right_on: on})
        return semi_join(survivors, df, on=on)
    distinct = keys.groupby(right_on).count().select_columns([right_on])
    left_cols = list(big.schema().names)
    joined = survivors.join(distinct, join_type="inner",
                            num_partitions=num_partitions,
                            on=(on,), right_on=(right_on,))
    return joined.select_columns(left_cols)


def bloom_anti_join(big, keys, *, on: str, right_on: str | None = None,
                    bits_per_key: int = 16, num_partitions: int = 16):
    """EXACT anti-join with a bloom short-circuit — the dedup-against-
    history shape (keep only rows whose key was never seen): rows the
    bloom says are DEFINITELY absent pass through with zero exchange;
    only the ~FP·|big| + |match| collision rows exact-verify against the
    distinct keys (hash-partitioned left_anti join).  Output is exact —
    a bloom false positive can only route a row through the verify path,
    never drop it."""
    right_on = on if right_on is None else right_on
    bf = build_bloom(keys, right_on, bits_per_key=bits_per_key)

    def definite_absent(batch: pa.Table) -> pa.Table:
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~bf.contains(vals)))

    def possible_member(batch: pa.Table) -> pa.Table:
        vals = batch.column(on).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(bf.contains(vals)))

    absent = big.map_batches(definite_absent, batch_format="pyarrow",
                             zero_copy_batch=True)
    collide = big.map_batches(possible_member, batch_format="pyarrow",
                              zero_copy_batch=True)
    if isinstance(keys, (pd.DataFrame, pa.Table)):
        df = _small_side_to_pandas(keys)[[right_on]].drop_duplicates()
        df = df.rename(columns={right_on: on})
        survivors = anti_join(collide, df, on=on)
    else:
        distinct = keys.groupby(right_on).count().select_columns([right_on])
        survivors = collide.join(distinct, join_type="left_anti",
                                 num_partitions=num_partitions,
                                 on=(on,), right_on=(right_on,))
    return absent.union(survivors)


def interval_overlap_join(
    left,
    right,
    *,
    by: str,
    left_start: str,
    left_end: str,
    start_col: str,
    end_col: str,
    right_cols: list[str] | None = None,
    num_buckets: int = 64,
    suffix: str = "_r",
    max_intervals_per_entity: int = 100_000,
    dense_threshold: int = 512,
):
    """Interval-OVERLAP join: left intervals (entity e, [ls, le]) ×
    right intervals (entity e, [rs, re]) with ``ls ≤ re AND rs ≤ le``
    (closed ends) — INNER, one output row per overlapping pair.  The
    both-sides-intervals sibling of :func:`range_join` (availability
    windows × booking windows, session spans × incident spans).

    Scale shape: the same single blob-packed entity exchange as
    range_join.  Inside a bucket, SPARSE entities merge + filter
    (rows_e × intervals_e); DENSE entities use the exact two-stab
    decomposition — a pair overlaps iff (rs ≤ ls ≤ re) OR
    (ls < rs ≤ le) — so both directions are C interval-tree stab
    queries (closed='both' then closed='right'), each output-bounded:
    no candidate set ever includes a non-match.  Loud
    ``max_intervals_per_entity`` guard; invalid intervals
    (null or start > end) never match."""
    from ..functions.hashing import bucket_of
    from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
    from .blobshuffle import _BLOB, _SIDE, pack_by_bucket, unpack_blobs
    from .partition import _BUCKET

    if right_cols is None:
        s = right.schema()
        right_cols = [c for c in s.names if c != by]
    left_names = list(left.schema().names)
    rename = {c: (c + suffix if c in left_names else c) for c in right_cols}

    l_schema = dict(zip(left.schema().names, left.schema().types))
    r_schema = dict(zip(right.schema().names, right.schema().types))
    left_pa_schema = pa.schema([pa.field(n, l_schema[n]) for n in left_names])
    right_pa_schema = pa.schema(
        [pa.field(by, r_schema[by]),
         *(pa.field(rename[c], r_schema[c]) for c in right_cols)])

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.select(left_names)
        ent = batch.column(by).to_numpy(zero_copy_only=False)
        return pack_by_bucket(batch, bucket_of(ent, num_buckets), side=0)

    def tag_right(batch: pa.Table) -> pa.Table:
        out = pa.table(
            {by: batch.column(by),
             **{rename[c]: batch.column(c) for c in right_cols}})
        ent = batch.column(by).to_numpy(zero_copy_only=False)
        return pack_by_bucket(out, bucket_of(ent, num_buckets), side=1)

    unioned = left.map_batches(
        tag_left, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).union(
        right.select_columns([by, *right_cols]).map_batches(
            tag_right, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None))
    start_r, end_r = rename[start_col], rename[end_col]

    def _valid(df, s_col, e_col):
        s = df[s_col].to_numpy()
        e = df[e_col].to_numpy()
        return df.loc[~(pd.isna(s) | pd.isna(e)) & (s <= e)]

    def _stab(points_df, pt_col, iv_df, s_col, e_col, closed):
        """pairs (point row i, interval row j) with pt stabbing iv."""
        ii = pd.IntervalIndex.from_arrays(iv_df[s_col].to_numpy(),
                                          iv_df[e_col].to_numpy(),
                                          closed=closed)
        t = points_df[pt_col].to_numpy()
        idx, _ = ii.get_indexer_non_unique(pd.Index(t))
        ss = np.sort(iv_df[s_col].to_numpy())
        ee = np.sort(iv_df[e_col].to_numpy())
        if closed == "both":
            counts = (np.searchsorted(ss, t, side="right")
                      - np.searchsorted(ee, t, side="left"))
        else:  # closed="right": s < t <= e
            counts = (np.searchsorted(ss, t, side="left")
                      - np.searchsorted(ee, t, side="left"))
        rep = np.repeat(np.arange(len(t)), counts + (counts == 0))
        keep = idx >= 0
        return rep[keep], idx[keep]

    def _dense_match(li: "pd.DataFrame", ri: "pd.DataFrame"):
        # M1: right intervals stabbed by left start (rs <= ls <= re)
        i1, j1 = _stab(li, left_start, ri, start_r, end_r, "both")
        # M2: left intervals (ls, le] stabbed by right start (ls < rs <= le)
        j2, i2 = _stab(ri, start_r, li, left_start, left_end, "right")
        li_idx = np.concatenate([i1, i2])
        ri_idx = np.concatenate([j1, j2])
        if not len(li_idx):
            return None
        lpart = li.iloc[li_idx].reset_index(drop=True)
        rpart = ri.iloc[ri_idx].drop(columns=[by]).reset_index(drop=True)
        return pd.concat([lpart, rpart], axis=1)

    def match(tbl: pa.Table) -> pa.Table:
        sides = tbl.column(_SIDE).to_numpy(zero_copy_only=False)
        blobs = tbl.column(_BLOB)
        l = arrow_to_pandas_safe(unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 0)), left_pa_schema))
        r = arrow_to_pandas_safe(unpack_blobs(
            (blobs[i] for i in np.flatnonzero(sides == 1)), right_pa_schema))
        l = _valid(l, left_start, left_end) if len(l) else l
        r = _valid(r, start_r, end_r) if len(r) else r
        dense_ents = None
        if len(r):
            sizes = r.groupby(by, sort=False).size()
            if sizes.max() > max_intervals_per_entity:
                raise RuntimeError(
                    f"interval_overlap_join: an entity carries "
                    f"{int(sizes.max())} intervals "
                    f"(> {max_intervals_per_entity}) — trim or pre-reduce "
                    f"the hot entity upstream")
            dense_ents = sizes.index[sizes > dense_threshold]
        pieces = []
        if dense_ents is not None and len(dense_ents):
            dl = l[by].isin(dense_ents).to_numpy()
            dr = r[by].isin(dense_ents).to_numpy()
            l_groups = dict(iter(l.loc[dl].groupby(by, sort=False)))
            for ent, ri in r.loc[dr].groupby(by, sort=False):
                li = l_groups.get(ent)
                if li is None:
                    continue
                p = _dense_match(li, ri)
                if p is not None:
                    pieces.append(p)
            l = l.loc[~dl]
            r = r.loc[~dr]
        m = l.merge(r, on=by, how="inner")
        keep = ((m[left_start] <= m[end_r])
                & (m[start_r] <= m[left_end]))
        pieces.append(m.loc[keep])
        out = pd.concat(pieces, ignore_index=True) if len(pieces) > 1 else (
            pieces[0].reset_index(drop=True))
        return pandas_to_arrow(out)

    return unioned.groupby(_BUCKET).map_groups(match, batch_format="pyarrow")


__all__.append("interval_overlap_join")


def coalesce_lookup(ds, levels, *, out_col: str, default=None):
    """Hierarchical fallback lookup (the dimension-default pattern:
    per-entity override, else per-category value, else global default):
    probe each ``(small_table, fact_key_col, value_col)`` level in
    order — most specific first — and take the FIRST non-null match
    per row.

    Each level is a driver-bounded table broadcast once (``ray.put``
    under Ray's closure capture) and hash-probed per batch by Acero —
    N levels cost N broadcast probes and ZERO exchanges of the fact
    table.  Levels may key on DIFFERENT fact columns (user_id, then
    event_type, then nothing) — that is the point of the hierarchy.
    ``default``: scalar used when every level misses (None → null).
    """
    import pyarrow.compute as pc

    tmp_cols = []
    for i, (tbl, fact_key, value_col) in enumerate(levels):
        tmp = f"__lv{i}"
        small = tbl.select([fact_key, value_col]) \
            if fact_key in tbl.column_names else tbl
        small = small.rename_columns(
            [c if c != value_col else tmp for c in small.column_names])
        ds = broadcast_join(ds, small, on=fact_key, how="left")
        tmp_cols.append(tmp)

    def finish(t: pa.Table) -> pa.Table:
        args = [t.column(c) for c in tmp_cols]
        if default is not None:
            args.append(pa.scalar(default))
        out = pc.coalesce(*args)
        return t.drop_columns(tmp_cols).append_column(out_col, out)

    return ds.map_batches(finish, batch_format="pyarrow",
                          zero_copy_batch=True)


__all__.append("coalesce_lookup")


def skew_join(
    left,
    right,
    *,
    on,
    right_on=None,
    how: str = "inner",
    max_hot: int = 64,
    hot_share: float = 0.0,
    sample_frac: float = 0.02,
    max_sample: int = 100_000,
    seed: int = 42,
    num_buckets: int | None = None,
    suffix: str = "_r",
    left_types: dict | None = None,
    right_types: dict | None = None,
):
    """Skew-aware big-big equi-join: HOT probe keys bypass the shuffle.

    The failure mode this exists for: a hash-partitioned join sends
    every row of a key to one reducer, so one viral entity (a hot user,
    a boilerplate phash, a default value) turns an even exchange into a
    single straggler task that holds the whole job — the classic 100 TB
    skew killer.  Fix: detect hot keys from a seeded SAMPLE of the
    probe side, REPLICATE their (small) build rows to every probe task
    via the broadcast path, and send only the evenly-spread remainder
    through the bucketed exchange:

        hot  = top ``max_hot`` sampled keys with share ≥ ``hot_share``
        left_hot  ⋈ broadcast(right[key ∈ hot])   (no shuffle at all)
        left_cold ⋈ right[key ∉ hot]              (bucketed exchange)
        result = union — exact same rows as a plain join, any key mix.

    Assumes the build side is dimension-like per hot key (its hot-key
    rows must fit the object store — guarded by ``_HOT_BUILD_BUDGET``).
    ``left`` is scanned twice (hot + cold branch off the same read);
    with column-pruned parquet scans that is cheaper at scale than a
    ``materialize()`` pin of the fact table.  Single-column keys only
    (the is_in prefilter is per-column).  ``how`` ∈ {"inner", "left"}.
    """
    import pyarrow.compute as pc

    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")
    if not isinstance(on, str):
        raise ValueError("skew_join takes a single key column")
    right_key = right_on if isinstance(right_on, str) else (right_on or on)

    # --- hot-key detection: seeded sample of the probe side ------------
    sdf = (left.select_columns([on]).random_sample(sample_frac, seed=seed)
               .to_pandas())
    # an empty sample loses the schema entirely (no columns)
    s = sdf[on].dropna() if on in sdf.columns else pd.Series([], dtype=object)
    if len(s) > max_sample:
        s = s.iloc[:max_sample]
    freq = s.value_counts()
    if len(s):
        freq = freq[freq / len(s) >= hot_share]
    hot = freq.head(max_hot).index.to_numpy()
    if len(hot) == 0:
        return bucketed_hash_join(
            left, right, on=on, right_on=right_key, how=how,
            num_buckets=num_buckets, suffix=suffix,
            left_types=left_types, right_types=right_types,
        )
    hot_arr = pa.array(hot)

    def _split(ds, col, keep_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column(col), value_set=hot_arr)
            m = pc.fill_null(m, False)
            return batch.filter(m if keep_hot else pc.invert(m))

        return ds.map_batches(f, batch_format="pyarrow",
                              zero_copy_batch=True)

    _HOT_BUILD_BUDGET = 1 << 28  # 256 MB of replicated build rows
    right_hot = _split(right, right_key, True)
    dim = _concat_nonempty(
        list(right_hot.iter_batches(batch_size=None, batch_format="pyarrow"))
    )
    if dim.nbytes > _HOT_BUILD_BUDGET:
        raise ValueError(
            f"skew_join: hot-key build rows are {dim.nbytes >> 20} MB "
            f"(budget {_HOT_BUILD_BUDGET >> 20} MB) — the build side is "
            "not dimension-like on the hot keys; lower max_hot or use "
            "bucketed_hash_join with salting"
        )
    hot_joined = broadcast_join(
        _split(left, on, True), dim, on=on, right_on=right_key,
        how=how, suffix=suffix,
    )
    cold_joined = bucketed_hash_join(
        _split(left, on, False), _split(right, right_key, False),
        on=on, right_on=right_key, how=how, num_buckets=num_buckets,
        suffix=suffix, left_types=left_types, right_types=right_types,
    )
    return hot_joined.union(cold_joined)


__all__.append("skew_join")
