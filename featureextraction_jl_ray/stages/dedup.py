"""Deduplication operators (SURVEY.md §2-B D2/D3 + the training-data dedup
family): exact dedup with explicit skew salting, and Hamming-ball
near-dup over 64-bit hashes (phash / simhash) via banded LSH.

Skew contract (BASELINE.json:6 "explicit salting of skewed
phash-duplicate keys"): a phash shared by 30% of a 10^12-row table would
send 3·10^11 rows to one reducer.  ``exact_dedup`` therefore always
reduces in two stages — stage 1 groups by (key, salt) where salt is a
deterministic hash of the row id into ``num_salts`` cells, keeping one
survivor per salted cell; stage 2 re-groups the ≤ num_salts survivors
per key without salt.  No group in either stage exceeds
max(rows_of_key / num_salts, num_salts) rows, and the reduction stays
associative (keep-first-by-order is a semilattice min), so salting never
changes the result — test_dedup asserts salted == unsalted == SQL oracle.
(Skew rationale: FP-Hadoop, VLDB 2015 — PAPERS.md.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import bucket_of, bucket_of_multi, stable_hash_array
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow

_BUCKET = "__fx_dbucket"
_SALT = "__fx_salt"

__all__ = ["exact_dedup", "hamming_near_dup_pairs", "hamming_dedup",
           "collapse_pairs"]


def collapse_pairs(ds, pairs_pd: pd.DataFrame, id_col: str, *,
                   max_pairs: int = 10_000_000):
    """Keep one representative per connected component of a verified
    near-dup pair set (min id wins) — the shared cluster-collapse tail of
    hamming/jaccard/embedding dedup.

    Union-find runs on the driver over ``pairs_pd`` (columns id_a, id_b),
    which is bounded by near-dup density, never corpus size; the guard is
    loud, not an OOM.  The sorted drop list rides the task closure
    (serialized once per worker) and filters via one vectorized np.isin.
    """
    if len(pairs_pd) > max_pairs:
        raise RuntimeError(
            f"collapse_pairs: verified pair set ({len(pairs_pd)}) exceeds "
            f"max_pairs={max_pairs}; tighten the near-dup threshold"
        )
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_pd.get("id_a", ()), pairs_pd.get("id_b", ())):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    drop = np.array(sorted(x for x in parent if find(x) != x), dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        if not len(drop):
            return batch
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(ids, drop)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def _keep_one(df: pd.DataFrame, key_cols, order_cols, ascending) -> pd.DataFrame:
    df = df.sort_values(list(order_cols), ascending=ascending, kind="mergesort")
    return df.drop_duplicates(subset=list(key_cols), keep="first")


def exact_dedup(
    ds,
    key_cols,
    *,
    order_cols,
    ascending: bool | list[bool] = True,
    num_salts: int = 16,
    num_buckets: int = 64,
):
    """Keep the first row per key (ordered by ``order_cols``) — two-stage
    salted reduce, safe under arbitrarily skewed keys.

    ``order_cols`` must totally order rows within a key (include a unique
    id as the last column) or the survivor is nondeterministic.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def add_salted_bucket(batch: pa.Table) -> pa.Table:
        # salt from the LAST order col (unique id) → uniform spread of a
        # hot key's rows across num_salts cells
        salt = bucket_of(
            batch.column(order_cols[-1]).to_numpy(zero_copy_only=False),
            num_salts,
            seed=7,
        )
        keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        b = bucket_of_multi([*keys, salt], num_buckets, seed=11)
        return batch.append_column(_SALT, pa.array(salt)).append_column(
            _BUCKET, pa.array(b)
        )

    def stage1(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        out = _keep_one(df, [*key_cols, _SALT], order_cols, ascending)
        return pandas_to_arrow(out.drop(columns=[_BUCKET]))

    def add_key_bucket(batch: pa.Table) -> pa.Table:
        keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        b = bucket_of_multi(keys, num_buckets, seed=13)
        return batch.append_column(_BUCKET, pa.array(b))

    def stage2(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        out = _keep_one(df, key_cols, order_cols, ascending)
        return pandas_to_arrow(out.drop(columns=[_BUCKET, _SALT]))

    salted = ds.map_batches(add_salted_bucket, batch_format="pyarrow", zero_copy_batch=True)
    survivors = salted.groupby(_BUCKET).map_groups(stage1, batch_format="pyarrow")
    rebucketed = survivors.map_batches(
        add_key_bucket, batch_format="pyarrow", zero_copy_batch=True
    )
    return rebucketed.groupby(_BUCKET).map_groups(stage2, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Hamming-ball near-dup on 64-bit hashes (phash, simhash)
# ---------------------------------------------------------------------------

_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64/int64 array."""
    v = x.astype(np.uint64).view(np.uint8).reshape(-1, 8)
    return _POPCOUNT_TABLE[v].sum(axis=1).astype(np.int64)


def _bands(hashes: np.ndarray, num_bands: int) -> np.ndarray:
    """(n, num_bands) int64 band values — contiguous bit slices of the hash."""
    h = hashes.astype(np.uint64)
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    out = np.empty((len(h), num_bands), dtype=np.int64)
    for b in range(num_bands):
        out[:, b] = ((h >> np.uint64(b * width)) & mask).astype(np.int64)
    return out


def hamming_near_dup_pairs(
    ds,
    hash_col: str,
    id_col: str,
    *,
    max_distance: int = 3,
    num_buckets: int = 256,
    collapse_exact: bool = True,
):
    """Candidate-verified near-duplicate pairs (id_a < id_b, hamming ≤ d)
    between DISTINCT hash values' representatives.

    Scale-critical pre-step (``collapse_exact``): rows sharing a hash are
    first collapsed to one representative (min id) via the salted exact
    dedup — a 30%-duplicated phash at 10^12 rows would otherwise emit
    O(n²) pairs inside one banded group.  After collapsing, group sizes
    are bounded by the number of DISTINCT hashes per band value, and a
    pair (rep_a, rep_b) stands for "every row with hash_a ≈ every row
    with hash_b".

    Pigeonhole LSH: split the 64-bit hash into (d+1) bands — two hashes
    within Hamming distance d must agree on at least one full band — emit
    (band_id, band_val, id, hash) rows, group by banded key, verify exact
    Hamming distance inside each group with a vectorized popcount, and
    de-duplicate pairs found by multiple bands with a final exact dedup.
    """
    if collapse_exact:
        ds = exact_dedup(
            ds.select_columns([hash_col, id_col]),
            [hash_col],
            order_cols=[id_col],
            num_salts=16,
            num_buckets=num_buckets,
        )
    num_bands = max_distance + 1

    def explode(batch: pa.Table) -> pa.Table:
        h = batch.column(hash_col).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        bands = _bands(h, num_bands)
        n = len(h)
        band_id = np.repeat(np.arange(num_bands, dtype=np.int64)[None, :], n, axis=0)
        return pa.table(
            {
                "band_id": pa.array(band_id.reshape(-1)),
                "band_val": pa.array(bands.reshape(-1)),
                "id": pa.array(np.repeat(ids, num_bands)),
                "h": pa.array(np.repeat(h, num_bands)),
            }
        )

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = bucket_of_multi(
            [
                batch.column("band_id").to_numpy(zero_copy_only=False),
                batch.column("band_val").to_numpy(zero_copy_only=False),
            ],
            num_buckets,
            seed=17,
        )
        return batch.append_column(_BUCKET, pa.array(b))

    def verify(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        out_a, out_b, out_d = [], [], []
        for (_, _), g in df.groupby(["band_id", "band_val"], sort=False):
            if len(g) < 2:
                continue
            ids = g["id"].to_numpy()
            hs = g["h"].to_numpy(dtype=np.int64)
            # all pairs within the banded group (groups are tiny by design)
            ia, ib = np.triu_indices(len(g), k=1)
            d = popcount64(hs[ia] ^ hs[ib])
            ok = d <= max_distance
            if ok.any():
                a, b = ids[ia[ok]], ids[ib[ok]]
                lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
                out_d.append(d[ok])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "dist": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "dist": pa.array(np.concatenate(out_d)),
            }
        )

    pairs = (
        ds.select_columns([hash_col, id_col])
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(_BUCKET)
        .map_groups(verify, batch_format="pyarrow")
    )
    # a pair can match in several bands → dedup on (id_a, id_b)
    return exact_dedup(pairs, ["id_a", "id_b"], order_cols=["dist", "id_a", "id_b"])


def hamming_dedup(
    ds,
    hash_col: str,
    id_col: str,
    *,
    max_distance: int = 3,
    num_buckets: int = 256,
    max_pairs: int = 10_000_000,
):
    """Keep one representative per near-duplicate cluster (min id wins).

    Two levels, both skew-safe: (1) rows with EQUAL hashes collapse to
    the min-id representative inside ``hamming_near_dup_pairs``'s salted
    exact-dedup pre-step; (2) representatives within Hamming ≤ d merge
    via union-find over the verified pair set on the driver — valid
    because pairs are between distinct hash values (bounded), never
    between raw rows.  The driver-side pair pull is guarded by
    ``max_pairs`` (loud error, not OOM): 10M pairs ≈ 240 MB, and a
    near-dup graph denser than that over DISTINCT 64-bit hashes means
    the distance threshold is wrong for the data, not that the dedup
    needs a bigger driver.  Returns (ds_with_one_row_per_cluster, pairs).
    """
    pairs_tbl = hamming_near_dup_pairs(
        ds, hash_col, id_col, max_distance=max_distance, num_buckets=num_buckets
    ).to_pandas()
    if "id_a" not in pairs_tbl.columns:  # empty result loses schema in Ray
        pairs_tbl = pd.DataFrame({"id_a": [], "id_b": [], "dist": []})
    # keep only exact-dedup representatives, then drop union-find non-roots
    ds = exact_dedup(
        ds,
        [hash_col],
        order_cols=[id_col],
        num_salts=16,
        num_buckets=num_buckets,
    )
    return collapse_pairs(ds, pairs_tbl, id_col, max_pairs=max_pairs), pairs_tbl
