"""KMV (bottom-k / theta-class) set sketches — distinct-cardinality
and CORPUS-OVERLAP estimation without a join: "how many of tonight's
crawl urls are already in the corpus?" answered from two k·8-byte
sketches instead of a 100 TB exchange.  The planning sibling of the
exact dedup family: run the sketch first, shuffle only if the overlap
justifies it.

Sketch = the k smallest stable 64-bit hashes of the column's DISTINCT
values.  min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), so per-block
partials merge associatively: one map pass emits ≤ k hashes per block,
an intermediate fan-in stage merges ``fan_in`` partials at a time, and
the driver folds the (bounded) remainder — never row-scale data.

Estimators (Beyer et al. 2007 / Dasgupta et al. theta-sketch form):
  distinct(A)   ≈ (k − 1) / u_k           (u_k = k-th smallest hash / 2⁶⁴)
  jaccard(A,B)  ≈ |min-k(A ∪ B) ∩ A_k ∩ B_k| / k
  intersection  ≈ jaccard · distinct(A ∪ B)
A sketch holding FEWER than k hashes saw the whole set — the estimate
is then exact by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash_array

__all__ = ["kmv_sketch", "kmv_distinct", "kmv_overlap"]

_U64 = float(2**64)


def _bottomk(h: np.ndarray, k: int) -> np.ndarray:
    u = np.unique(h)  # sorted distinct
    return u[:k]


def kmv_sketch(ds, col: str, *, k: int = 4096, seed: int = 0,
               fan_in: int = 64) -> np.ndarray:
    """Fit the bottom-k sketch of a Dataset column (sorted uint64
    array, length ≤ k).  One streaming pass; the exchange carries at
    most k hashes per block partial."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        bk = _bottomk(stable_hash_array(vals, seed=seed), k)
        return pa.table({"h": pa.array([bk.astype(np.uint64).tolist()],
                                       type=pa.list_(pa.uint64()))})

    def merge(batch: pa.Table) -> pa.Table:
        hs = [np.asarray(x, dtype=np.uint64) for x in batch.column("h").to_pylist()]
        bk = _bottomk(np.concatenate(hs) if hs else np.empty(0, np.uint64), k)
        return pa.table({"h": pa.array([bk.tolist()], type=pa.list_(pa.uint64()))})

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.map_batches(merge, batch_format="pyarrow",
                                  batch_size=fan_in)
    final = merge(pa.concat_tables(
        list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))))
    return np.asarray(final.column("h").to_pylist()[0], dtype=np.uint64)


def kmv_distinct(sketch: np.ndarray, *, k: int = 4096) -> float:
    """Distinct-count estimate; EXACT when the sketch is unsaturated
    (it then holds every distinct hash)."""
    if len(sketch) < k:
        return float(len(sketch))
    return (k - 1) / (float(sketch[k - 1]) / _U64)


def kmv_overlap(sk_a: np.ndarray, sk_b: np.ndarray, *,
                k: int = 4096) -> dict:
    """Jaccard / intersection / union estimates from two same-(k, seed)
    sketches.  Union sketch = bottom-k of the concatenation (valid by
    mergeability); jaccard = fraction of the union sketch present in
    BOTH input sketches."""
    union_sk = _bottomk(np.concatenate([sk_a, sk_b]), k)
    union_est = kmv_distinct(union_sk, k=k)
    both = np.isin(union_sk, sk_a) & np.isin(union_sk, sk_b)
    j = float(both.sum()) / len(union_sk) if len(union_sk) else 0.0
    da, db = kmv_distinct(sk_a, k=k), kmv_distinct(sk_b, k=k)
    inter = j * union_est
    return {
        "jaccard": j,
        "union": union_est,
        "intersection": inter,
        "distinct_a": da,
        "distinct_b": db,
        # set differences (|A\B|, |B\A|) — "how much is genuinely new"
        "a_not_b": da - inter,
        "b_not_a": db - inter,
    }
