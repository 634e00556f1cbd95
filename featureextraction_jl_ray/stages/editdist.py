"""Edit-distance-≤1 similarity join (FastSS deletion-neighborhood
blocking) — the typo/near-variant join for SHORT string keys (titles,
codes, normalized prefixes).

Shape: each string s emits blocking keys {s} ∪ D1(s) (all single-
deletion variants, built VECTORIZED over deletion positions — L slice
passes per batch, no per-row Python); strings sharing a key co-locate in
one groupby exchange; candidate pairs dedup through a second tiny
exchange and verify with the vectorized common-prefix/common-suffix
identity (edit(u,v) ≤ 1 ⇔ cp+cs ≥ len−1 for equal lengths, cp+cs ≥
min(len) for a length-1 gap) — no per-pair Python string scan, no
Levenshtein DP.

The deletion fan-out is rows × (max_len+1), so this is deliberately a
short-key operator: ``max_len`` truncates (prefix-blocking semantics,
stated in the oracle) and guards the blow-up.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from .blobshuffle import _BUCKET, pack_by_bucket, unpack_table

__all__ = ["edit1_pairs"]


def _edit1_mask(sa, sb, max_len: int) -> np.ndarray:
    """Vectorized edit-distance ≤ 1 test for two equal-length object
    arrays of strings (each ≤ max_len chars)."""
    A = np.asarray(sa, dtype=f"U{max_len}").reshape(-1, 1).view(np.uint32)
    B = np.asarray(sb, dtype=f"U{max_len}").reshape(-1, 1).view(np.uint32)
    la = (A != 0).sum(axis=1)
    lb = (B != 0).sum(axis=1)
    n, L = A.shape
    pos = np.arange(L)[None, :]
    # common prefix
    neq = A != B
    cp = np.where(neq.any(axis=1), neq.argmax(axis=1), L)
    # common suffix via length-aligned gathers
    ia = la[:, None] - 1 - pos
    ib = lb[:, None] - 1 - pos
    va = np.take_along_axis(A, np.clip(ia, 0, L - 1), axis=1)
    vb = np.take_along_axis(B, np.clip(ib, 0, L - 1), axis=1)
    eq = (va == vb) & (ia >= 0) & (ib >= 0)
    sneq = ~eq
    cs = np.where(sneq.any(axis=1), sneq.argmax(axis=1), L)
    dl = np.abs(la - lb)
    same = (dl == 0) & (cp + cs >= la - 1)
    gap = (dl == 1) & (cp + cs >= np.minimum(la, lb))
    return same | gap


def edit1_pairs(ds, *, text_col: str, id_col: str, max_len: int = 32,
                max_group: int = 10_000):
    """All id pairs whose (truncated-to-``max_len``) ``text_col`` values
    are within Levenshtein distance 1 (including exact duplicates at
    distance 0).  Returns a Dataset of (id_a, id_b, dist) with
    id_a < id_b."""

    def explode_keys(t: pa.Table) -> pa.Table:
        s = pc.utf8_slice_codeunits(
            pc.cast(t.column(text_col), pa.string()), 0, max_len)
        ids = t.column(id_col)
        texts = s.to_pandas().fillna("")
        parts = [pa.table({"key": pa.Array.from_pandas(texts),
                           "id": ids, "s": pa.Array.from_pandas(texts)})]
        for d in range(max_len):
            has = texts.str.len() > d
            if not has.any():
                break
            sub = texts[has]
            var = sub.str.slice(0, d) + sub.str.slice(d + 1)
            parts.append(pa.table({
                "key": pa.Array.from_pandas(var),
                "id": ids.take(pa.array(np.flatnonzero(has.to_numpy()))),
                "s": pa.Array.from_pandas(sub),
            }))
        return pa.concat_tables(parts)

    def group_pairs(t: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(t)
        outs = []
        for _, g in df.groupby("key", sort=False):
            if len(g) > max_group:
                raise ValueError(
                    f"edit1_pairs: blocking key group of {len(g)} exceeds "
                    f"max_group={max_group} (a degenerate hot key — raise "
                    "max_group or pre-dedup exact duplicates first)")
            if len(g) < 2:
                continue
            sub = g.drop_duplicates("id")
            if len(sub) < 2:
                continue
            ids = sub["id"].to_numpy()
            ss = sub["s"].to_numpy()
            order = np.argsort(ids, kind="mergesort")
            ids, ss = ids[order], ss[order]
            iu, ju = np.triu_indices(len(ids), k=1)
            outs.append(pd.DataFrame({"id_a": ids[iu], "id_b": ids[ju],
                                      "s_a": ss[iu], "s_b": ss[ju]}))
        if not outs:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "s_a": pa.array([], pa.string()),
                             "s_b": pa.array([], pa.string())})
        return pandas_to_arrow(pd.concat(outs, ignore_index=True))

    def verify(t: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(t)
        # one representative per (id_a, id_b): pairs repeat across keys
        df = df.drop_duplicates(["id_a", "id_b"], ignore_index=True)
        if not len(df):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        ok = _edit1_mask(df["s_a"].to_numpy(), df["s_b"].to_numpy(), max_len)
        df = df[ok]
        dist = (df["s_a"] != df["s_b"]).astype(np.int64)
        out = df[["id_a", "id_b"]].copy()
        out["dist"] = dist
        return pandas_to_arrow(out.reset_index(drop=True))

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from ..functions.hashing import bucket_of_multi

        b = bucket_of_multi(
            [t.column("id_a").to_numpy(zero_copy_only=False),
             t.column("id_b").to_numpy(zero_copy_only=False)], 32, seed=31)
        return pack_by_bucket(t, b)

    def verify_bucket(t: pa.Table) -> pa.Table:
        return verify(unpack_table(t))

    def add_key_bucket(t: pa.Table) -> pa.Table:
        from ..functions.hashing import bucket_of

        b = bucket_of(t.column("key").to_numpy(zero_copy_only=False), 32,
                      seed=17)
        return pack_by_bucket(t, b)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        return group_pairs(unpack_table(t))

    keys = ds.map_batches(explode_keys, batch_format="pyarrow",
                          zero_copy_batch=True)
    # co-locate by KEY-HASH BUCKET (one map_groups per bucket — the inner
    # pandas groupby walks the keys; a map_groups per distinct key would
    # pay task overhead × |keys|)
    keys = keys.map_batches(add_key_bucket, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    cands = keys.groupby(_BUCKET).map_groups(bucket_pairs,
                                                   batch_format="pyarrow")
    # global pair dedup THEN verify, co-located by PAIR-HASH BUCKET (one
    # map_groups per bucket, not per pair — a pair's duplicates all hash
    # to the same bucket, so drop_duplicates inside the bucket is global)
    bucketed = cands.map_batches(add_pair_bucket, batch_format="pyarrow",
                                 zero_copy_batch=True, batch_size=None)
    return bucketed.groupby(_BUCKET).map_groups(verify_bucket,
                                                      batch_format="pyarrow")


def jaro_winkler_sim(sa, sb, *, prefix_weight: float = 0.1,
                     boost_threshold: float = 0.7,
                     max_prefix: int = 4) -> np.ndarray:
    """Jaro-Winkler similarity for PAIRED string arrays, vectorized
    ACROSS pairs: fixed-width UTF-32 char matrices and O(L²) boolean
    passes (L = longest string in the batch) replace the per-pair
    Python scan — each pass is an O(n) numpy op over every pair at
    once, so cost is L²·n/SIMD, not n·L² interpreted steps.

    Matches DuckDB's ``jaro_winkler_similarity`` exactly (verified
    empirically, tests/test_metrics.py): greedy smallest-j window
    matching with window d = max(la,lb)//2 − 1 clamped at 0,
    transpositions t = ⌊mismatched matched-positions / 2⌋, either
    side empty → 0.0, and the Winkler prefix boost (common prefix
    capped at 4, scale 0.1) applied only when jaro > 0.7."""
    sa = np.asarray(sa, dtype=object)
    sb = np.asarray(sb, dtype=object)
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    L = 1
    for s in sa:
        L = max(L, len(s))
    for s in sb:
        L = max(L, len(s))
    A = np.asarray(sa, dtype=f"U{L}").reshape(-1, 1).view(np.uint32)
    B = np.asarray(sb, dtype=f"U{L}").reshape(-1, 1).view(np.uint32)
    la = (A != 0).sum(axis=1)
    lb = (B != 0).sum(axis=1)
    d = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    matchA = np.zeros((n, L), dtype=bool)
    matchB = np.zeros((n, L), dtype=bool)
    for i in range(L):
        ai = A[:, i]
        live = ai != 0
        if not live.any():
            break
        found = np.zeros(n, dtype=bool)
        lo, hi = i - d, np.minimum(i + d + 1, lb)
        for j in range(L):
            if (j >= hi).all():
                break
            cand = (live & ~found & ~matchB[:, j] & (B[:, j] == ai)
                    & (j >= lo) & (j < hi))
            if cand.any():
                matchB[:, j] |= cand
                matchA[:, i] |= cand
                found |= cand
    m = matchA.sum(axis=1).astype(np.float64)
    # transpositions: matched chars in A order vs in B order
    packedA = np.zeros((n, L), dtype=np.uint32)
    packedB = np.zeros((n, L), dtype=np.uint32)
    posA = matchA.cumsum(axis=1) - 1
    rows, cols = np.nonzero(matchA)
    packedA[rows, posA[rows, cols]] = A[rows, cols]
    posB = matchB.cumsum(axis=1) - 1
    rows, cols = np.nonzero(matchB)
    packedB[rows, posB[rows, cols]] = B[rows, cols]
    t = (((packedA != packedB) & (packedA != 0)).sum(axis=1)
         // 2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - t) / m) / 3.0
    jaro = np.where(m > 0, jaro, 0.0)
    # Winkler prefix boost
    pfx = np.ones(n, dtype=np.int64) * 0
    alive = np.ones(n, dtype=bool)
    for i in range(min(max_prefix, L)):
        alive &= (A[:, i] == B[:, i]) & (A[:, i] != 0)
        pfx += alive
    out = np.where(jaro > boost_threshold,
                   jaro + pfx * prefix_weight * (1.0 - jaro), jaro)
    return np.where((la == 0) | (lb == 0), 0.0, out)


def with_pair_similarity(ds, left_col: str, right_col: str, *,
                         out_col: str = "jw", metric: str = "jaro_winkler"):
    """Score ALREADY-PAIRED string columns per row (the verify stage
    after any blocking join — edit1/minhash/phash banding produce the
    candidate pairs; this stage prices them).  Stateless vectorized
    map_batches; no exchange."""
    if metric != "jaro_winkler":
        raise ValueError(f"unknown metric {metric!r}")

    def fn(batch: pa.Table) -> pa.Table:
        a = batch.column(left_col).to_pandas().fillna("").to_numpy(dtype=object)
        b = batch.column(right_col).to_pandas().fillna("").to_numpy(dtype=object)
        return batch.append_column(out_col, pa.array(jaro_winkler_sim(a, b)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


__all__ += ["jaro_winkler_sim", "with_pair_similarity"]


# letter → soundex code; 0 = vowel/Y separator, 7 = H/W (transparent)
_SOUNDEX_CODE = np.zeros(26, dtype=np.int8)
for _letters, _code in (("BFPV", 1), ("CGJKQSXZ", 2), ("DT", 3),
                        ("L", 4), ("MN", 5), ("R", 6), ("HW", 7)):
    for _ch in _letters:
        _SOUNDEX_CODE[ord(_ch) - 65] = _code


def soundex(strings) -> np.ndarray:
    """American Soundex codes for a string array, vectorized ACROSS
    rows (UTF-32 char matrix; every rule is a per-column boolean pass):
    first letter + 3 digits, H/W transparent between same-code
    consonants (Ashcraft → A261), vowels reset the run, zero-padded.
    Non-ASCII-alpha chars are stripped; all-stripped/empty input → "".

    The classic record-linkage BLOCKING key to pair with
    :func:`jaro_winkler_sim` scoring: block on soundex (cheap, high
    recall for phonetic variants), verify with JW."""
    s = np.asarray(strings, dtype=object)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=object)
    L = max(1, max((len(x) for x in s), default=1))
    A = np.asarray(s, dtype=f"U{L}").reshape(-1, 1).view(np.uint32)
    # uppercase and keep only A-Z (everything else → 0 = padding)
    A = np.where((A >= 97) & (A <= 122), A - 32, A)
    A = np.where((A >= 65) & (A <= 90), A, 0)
    # left-compact the alpha chars (stable): "o'brien" → "OBRIEN"
    keepc = A != 0
    pos = keepc.cumsum(axis=1) - 1
    B = np.zeros_like(A)
    rows, cols = np.nonzero(keepc)
    B[rows, pos[rows, cols]] = A[rows, cols]
    A = B
    code = np.where(A != 0, _SOUNDEX_CODE[np.clip(A - 65, 0, 25)], -1)
    # effective previous code: forward-fill over non-transparent (≠7)
    # positions, then shift right by one
    opaque = (A != 0) & (code != 7)
    idx = np.where(opaque, np.arange(L)[None, :], -1)
    last_opaque = np.maximum.accumulate(idx, axis=1)
    prev_idx = np.concatenate(
        [np.full((n, 1), -1, dtype=np.int64), last_opaque[:, :-1]], axis=1)
    r = np.arange(n)[:, None]
    prev_code = np.where(prev_idx >= 0,
                         code[r, np.maximum(prev_idx, 0)], -1)
    keep = (code >= 1) & (code <= 6) & (code != prev_code)
    keep[:, 0] = False                      # first letter is kept as itself
    # first 3 kept digits
    rank = keep.cumsum(axis=1)
    take = keep & (rank <= 3)
    digits = np.full((n, 3), ord("0"), dtype=np.uint32)
    rows, cols = np.nonzero(take)
    digits[rows, rank[rows, cols] - 1] = code[rows, cols] + ord("0")
    first = A[:, 0]
    out4 = np.concatenate([first[:, None], digits], axis=1)
    out = out4.view(f"U4").ravel()
    return np.where(first == 0, "", out).astype(object)


def with_soundex(ds, col: str, *, out_col: str | None = None):
    """Per-row soundex blocking key (stateless vectorized map_batches)."""
    out_col = out_col or f"{col}_soundex"

    def fn(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_pandas().fillna("").to_numpy(dtype=object)
        return batch.append_column(out_col, pa.array(soundex(v),
                                                     type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


__all__ += ["soundex", "with_soundex"]
