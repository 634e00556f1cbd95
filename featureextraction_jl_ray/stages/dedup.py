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
import pyarrow.compute as pc

from ..functions.hashing import bucket_of, bucket_of_multi, stable_hash_array
from ..functions.pdconv import arrow_to_pandas_safe, pandas_to_arrow
from .blobshuffle import pack_by_bucket, unpack_table

from .blobshuffle import _BUCKET  # shared "__fx_bucket" — the blob exchange name
_SALT = "__fx_salt"

__all__ = ["exact_dedup", "span_dedup", "substring_dedup",
           "hamming_near_dup_pairs", "hamming_dedup",
           "collapse_pairs", "connected_components", "pairs_to_result"]


def pairs_to_result(pairs, n_pairs: int, *, max_pairs: int,
                    return_pairs: str = "auto",
                    empty_cols=("id_a", "id_b", "dist")):
    """Driver-safe form of a verified near-dup pair set (the second
    element of the (kept, pairs) return of hamming/jaccard/embedding
    dedup).  ``return_pairs``:

    - ``"auto"`` — pandas when ``n_pairs <= max_pairs`` (bounded:
      10M pairs ≈ 240 MB), the Dataset itself above it, mirroring
      ``collapse_pairs``' method switch, so a dense near-dup graph that
      collapsed through the distributed path never materializes on the
      driver (ADVICE r3).
    - ``"pandas"`` — always materialize (explicit caller opt-in).
    - ``"dataset"`` — always the Dataset (zero driver bytes).
    """
    if return_pairs == "dataset":
        return pairs
    if return_pairs == "auto" and n_pairs > max_pairs:
        return pairs
    df = pairs.to_pandas()
    if df.shape[1] == 0:  # empty Dataset loses its schema in Ray
        df = pd.DataFrame({c: [] for c in empty_cols})
    return df


def _star_round(edges, *, large: bool, num_buckets: int):
    """One large-star or small-star round (Kiveris et al., SoCC 2014,
    "Connected Components in MapReduce and Beyond") over an edge Dataset
    (columns u, v) — bucketed groupby exchange, pandas reduce per bucket.

    large-star: group the undirected neighborhood of every node u; attach
    each STRICTLY LARGER neighbor to m = min(N(u) ∪ {u}).
    small-star: orient every edge (max → min), group by the larger end u;
    attach u and every neighbor except the minimum to m = min(N(u)).
    Alternating the two converges the edge set to per-component stars
    (child → min-id root) in O(log² n) rounds.
    """

    def emit(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        if large:
            uu = np.concatenate([u, v])
            vv = np.concatenate([v, u])
        else:
            hi = np.where(u > v, u, v)
            lo = np.where(u > v, v, u)
            uu, vv = hi, lo
        b = bucket_of(uu, num_buckets, seed=19)
        return pack_by_bucket(
            pa.table({"u": pa.array(uu), "v": pa.array(vv)}), b)

    def reduce(tbl: pa.Table) -> pa.Table:
        data = unpack_table(tbl)
        u = data.column("u").to_numpy(zero_copy_only=False)
        v = data.column("v").to_numpy(zero_copy_only=False)
        empty = pa.table({"u": data.column("u").slice(0, 0),
                          "v": data.column("v").slice(0, 0)})
        if not len(u):
            return empty
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        bounds = np.flatnonzero(np.r_[True, u[1:] != u[:-1], True])
        out_u, out_v = [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            uu = u[lo]
            nbrs = np.unique(v[lo:hi])  # sorted → nbrs[0] is the min
            m = nbrs[0] if nbrs[0] < uu else uu
            if large:
                bigger = nbrs[nbrs > uu]
                if len(bigger):
                    out_u.append(bigger)
                    out_v.append(np.full(len(bigger), m, dtype=nbrs.dtype))
            else:
                tgt = nbrs[nbrs != m]
                if uu != m:
                    tgt = np.concatenate([tgt, np.asarray([uu], dtype=nbrs.dtype)])
                if len(tgt):
                    out_u.append(tgt)
                    out_v.append(np.full(len(tgt), m, dtype=nbrs.dtype))
        if not out_u:
            return empty
        # per-group output is already unique per (u,m); cross-group dups
        # are removed by the caller's dedup exchange
        return pa.table({"u": pa.array(np.concatenate(out_u)),
                         "v": pa.array(np.concatenate(out_v))})

    return (edges.map_batches(emit, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)
            .groupby(_BUCKET).map_groups(reduce, batch_format="pyarrow"))


def _edge_checksum(edges) -> tuple[int, int]:
    """(count, multiset checksum) of an edge Dataset — order-insensitive,
    computed distributed (per-batch partial sums, driver gets 2 ints)."""

    def part(batch: pa.Table) -> pa.Table:
        hu = stable_hash_array(batch.column("u").to_numpy(zero_copy_only=False),
                               seed=3)
        hv = stable_hash_array(batch.column("v").to_numpy(zero_copy_only=False),
                               seed=5)
        s = int((hu ^ (hv * np.uint64(0x9E3779B97F4A7C15))).sum(
            dtype=np.uint64))
        return pa.table({"n": pa.array([len(batch)], type=pa.int64()),
                         "s": pa.array([s % (1 << 62)], type=pa.int64())})

    parts = edges.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
    agg = parts.sum(["n", "s"])
    return int(agg["sum(n)"]), int(agg["sum(s)"]) % (1 << 62)


def connected_components(pairs, *, num_buckets: int | None = None,
                         max_rounds: int = 30):
    """Distributed connected components over a near-dup pair Dataset
    (columns id_a, id_b) via alternating large-star / small-star label
    propagation — the 100-TB-safe replacement for a driver union-find.
    Nothing ever leaves the cluster but a (count, checksum) pair per
    round; the exchange carries only (node, label) edges.

    Returns a Dataset with columns (id, root): exactly one row per
    NON-ROOT node, root = min id of its component (so ``id`` is the drop
    set of a min-id-wins collapse).  Works for integer and string ids
    (min = lexicographic for strings, matching the driver union-find).
    """
    edges = pairs.select_columns(["id_a", "id_b"]).rename_columns(["u", "v"])
    if num_buckets is None:
        # size the star-round exchange to the edge set + cluster, not a
        # constant (ADVICE r3: a hardwired 64 repeats the round-1
        # "static buckets = dataset/64 per task" failure on exactly the
        # path built for the largest inputs)
        from .partition import adaptive_num_buckets

        edges = edges.materialize()
        num_buckets = adaptive_num_buckets(edges.count())
    # drop self-loops once up front; dedup inside reduces handles the rest
    prev = None
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True, num_buckets=num_buckets)
        edges = _star_round(edges, large=False, num_buckets=num_buckets)
        # small-star output may carry cross-group duplicate (u, m) rows —
        # dedup before the fixpoint check (also bounds per-round growth)
        edges = exact_dedup(edges, ["u", "v"], order_cols=["u", "v"],
                            num_salts=4, num_buckets=num_buckets).materialize()
        sig = _edge_checksum(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} "
            f"large/small-star rounds (last edge count "
            f"{prev[0] if prev else 'n/a'}, checksum "
            f"{prev[1] if prev else 'n/a'})"
        )
    return edges.rename_columns(["id", "root"])


def collapse_pairs(ds, pairs, id_col: str, *,
                   max_pairs: int = 10_000_000, method: str = "auto",
                   num_buckets: int | None = None):
    """Keep one representative per connected component of a verified
    near-dup pair set (min id wins) — the shared cluster-collapse tail of
    hamming/jaccard/embedding dedup.

    ``pairs`` is a pandas DataFrame or a Ray Dataset (columns id_a, id_b).
    ``method``:

    - ``"driver"`` — union-find on the driver; loud ``max_pairs`` guard.
      The drop list rides the task closure and filters via one np.isin.
    - ``"distributed"`` — large/small-star label propagation
      (``connected_components``) + bloom anti-join; nothing pair-shaped
      touches the driver.  The 100-TB path.
    - ``"auto"`` — driver below ``max_pairs`` (faster at gate scale:
      zero extra exchanges), distributed above it (instead of erroring).
    """
    import ray.data as rd

    if isinstance(pairs, pd.DataFrame):
        n_pairs = len(pairs)
        pairs_ds = None
    else:
        pairs = pairs.materialize()
        n_pairs = pairs.count()
        pairs_ds = pairs

    if method == "auto":
        method = "driver" if n_pairs <= max_pairs else "distributed"

    if method == "distributed":
        from .joins import bloom_anti_join

        if n_pairs == 0:
            return ds
        if pairs_ds is None:
            pairs_ds = rd.from_pandas(pairs[["id_a", "id_b"]])
        if num_buckets is None:
            from .partition import adaptive_num_buckets

            num_buckets = adaptive_num_buckets(n_pairs)
        labels = connected_components(pairs_ds, num_buckets=num_buckets)
        return bloom_anti_join(ds, labels.select_columns(["id"]),
                               on=id_col, right_on="id")

    if n_pairs > max_pairs:
        raise RuntimeError(
            f"collapse_pairs: verified pair set ({n_pairs}) exceeds "
            f"max_pairs={max_pairs} with method='driver'; use "
            f"method='distributed' (or 'auto') or tighten the threshold"
        )
    pairs_pd = pairs if pairs_ds is None else pairs_ds.to_pandas()
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

    # dtype follows the id values (string ids are valid — ADVICE r2):
    # np.isin on object arrays is correct, just slower
    drop_list = sorted(x for x in parent if find(x) != x)
    drop = np.asarray(drop_list) if drop_list else np.array([], dtype=np.int64)

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

    ``num_salts=1`` takes a SINGLE-exchange path (bucket by key, keep-one
    per bucket) — right when a key's duplication factor is small and
    bounded (e.g. banded candidate pairs repeat at most num_bands times),
    where the salt stage would pay a second all-to-all for nothing.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    if num_salts <= 1:
        def add_key_bucket1(batch: pa.Table) -> pa.Table:
            keys = [batch.column(c).to_numpy(zero_copy_only=False)
                    for c in key_cols]
            return pack_by_bucket(
                batch, bucket_of_multi(keys, num_buckets, seed=13))

        def keep(tbl: pa.Table) -> pa.Table:
            df = arrow_to_pandas_safe(unpack_table(tbl))
            # map-side pre-prune inside the bucket is free here: the
            # whole bucket is one frame already
            return pandas_to_arrow(_keep_one(df, key_cols, order_cols, ascending))

        bucketed = ds.map_batches(add_key_bucket1, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)
        return bucketed.groupby(_BUCKET).map_groups(keep, batch_format="pyarrow")

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
        return pack_by_bucket(batch.append_column(_SALT, pa.array(salt)), b)

    def stage1(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        out = _keep_one(df, [*key_cols, _SALT], order_cols, ascending)
        return pandas_to_arrow(out)

    def add_key_bucket(batch: pa.Table) -> pa.Table:
        keys = [batch.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        b = bucket_of_multi(keys, num_buckets, seed=13)
        return pack_by_bucket(batch, b)

    def stage2(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
        out = _keep_one(df, key_cols, order_cols, ascending)
        return pandas_to_arrow(out.drop(columns=[_SALT]))

    salted = ds.map_batches(add_salted_bucket, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
    survivors = salted.groupby(_BUCKET).map_groups(stage1, batch_format="pyarrow")
    rebucketed = survivors.map_batches(
        add_key_bucket, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    return rebucketed.groupby(_BUCKET).map_groups(stage2, batch_format="pyarrow")


def span_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
               span_words: int = 5, out_col: str = "text_dedup",
               num_salts: int = 16, num_buckets: int = 64):
    """Sub-document exact-span deduplication (the granular cousin of
    doc-level ``exact_dedup`` — RefinedWeb / "exact substring dedup"
    family, at non-overlapping word-window granularity): split each
    document into consecutive ``span_words``-word spans (last span may
    be shorter), keep only the globally FIRST occurrence of each
    distinct span text — first = smallest ``(id, span_idx)`` — and
    reassemble every document from its surviving spans in order.
    Documents whose every span occurred earlier elsewhere disappear;
    boilerplate repeated across documents survives exactly once,
    corpus-wide.

    Output: ``(id_col, out_col, n_spans)`` — one row per surviving
    document, ``n_spans`` = its surviving span count.

    Shape at scale: the explode is a fused stateless ``map_batches``
    (vectorized ListArray window build + C ``binary_join``); the winner
    selection reuses :func:`exact_dedup`'s two-stage salted reduce keyed
    on span text (hot boilerplate spans are exactly the skewed-key case
    the salt stage exists for); reassembly is one blob-packed exchange
    co-partitioned on ``id_col``.  Span text rides the dedup exchange —
    the wire cost is ~the corpus bytes, the same as any doc-level
    shuffle of the text column; at 100 TB you would dedup on a 64-bit
    ``stable_hash_array`` of the span instead (8 B/row exchange) and
    semi-join survivors back, trading one more exchange for ~10× fewer
    wire bytes.
    """
    from .partition import bucketed_map_groups
    from .text import _word_spans

    def explode(batch: pa.Table) -> pa.Table:
        span_text, row_of, idx = _word_spans(batch.column(text_col),
                                             span_words)
        ids = batch.column(id_col).take(pa.array(row_of, type=pa.int64()))
        return pa.table({id_col: ids,
                         "span_idx": pa.array(idx, type=pa.int64()),
                         "span_text": span_text})

    spans = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    kept = exact_dedup(spans, "span_text", order_cols=[id_col, "span_idx"],
                       num_salts=num_salts, num_buckets=num_buckets)

    def reassemble(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        df = df.sort_values([id_col, "span_idx"], kind="mergesort")
        g = df.groupby(id_col, sort=False)
        out = g["span_text"].agg(" ".join).rename(out_col).to_frame()
        out["n_spans"] = g.size().astype(np.int64)
        return pandas_to_arrow(out.reset_index())

    return bucketed_map_groups(kept, id_col, reassemble,
                               num_buckets=num_buckets)


def _overlapping_gram_occurrences(texts, n: int, seed: int = 0):
    """Vectorized stride-1 OVERLAPPING word ``n``-grams over an Arrow
    string column, returned as 64-bit occurrence hashes: ``(gh, row_of,
    pos)`` where ``gh[i]`` is the stable hash of the space-joined gram
    starting at word ``pos[i]`` of batch row ``row_of[i]``.

    Tokenization = :func:`..stages.text.split_ws_tokens` with empty
    tokens filtered — byte-for-byte the complement of the SQL oracles'
    ``regexp_extract_all(t, '\\S+')``, and NOT lowercased (positions
    must index the tokens the reassembly step re-derives from the raw
    text).  Overlapping windows cannot tile a ``ListArray`` (offsets
    must be monotonic), so the join is the :func:`_word_ngrams`-style
    object-array concat; the strings never leave the batch — only the
    24 B ``(hash, doc, pos)`` triple does."""
    from .text import split_ws_tokens

    toks = split_ws_tokens(pc.fill_null(texts, ""))
    lens_raw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat_all = pc.list_flatten(toks)
    if isinstance(flat_all, pa.ChunkedArray):
        flat_all = flat_all.combine_chunks()
    keep = pc.not_equal(flat_all, "")
    mask = keep.to_numpy(zero_copy_only=False)
    flat = flat_all.filter(keep).to_numpy(zero_copy_only=False)
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64))
    n_rows = len(lens_raw)
    if n_rows == 0:
        return empty
    row_of_tok = np.repeat(np.arange(n_rows), lens_raw)
    lens = np.bincount(row_of_tok, weights=mask,
                       minlength=n_rows).astype(np.int64)
    k = np.maximum(lens - (n - 1), 0)
    tot = int(k.sum())
    if tot == 0:
        return empty
    starts = np.cumsum(lens) - lens
    pos = np.arange(tot) - np.repeat(np.cumsum(k) - k, k)
    base = np.repeat(starts, k) + pos
    sh = flat[base].astype(object)
    for j in range(1, n):
        sh = sh + " "
        sh = sh + flat[base + j].astype(object)
    gh = stable_hash_array(sh, seed=seed)
    row_of = np.repeat(np.arange(n_rows), k)
    return gh, row_of, pos


def substring_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                    gram_words: int = 8, out_col: str = "text_dedup",
                    keep_cols: tuple = (), num_buckets: int = 64,
                    seed: int = 977):
    """EXACT-SUBSTRING deduplication at arbitrary word offsets (the Lee
    et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" ExactSubstr family — the operator :func:`span_dedup` only
    approximates at aligned non-overlapping window granularity).

    Semantics: any word sequence of length ≥ ``gram_words`` that occurs
    more than once corpus-wide (across documents OR twice within one
    document) survives only at its globally FIRST occurrence — first =
    smallest ``(doc_id, pos)``.  Every later occurrence has its covered
    token range removed.  Formally: occurrence ``(d, p)`` of a stride-1
    ``gram_words``-gram is a *loser* iff it is not the global
    ``(doc_id, pos)``-minimum for that gram; tokens of ``d`` covered by
    any loser window ``[p, p + gram_words)`` are dropped, and the
    document is reassembled from the surviving tokens in order.  This
    n-gram cover removes exactly the repeated span: a repeated sequence
    of length m ≥ n contributes m − n + 1 overlapping duplicated grams
    whose window union is precisely the sequence's token range.

    Output: one row per input document —
    ``(id_col, *keep_cols, out_col, n_tokens, n_removed)``; fully-
    duplicated documents keep their row with ``out_col = ""``.
    ``keep_cols`` ride the reassembly exchange (cheap per-doc metadata
    like ``source`` / ``lang``) so downstream per-group reports never
    need a second all-to-all join back to the input.

    Shape at scale (why this is not the suffix-array build): the
    explode ships ``(uint64 gram hash, doc_id, pos)`` triples ONLY —
    ~24 B per corpus token regardless of document size; the loser
    selection is one hash-bucketed exchange (a boilerplate gram hot
    enough to matter produces output ~ its own occurrence list, so
    salting cannot shrink it — the bucket map is a single vectorized
    sort + boundary diff); reassembly is one tagged-union blob exchange
    co-partitioned on ``id_col`` (document text crosses the wire once,
    removal rows are 16 B).  Gram-hash collisions (~n_grams²/2⁶⁴) can
    over-remove one window; at gate scale (10⁵ grams) that probability
    is ~10⁻⁹ and the hash is seeded + deterministic."""
    from .partition import bucketed_map_groups

    def explode(batch: pa.Table) -> pa.Table:
        gh, row_of, pos = _overlapping_gram_occurrences(
            batch.column(text_col), gram_words, seed=seed)
        ids = batch.column(id_col).take(pa.array(row_of, type=pa.int64()))
        return pa.table({"gh": pa.array(gh.view(np.int64)),
                         id_col: ids,
                         "pos": pa.array(pos, type=pa.int64())})

    grams = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)

    def find_losers(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        if not len(df):
            id_type = tbl.schema.field(id_col).type
            return pa.table({id_col: pa.array([], type=id_type),
                             "pos": pa.array([], type=pa.int64())})
        df = df.sort_values(["gh", id_col, "pos"], kind="mergesort",
                            ignore_index=True)
        gh = df["gh"].to_numpy()
        first = np.empty(len(gh), dtype=bool)
        first[0] = True
        first[1:] = gh[1:] != gh[:-1]
        out = df.loc[~first, [id_col, "pos"]]
        return pandas_to_arrow(out.reset_index(drop=True))

    removals = bucketed_map_groups(grams, "gh", find_losers,
                                   num_buckets=num_buckets, seed=seed)

    # tagged union: document rows carry pos = -1 + the text (+ keep_cols);
    # removal rows carry the loser window start.  One co-partitioned
    # exchange on id.
    keep_cols = tuple(keep_cols)
    if keep_cols:
        sch = ds.schema()   # only fetched when passthrough is requested
        all_types = dict(zip(sch.names, sch.types))
        keep_types = {c: all_types[c] for c in keep_cols}
    else:
        keep_types = {}

    def tag_docs(t: pa.Table) -> pa.Table:
        cols = {id_col: t.column(id_col),
                "pos": pa.array(np.full(len(t), -1, np.int64)),
                text_col: t.column(text_col)}
        for c in keep_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    def tag_removals(t: pa.Table) -> pa.Table:
        cols = {id_col: t.column(id_col),
                "pos": t.column("pos"),
                text_col: pa.nulls(len(t), type=pa.string())}
        for c in keep_cols:
            cols[c] = pa.nulls(len(t), type=keep_types[c])
        return pa.table(cols)

    docs_tagged = ds.select_columns(
        [id_col, text_col, *keep_cols]).map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    rem_tagged = removals.map_batches(
        tag_removals, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    unioned = docs_tagged.union(rem_tagged)

    from .text import split_ws_tokens

    def reassemble(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(tbl)
        is_doc = df["pos"].to_numpy() == -1
        docs = df.loc[is_doc].reset_index(drop=True)
        rem = df.loc[~is_doc]
        texts = pa.array(docs[text_col].to_numpy(), type=pa.string())
        toks = split_ws_tokens(pc.fill_null(texts, ""))
        lens_raw = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat_all = pc.list_flatten(toks)
        if isinstance(flat_all, pa.ChunkedArray):
            flat_all = flat_all.combine_chunks()
        keep = pc.not_equal(flat_all, "")
        mask = keep.to_numpy(zero_copy_only=False)
        flat = flat_all.filter(keep)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n_docs = len(docs)
        row_of_tok = np.repeat(np.arange(n_docs), lens_raw)
        lens = np.bincount(row_of_tok, weights=mask,
                           minlength=n_docs).astype(np.int64)
        n_tok = int(lens.sum())
        tok_start = np.cumsum(lens) - lens
        docrow = pd.Series(np.arange(n_docs),
                           index=docs[id_col]).loc[rem[id_col]].to_numpy()
        gstart = (tok_start[docrow.astype(np.int64)]
                  + rem["pos"].to_numpy().astype(np.int64))
        diff = np.zeros(n_tok + 1, dtype=np.int64)
        np.add.at(diff, gstart, 1)
        np.add.at(diff, gstart + gram_words, -1)
        covered = np.cumsum(diff[:-1]) > 0
        cov_count = np.bincount(row_of_tok[mask.astype(bool)] if len(mask)
                                else np.empty(0, np.int64),
                                weights=covered,
                                minlength=n_docs).astype(np.int64)
        kept_flat = flat.filter(pa.array(~covered))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        kept_counts = lens - cov_count
        offsets = np.append(0, np.cumsum(kept_counts)).astype(np.int32)
        lists = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                         kept_flat)
        text_dedup = pc.binary_join(lists, " ")
        cols = {id_col: pa.Array.from_pandas(docs[id_col])}
        for c in keep_cols:
            cols[c] = pa.Array.from_pandas(docs[c]).cast(keep_types[c])
        cols[out_col] = text_dedup
        cols["n_tokens"] = pa.array(lens)
        cols["n_removed"] = pa.array(cov_count)
        return pa.table(cols)

    return bucketed_map_groups(unioned, id_col, reassemble,
                               num_buckets=num_buckets)


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
        return pack_by_bucket(batch, b)

    def verify(tbl: pa.Table) -> pa.Table:
        df = arrow_to_pandas_safe(unpack_table(tbl))
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
        .map_batches(add_bucket, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=None)
        .groupby(_BUCKET)
        .map_groups(verify, batch_format="pyarrow")
    )
    # a pair can match in several bands → dedup on (id_a, id_b)
    return exact_dedup(pairs, ["id_a", "id_b"],
                       order_cols=["dist", "id_a", "id_b"],
                       # a pair repeats at most num_bands times — one
                       # exchange suffices, the salt stage would be a
                       # second all-to-all for nothing
                       num_salts=1)


def hamming_dedup(
    ds,
    hash_col: str,
    id_col: str,
    *,
    max_distance: int = 3,
    num_buckets: int = 256,
    max_pairs: int = 10_000_000,
    collapse_method: str = "auto",
    return_pairs: str = "auto",
):
    """Keep one representative per near-duplicate cluster (min id wins).

    Two levels, both skew-safe: (1) rows with EQUAL hashes collapse to
    the min-id representative inside ``hamming_near_dup_pairs``'s salted
    exact-dedup pre-step; (2) representatives within Hamming ≤ d merge
    via the shared ``collapse_pairs`` tail — union-find on the driver
    below ``max_pairs`` (10M pairs ≈ 240 MB), distributed
    large/small-star label propagation above it (``collapse_method``
    selects; "auto" switches on pair count), so a dense near-dup graph
    degrades to extra exchanges, never to a driver OOM.  Valid because
    pairs are between distinct hash values, never between raw rows.
    Returns (ds_with_one_row_per_cluster, pairs) where pairs is a pandas
    DataFrame only when bounded (``return_pairs`` — see
    ``pairs_to_result``), else the pair Dataset.
    """
    pairs = hamming_near_dup_pairs(
        ds, hash_col, id_col, max_distance=max_distance, num_buckets=num_buckets
    ).materialize()
    # keep only exact-dedup representatives, then drop cluster non-roots
    ds = exact_dedup(
        ds,
        [hash_col],
        order_cols=[id_col],
        num_salts=16,
        num_buckets=num_buckets,
    )
    kept = collapse_pairs(ds, pairs, id_col, max_pairs=max_pairs,
                          method=collapse_method)
    return kept, pairs_to_result(pairs, pairs.count(), max_pairs=max_pairs,
                                 return_pairs=return_pairs)
