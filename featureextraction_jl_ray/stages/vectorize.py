"""Text vectorization — hashed bag-of-words (the "hashing trick") and
TF-IDF over it, producing the fixed-width ``list<float32>`` vectors the
engine's similarity / PCA / kNN stages consume.

Why hashing, not a vocabulary: a 100-TB corpus's vocabulary is
unbounded and building it is an extra all-to-all; hashing token →
bucket (mod ``dim``) needs no fitted state for plain TF, keeps every
task stateless, and bounds the feature width by construction (standard
feature-hashing construction, e.g. Weinberger et al. 2009 [P]).

IDF is the one fitted quantity: document frequency per bucket is a
mergeable ``dim``-wide integer partial — one streaming ``map_batches``
pass + batch-size fan-in merge, same shape as the moments fit; the
fitted idf vector (``dim`` floats) rides the transform's task closure.

Per-batch work is vectorized end-to-end: pandas C regex ``findall`` →
``explode`` to a flat token array → ONE ``stable_hash_array`` call →
``np.add.at`` scatter into the (n, dim) matrix.  No Python loop over
rows or tokens.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import stable_hash_array
from ..functions.veccol import numpy_to_fixed_list_column

__all__ = ["HashingVectorizer", "hashed_bow", "fit_idf", "tfidf_vectorize"]

_TOKEN = r"[a-zà-ÿ]+|\d+"  # lowercased word pieces + numbers


def _doc_token_buckets(texts: pd.Series, pattern, dim: int, seed: int):
    """(doc_idx int64[], bucket int64[]) for every token occurrence."""
    toks = texts.str.lower().str.findall(pattern)
    flat = toks.explode()
    flat = flat[flat.notna()]
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    doc_idx = flat.index.to_numpy(dtype=np.int64)
    h = stable_hash_array(flat.to_numpy(dtype=object), seed=seed)
    return doc_idx, (h % np.uint64(dim)).astype(np.int64)


class HashingVectorizer:
    """Stage: text column → hashed term-frequency ``list<float32>``.

    ``idf=None`` gives plain TF; pass the vector from :func:`fit_idf`
    for TF-IDF.  ``norm='l2'`` unit-normalizes non-empty rows (cosine
    kNN then reduces to a dot product); ``norm=None`` keeps raw counts.
    """

    def __init__(self, text_col: str = "text", *, dim: int = 256,
                 out_col: str = "tfv", norm: str | None = "l2",
                 idf: np.ndarray | None = None, seed: int = 7,
                 token_pattern: str = _TOKEN, drop_text: bool = False):
        if norm not in (None, "l2"):
            raise ValueError("norm must be None or 'l2'")
        self._text_col, self._dim, self._out = text_col, int(dim), out_col
        self._norm, self._seed, self._drop = norm, seed, drop_text
        self._pat = re.compile(token_pattern)
        if idf is not None and len(idf) != dim:
            raise ValueError(f"idf has {len(idf)} entries, dim is {dim}")
        self._idf = None if idf is None else np.asarray(idf, dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        texts = batch.column(self._text_col).to_pandas().reset_index(drop=True)
        doc_idx, buckets = _doc_token_buckets(texts, self._pat, self._dim, self._seed)
        M = np.zeros((n, self._dim), dtype=np.float64)
        np.add.at(M, (doc_idx, buckets), 1.0)
        if self._idf is not None:
            M *= self._idf
        if self._norm == "l2":
            nrm = np.linalg.norm(M, axis=1, keepdims=True)
            np.divide(M, nrm, out=M, where=nrm > 0)
        out = batch.append_column(
            self._out, numpy_to_fixed_list_column(M.astype(np.float32), pa.float32())
        )
        return out.drop_columns([self._text_col]) if self._drop else out


def hashed_bow(ds, text_col: str = "text", *, dim: int = 256,
               out_col: str = "tfv", norm: str | None = "l2",
               idf: np.ndarray | None = None, seed: int = 7,
               drop_text: bool = False, batch_size: int | None = 1024):
    """ds → + hashed (TF or TF-IDF) vector column; stateless tasks."""
    stage = HashingVectorizer(text_col, dim=dim, out_col=out_col, norm=norm,
                              idf=idf, seed=seed, drop_text=drop_text)
    return ds.map_batches(lambda b: stage(b), batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def fit_idf(ds, text_col: str = "text", *, dim: int = 256, seed: int = 7,
            token_pattern: str = _TOKEN, fan_in: int = 64,
            batch_size: int | None = None) -> np.ndarray:
    """Smoothed idf vector: ln((1 + N)/(1 + df)) + 1 per hash bucket
    (the standard smooth-idf convention), from one streaming pass of
    mergeable (df[dim], n_docs) partials."""
    pat = re.compile(token_pattern)

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().reset_index(drop=True)
        doc_idx, buckets = _doc_token_buckets(texts, pat, dim, seed)
        # df counts DOCUMENTS containing the bucket, not occurrences
        uniq = np.unique(doc_idx * np.int64(dim) + buckets)
        df = np.bincount((uniq % dim).astype(np.int64), minlength=dim)
        return pa.table(
            {
                "df": pa.array([df.astype(np.int64).tolist()],
                               type=pa.list_(pa.int64())),
                "n_docs": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        dfs = np.asarray(batch.column("df").to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "df": pa.array([dfs.sum(axis=0).tolist()], type=pa.list_(pa.int64())),
                "n_docs": pa.array(
                    [int(sum(batch.column("n_docs").to_pylist()))], type=pa.int64()
                ),
            }
        )

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    merged = partials.map_batches(merge, batch_format="pyarrow", batch_size=fan_in)
    final = merge(
        pa.concat_tables(
            list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
        )
    )
    df = np.asarray(final.column("df").to_pylist()[0], dtype=np.float64)
    n = float(final.column("n_docs").to_pylist()[0])
    return np.log((1.0 + n) / (1.0 + df)) + 1.0


def tfidf_vectorize(ds, text_col: str = "text", *, dim: int = 256,
                    out_col: str = "tfv", seed: int = 7,
                    drop_text: bool = False, batch_size: int | None = 1024):
    """fit_idf + hashed_bow in one call (fit pass + transform pass)."""
    idf = fit_idf(ds, text_col, dim=dim, seed=seed)
    return hashed_bow(ds, text_col, dim=dim, out_col=out_col, norm="l2",
                      idf=idf, seed=seed, drop_text=drop_text,
                      batch_size=batch_size)


def _query_term_counts(texts: pd.Series, terms: list[str]):
    """(doc_len int64[n], tf int64[n, q]) with '\\S+' tokenization —
    the SQL-mirrorable convention (regexp_extract_all(lower(t), '\\S+')).
    One C findall + explode, then one bincount pass per query term."""
    toks = texts.str.lower().str.findall(r"\S+")
    n = len(texts)
    lens = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    flat = toks.explode()
    flat = flat[flat.notna()]
    if len(flat):
        doc_idx = flat.index.to_numpy(dtype=np.int64)
        arr = flat.to_numpy(dtype=object)
        for j, t in enumerate(terms):
            m = arr == t
            if m.any():
                tf[:, j] = np.bincount(doc_idx[m], minlength=n)
    return lens, tf


def fit_bm25_stats(ds, terms, *, text_col: str = "text", fan_in: int = 64):
    """Corpus statistics BM25 needs, in one streaming pass: total doc
    count, total token count (→ average doc length) and per-QUERY-TERM
    document frequency.  The partial is one (1 + 1 + q)-int row per
    block, coalesced with the moments fan-in pattern — only the handful
    of query terms is counted, never a vocabulary."""
    terms = [t.lower() for t in terms]

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().reset_index(drop=True)
        lens, tf = _query_term_counts(texts, terms)
        return pa.table({
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "len": pa.array([int(lens.sum())], type=pa.int64()),
            "df": pa.array([(tf > 0).sum(axis=0).astype(np.int64).tolist()],
                           type=pa.list_(pa.int64())),
        })

    def merge(batch: pa.Table) -> pa.Table:
        dfs = np.asarray(batch.column("df").to_pylist(), dtype=np.int64)
        return pa.table({
            "n": pa.array([int(sum(batch.column("n").to_pylist()))], type=pa.int64()),
            "len": pa.array([int(sum(batch.column("len").to_pylist()))], type=pa.int64()),
            "df": pa.array([dfs.sum(axis=0).tolist()], type=pa.list_(pa.int64())),
        })

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    merged = partials.map_batches(merge, batch_format="pyarrow", batch_size=fan_in)
    rows = list(merged.iter_batches(batch_size=None, batch_format="pyarrow"))
    if not rows:
        # fully-empty corpus: Ray elides every block
        return 0, 0, np.zeros(len(terms), dtype=np.float64)
    final = merge(pa.concat_tables(rows))
    n = int(final.column("n").to_pylist()[0])
    total_len = int(final.column("len").to_pylist()[0])
    df = np.asarray(final.column("df").to_pylist()[0], dtype=np.float64)
    return n, total_len, df


def bm25_score(ds, terms, *, text_col: str = "text", id_col: str = "doc_id",
               k1: float = 1.2, b: float = 0.75, fan_in: int = 64):
    """BM25 relevance of every document to a bag-of-words query
    (Robertson–Spärck Jones; the Lucene ``ln(1 + (N−df+0.5)/(df+0.5))``
    idf variant, so scores stay positive at df > N/2).

    Two streaming passes: :func:`fit_bm25_stats` (tiny mergeable
    partials), then a stateless scoring ``map_batches`` that keeps only
    docs matching ≥1 term — the corpus text never shuffles and the
    output is bounded by the match set.  Returns a Dataset
    ``(id_col, score)``; compose with ``sort().limit(k)`` or the kNN
    top-k merge for retrieval."""
    terms = [t.lower() for t in terms]
    n, total_len, df = fit_bm25_stats(ds, terms, text_col=text_col, fan_in=fan_in)
    avglen = total_len / n if n else 1.0
    idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().reset_index(drop=True)
        lens, tf = _query_term_counts(texts, terms)
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * lens[:, None] / avglen)
        s = (idf[None, :] * tff * (k1 + 1.0) / denom).sum(axis=1)
        keep = tf.sum(axis=1) > 0
        ids = batch.column(id_col).to_pandas().reset_index(drop=True)
        return pa.table({
            id_col: pa.array(ids[keep].to_numpy()),
            "score": pa.array(s[keep], type=pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


__all__.append("bm25_score")
__all__.append("fit_bm25_stats")


def term_df_spectrum(ds, text_col: str = "text", *, num_buckets: int = 64):
    """Document-frequency SPECTRUM of the corpus vocabulary: for each
    df value, how many distinct terms appear in exactly df documents
    (the Zipf/hapax profile corpus QA reads before committing a
    tokenizer or dedup threshold — e.g. hapax count = the df=1 row).

    Distributed shape (two level-sums, no token stream ever shuffles):
    every document lives in exactly ONE block, so a block-local
    ``(term, distinct-doc count)`` partial — pandas C explode +
    drop_duplicates + value_counts — sums EXACTLY to the corpus df.
    The exchange ships one (term, count) row per term per block
    (vocab-bounded, not token-bounded); a bucketed sum by term yields
    df, and a second, tiny sum by df (keys = distinct df values) yields
    the spectrum.  Tokenization is the engine's SQL-mirrorable
    ``\\S+``-on-lower convention (`_query_term_counts`).
    """
    from .groupagg import grouped_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas().reset_index(drop=True)
        flat = texts.str.lower().str.findall(r"\S+").explode().dropna()
        if not len(flat):
            return pa.table({"term": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        per_doc = pd.DataFrame({
            "d": flat.index.to_numpy(dtype=np.int64),
            "term": flat.to_numpy(dtype=object),
        }).drop_duplicates()
        vc = per_doc["term"].value_counts()
        return pa.table({
            "term": pa.array(vc.index.to_numpy(dtype=object), type=pa.string()),
            "c": pa.array(vc.to_numpy(dtype=np.int64)),
        })

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    df_tbl = grouped_aggregate(partials, "term", {"df": ("c", "sum")},
                               num_buckets=num_buckets)
    return grouped_aggregate(df_tbl, "df", {"n_terms": ("term", "count")},
                             num_buckets=8)


__all__.append("term_df_spectrum")


def rrf_fuse(channels, *, id_col: str = "doc_id", score_col: str = "score",
             k: int = 50, k0: int = 60, out_col: str = "rrf"):
    """Reciprocal-rank fusion of retrieval channels (Cormack et al.
    2009): ``rrf(d) = Σ_c 1/(k0 + rank_c(d))`` over the channels where
    the doc appears in the top-``k``.

    Each channel is a Dataset of ``(id_col, score_col)`` rows — e.g.
    :func:`bm25_score` and a cosine-similarity pass — cut to its top-k
    by (score desc, id asc).  The per-channel SCORING stays distributed;
    the rank lists themselves are model-sized (k ≤ ~1000 per channel),
    so the cut is a Dataset sort+limit and the fuse is driver-side over
    ≤ len(channels)·k rows — never the corpus.  For cross-engine
    reproducible ranks, round channel scores to a fixed grid upstream
    (ties then break on the id).  Terms add in channel order; ranks are
    1-based.  Returns a pandas DataFrame ``(id_col, out_col)``.
    """
    ranked = []
    for i, ch in enumerate(channels):
        top = (ch.sort([score_col, id_col], descending=[True, False])
               .limit(k).to_pandas())
        top[f"_r{i}"] = np.arange(1, len(top) + 1, dtype=np.int64)
        ranked.append(top[[id_col, f"_r{i}"]])
    merged = ranked[0]
    for nxt in ranked[1:]:
        merged = merged.merge(nxt, on=id_col, how="outer")
    rrf = np.zeros(len(merged), dtype=np.float64)
    for i in range(len(ranked)):
        r = merged[f"_r{i}"].to_numpy(dtype=np.float64)
        rrf = rrf + np.where(np.isnan(r), 0.0, 1.0 / (float(k0) + r))
    return pd.DataFrame({id_col: merged[id_col],
                         out_col: np.round(rrf, 6)})


__all__.append("rrf_fuse")


def pmi_collocations(ds, text_col: str = "text", *, min_count: int = 5,
                     top_k: int = 20, num_buckets: int = 16,
                     max_vocab: int = 5_000_000, ndigits: int = 6):
    """Top-k collocations by pointwise mutual information over adjacent
    token bigrams — the corpus-level phrase detector ("new york",
    "machine learning") feeding tokenizer merges and phrase features:

        pmi(a, b) = ln( N · n_ab / (n_a · n_b) )

    with the `\\S+` lowercase tokenization every SQL-mirrored text op
    here uses.  Exchange plan: per-block bigram/unigram counts combine
    map-side (grouped_aggregate partials), `min_count` prunes the
    bigram table DISTRIBUTED before anything is pulled, unigram counts
    broadcast under a loud ``max_vocab`` guard, and the pruned scored
    table sorts on (rounded pmi, w1, w2) so the top-k selection is
    deterministic under float ulps (both sides order on the same grid).
    Returns a pandas DataFrame (w1, w2, n_ab, pmi) of ≤ top_k rows.
    """
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def bigrams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        toks = texts.str.lower().str.findall(r"\S+")
        w1, w2 = [], []
        for t in toks:
            if t and len(t) > 1:
                w1.extend(t[:-1])
                w2.extend(t[1:])
        return pa.table({"w1": pa.array(w1, type=pa.string()),
                         "w2": pa.array(w2, type=pa.string())})

    def unigrams(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        flat = texts.str.lower().str.findall(r"\S+").explode().dropna()
        return pa.table({"tok": pa.array(flat.tolist(), type=pa.string())})

    src = ds.select_columns([text_col])
    bi = grouped_aggregate(
        src.map_batches(bigrams, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["w1", "w2"], {"n_ab": ("w1", "count")},
        num_buckets=num_buckets).materialize()
    # pinned once: N (the exact total) and the pruned candidates both
    # read it, and the table is bounded by DISTINCT bigrams, not rows
    uni = grouped_aggregate(
        src.map_batches(unigrams, batch_format="pyarrow",
                        zero_copy_batch=True),
        "tok", {"n": ("tok", "count")}, num_buckets=num_buckets).to_pandas()
    if len(uni) > max_vocab:
        raise ValueError(
            f"pmi_collocations: vocab {len(uni)} exceeds max_vocab="
            f"{max_vocab} — the unigram broadcast would not be small; "
            "raise the cap deliberately or pre-filter tokens")

    def prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_ab"), min_count))

    cand = bi.map_batches(prune, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if len(cand) > 2_000_000:
        raise ValueError(
            f"pmi_collocations: {len(cand)} bigrams survive min_count="
            f"{min_count} — the driver pull is not small; raise min_count")
    n_total = int(bi.sum("n_ab"))  # distributed exact total
    lut = dict(zip(uni["tok"], uni["n"].astype(np.int64)))
    na = cand["w1"].map(lut).to_numpy(dtype=np.int64)
    nb = cand["w2"].map(lut).to_numpy(dtype=np.int64)
    nab = cand["n_ab"].to_numpy(dtype=np.int64)
    pmi = np.log(np.float64(n_total) * nab / (na * nb))
    out = cand[["w1", "w2"]].copy()
    out["n_ab"] = nab
    out["pmi"] = np.round(pmi, ndigits) + 0.0
    out = out.sort_values(["pmi", "w1", "w2"],
                          ascending=[False, True, True],
                          ignore_index=True)
    return out.head(top_k).reset_index(drop=True)


__all__.append("pmi_collocations")


def chi2_terms(ds, text_col: str, label_col: str, *, min_df: int = 10,
               top_k: int = 20, num_buckets: int = 16,
               ndigits: int = 6):
    """Per-term χ² feature selection (the sklearn-chi2 classic over
    text): rank terms by the 2×2 independence statistic between
    DOCUMENT presence and a binary label,

        χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    with a/b = positive/negative docs CONTAINING the term and c/d the
    complements.  `\\S+` lowercase tokenization, presence not
    occurrences (distinct (doc, term)).  Per-term (df_pos, df_neg)
    counts combine map-side; ``min_df`` prunes DISTRIBUTED before the
    driver pull; selection orders on the 1e-6-rounded χ² with a term
    tiebreak (ulp-stable cut).  All intermediates stay exact int64 —
    the same association a BIGINT SQL mirror computes — before the one
    final double division.  Returns (term, df_pos, df_neg, chi2)."""
    import pyarrow.compute as pc

    from .groupagg import grouped_aggregate

    def widen(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        toks = texts.str.lower().str.findall(r"\S+")
        terms, pos = [], []
        for t, la in zip(toks, lab):
            if t:
                uniq = set(t)
                terms.extend(uniq)
                pos.extend([bool(la)] * len(uniq))
        p = np.asarray(pos, dtype=np.int64)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "__p": pa.array(p, type=pa.int64()),
                         "__n": pa.array(1 - p, type=pa.int64())})

    src = ds.select_columns([text_col, label_col])
    per_term = grouped_aggregate(
        src.map_batches(widen, batch_format="pyarrow",
                        zero_copy_batch=True),
        "term", {"df_pos": ("__p", "sum"), "df_neg": ("__n", "sum")},
        num_buckets=num_buckets)

    def prune(t: pa.Table) -> pa.Table:
        tot = pc.add(t.column("df_pos"), t.column("df_neg"))
        return t.filter(pc.greater_equal(tot, min_df))

    cand = per_term.map_batches(prune, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()

    def doc_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pandas()
        nonempty = texts.str.strip().str.len() > 0
        lab = pd.Series(batch.column(label_col)
                        .to_numpy(zero_copy_only=False)).astype(bool)
        return pa.table({
            "np": pa.array([int((nonempty & lab).sum())], pa.int64()),
            "nn": pa.array([int((nonempty & ~lab).sum())], pa.int64()),
        })

    tot = src.map_batches(doc_counts, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=None).to_pandas().sum()
    n_pos, n_neg = int(tot["np"]), int(tot["nn"])
    n = n_pos + n_neg

    a = cand["df_pos"].to_numpy(dtype=np.int64)
    b = cand["df_neg"].to_numpy(dtype=np.int64)
    c = n_pos - a
    d = n_neg - b
    diff = a * d - b * c                      # exact int64 (BIGINT mirror)
    num = np.float64(n) * (diff * diff)
    den = (a + b) * (c + d) * np.int64(n_pos) * np.int64(n_neg)
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = np.where(den > 0, num / den, np.nan)
    out = cand[["term"]].copy()
    out["df_pos"] = a
    out["df_neg"] = b
    out["chi2"] = np.round(chi2, ndigits) + 0.0
    out = out.sort_values(["chi2", "term"], ascending=[False, True],
                          ignore_index=True)
    return out.head(top_k).reset_index(drop=True)


__all__.append("chi2_terms")
