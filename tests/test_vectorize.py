"""Hashed BoW / TF-IDF vs a direct per-document reference."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.functions.hashing import stable_hash_array
from featureextraction_jl_ray.stages.vectorize import (
    HashingVectorizer,
    fit_idf,
    hashed_bow,
    tfidf_vectorize,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
_PAT = re.compile(r"[a-zà-ÿ]+|\d+")


def _ref_tf(text: str, dim: int, seed: int = 7) -> np.ndarray:
    v = np.zeros(dim)
    toks = _PAT.findall((text or "").lower())
    if toks:
        h = stable_hash_array(np.array(toks, dtype=object), seed=seed)
        for b in (h % np.uint64(dim)).astype(int):
            v[b] += 1.0
    return v


def test_hashing_vectorizer_matches_reference():
    texts = pd.read_parquet(DOCS)["text"].head(50).tolist() + ["", "42 42 foo"]
    tbl = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = HashingVectorizer(dim=64, norm=None)(tbl)
    got = np.asarray(out.column("tfv").to_pylist(), dtype=np.float64)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(got[i], _ref_tf(t, 64))


def test_l2_norm_and_empty_text():
    tbl = pa.table({"text": ["hello hello world", ""]})
    out = HashingVectorizer(dim=32)(tbl)
    v = np.asarray(out.column("tfv").to_pylist(), dtype=np.float64)
    assert abs(np.linalg.norm(v[0]) - 1.0) < 1e-6
    assert np.linalg.norm(v[1]) == 0.0  # empty doc → zero vector, no NaN


def test_fit_idf_and_tfidf_vs_reference(ray_session):
    import ray.data as rd

    df = pd.read_parquet(DOCS, columns=["doc_id", "text"]).head(200)
    ds = rd.from_pandas(df)
    dim = 64
    idf = fit_idf(ds, dim=dim, batch_size=37)
    # reference df: number of docs whose token-bucket set contains b
    dfc = np.zeros(dim)
    for t in df["text"]:
        v = _ref_tf(t, dim)
        dfc += v > 0
    want_idf = np.log((1 + len(df)) / (1 + dfc)) + 1
    np.testing.assert_allclose(idf, want_idf, rtol=1e-12)

    out = tfidf_vectorize(ds, dim=dim).to_pandas().set_index("doc_id")
    for did, t in df.set_index("doc_id")["text"].head(10).items():
        tf = _ref_tf(t, dim)
        w = tf * want_idf
        n = np.linalg.norm(w)
        if n > 0:
            w = w / n
        np.testing.assert_allclose(
            np.asarray(out.loc[did, "tfv"], dtype=np.float64), w, atol=1e-6
        )


def test_tfidf_feeds_knn(ray_session):
    """The vector column plugs straight into the cosine kNN stage."""
    import ray.data as rd

    from featureextraction_jl_ray.stages.similarity import knn_cosine

    df = pd.read_parquet(DOCS, columns=["doc_id", "text"]).head(100)
    ds = tfidf_vectorize(rd.from_pandas(df), dim=64, drop_text=True)
    q = np.asarray(ds.take(1)[0]["tfv"], dtype=np.float32)[None, :]
    rows = knn_cosine(ds, q, vector_col="tfv", id_col="doc_id", k=3)
    assert len(rows) == 3
    # the query vector's own document is its nearest neighbor
    assert rows.sort_values("score", ascending=False).iloc[0]["score"] > 0.999


def test_repetition_stats_reference():
    """RepetitionStats vs hand-computed values on crafted docs."""
    import pyarrow as pa

    from featureextraction_jl_ray.stages.text import RepetitionStats

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a a a a",          # 4 words, 1 distinct; bigram 'a a' ×3 / 3
            "x y x y",          # dup 1-2/4; bigram 'x y' ×2 / 3
            "unique words only ok",  # no repetition
            "solo",             # 1 word → both zero
        ],
    })
    out = RepetitionStats()(t).to_pandas()
    import numpy as np
    np.testing.assert_allclose(out.word_dup_ratio,
                               [0.75, 0.5, 0.0, 0.0], rtol=1e-12)
    np.testing.assert_allclose(out.top_bigram_frac,
                               [1.0, 2 / 3, 1 / 3, 0.0], rtol=1e-12)


def test_char_bigram_lm_flags_junk(ray_session):
    """A mojibake/random-bytes doc scores far below normal prose under
    the corpus-fitted bigram LM."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.text import (
        fit_char_bigram_lm,
        score_char_bigram_lm,
    )

    prose = ["the quick brown fox jumps over the lazy dog " * 5] * 20
    junk = ["qx zq jq vq xz qj zx jv " * 8]
    t = pa.table({"doc_id": list(range(21)), "text": prose + junk})
    ds = rd.from_arrow(t)
    logp = fit_char_bigram_lm(ds)
    out = score_char_bigram_lm(ds, logp).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    assert out.lm_score[:20].min() > out.lm_score.iloc[20] + 1.0
    # short doc → null
    t2 = pa.table({"doc_id": [0], "text": ["x"]})
    out2 = score_char_bigram_lm(rd.from_arrow(t2), logp).to_pandas()
    assert np.isnan(out2.lm_score.iloc[0])


def test_chunk_documents_overlap_and_tail(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.text import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": [" ".join(toks), "a b", ""]})
    out = chunk_documents(rd.from_arrow(t), size=4, stride=3).to_pandas()
    out = out.sort_values(["doc_id", "chunk_id"], ignore_index=True)
    d0 = out[out.doc_id == 0]
    # 10 tokens, size 4, stride 3 → chunks at 0,3,6 (ceil((10-4)/3)+1 = 3)
    assert list(d0.chunk_text) == ["t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"]
    assert list(d0.n_tokens) == [4, 4, 4]
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_text) == ["a b"] and list(d1.n_tokens) == [2]
    assert (out.doc_id != 2).all()  # empty doc → zero chunks


def test_pack_chunks_capacity_bound(ray_session):
    """Every pack bin (except possibly a shard's last) holds within
    [capacity − max_chunk + 1, capacity + max_chunk − 1] tokens, and
    chunks stay in (doc, chunk) order within a bin."""
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.text import chunk_documents, pack_chunks

    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{i}" for i in range(rng.integers(5, 120)))
             for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), type=pa.int64()),
                  "text": texts})
    chunks = chunk_documents(rd.from_arrow(t), size=32, stride=32)
    out = pack_chunks(chunks, capacity=128, num_shards=4).to_pandas()
    max_chunk = 32
    for shard, g in out.groupby("pack_shard"):
        g = g.sort_values(["doc_id", "chunk_id"], ignore_index=True)
        # running-order invariant: bins are non-decreasing in scan order
        assert (g.pack_bin.diff().fillna(0) >= 0).all()
        sizes = g.groupby("pack_bin").n_tokens.sum()
        last_bin = g.pack_bin.max()
        full = sizes[sizes.index != last_bin]
        assert (full >= 128 - max_chunk + 1).all()
        assert (full <= 128 + max_chunk - 1).all()


def test_dup_ngram_fraction_planted(ray_session):
    """Planted corpus: an 8-gram shared across two docs marks 1/1 in the
    short doc and the matching window in the long one; same-doc repeats
    count; <8-word and empty docs emit no row."""
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.text import dup_ngram_fraction

    shared = "a b c d e f g h"          # one 8-gram, shared
    docs = {
        0: shared,                       # 1 shingle, dup → 1.0
        1: shared + " i j",              # 3 shingles, 1 dup → 1/3
        2: "q r s t u v w x y",          # 2 shingles, unique → 0.0
        3: "z z z z z z z z z",          # 2 identical shingles → same-doc dup → 1.0
        4: "too short",                  # no shingles → no row
        5: "",                           # no row
    }
    tbl = pa.table({
        "doc_id": pa.array(list(docs), type=pa.int64()),
        "text": pa.array(list(docs.values()), type=pa.string()),
    })
    ds = ray_session.data.from_arrow(tbl).repartition(3)
    got = (dup_ngram_fraction(ds, n=8, num_buckets=4)
           .to_pandas().set_index("doc_id")["dup_ngram_frac"].to_dict())
    want = {0: 1.0, 1: round(1 / 3, 6), 2: 0.0, 3: 1.0}
    assert got == want, got


def test_bm25_matches_numpy_reference(ray_session, sf_dir):
    """bm25_score == a whole-corpus NumPy BM25 (same '\\S+' tokens,
    Lucene idf), invariant to partition count; fit stats exact."""
    import duckdb

    from featureextraction_jl_ray.stages.vectorize import (
        bm25_score,
        fit_bm25_stats,
    )

    doc = f"{sf_dir}/documents.parquet"
    texts = duckdb.sql(f"SELECT doc_id, text FROM '{doc}' ORDER BY doc_id").fetchdf()
    terms = ["vector", "merge", "scan"]
    toks = texts.text.str.lower().str.findall(r"\S+")
    lens = toks.str.len().to_numpy(dtype=np.int64)
    tf = np.stack([[t.count(q) for q in terms] for t in toks]).astype(np.float64)
    N = len(texts)
    df = (tf > 0).sum(axis=0)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5))
    avglen = lens.sum() / N
    denom = tf + 1.2 * (1.0 - 0.75 + 0.75 * lens[:, None] / avglen)
    want = (idf[None, :] * tf * 2.2 / denom).sum(axis=1)
    keep = tf.sum(axis=1) > 0

    for nparts in (2, 9):
        ds = ray_session.data.read_parquet(doc).repartition(nparts)
        n, total_len, df_got = fit_bm25_stats(ds, terms, text_col="text")
        assert n == N and total_len == lens.sum()
        assert (df_got == df).all()
        got = bm25_score(ds, terms, text_col="text", id_col="doc_id"
                         ).to_pandas().sort_values("doc_id", ignore_index=True)
        assert len(got) == int(keep.sum())
        np.testing.assert_allclose(
            got.score, want[keep], rtol=1e-12)

    # retrieval composition: top-k by (score desc, id asc)
    top = (
        bm25_score(ray_session.data.read_parquet(doc), terms,
                   text_col="text", id_col="doc_id")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(5).to_pandas()
    )
    order = np.lexsort((texts.doc_id.to_numpy()[keep], -want[keep]))
    assert top.doc_id.tolist() == texts.doc_id.to_numpy()[keep][order][:5].tolist()


def test_term_df_spectrum_planted(ray_session):
    import pandas as pd
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import term_df_spectrum

    # planted: "alpha" in 3 docs, "beta" in 2, "gamma"/"delta" in 1 each;
    # repeats within a doc must not inflate df
    docs = pd.DataFrame({"text": [
        "alpha beta alpha",
        "alpha beta gamma",
        "alpha delta",
    ]})
    out = term_df_spectrum(rd.from_pandas(docs), num_buckets=4).to_pandas()
    got = dict(zip(out["df"].astype(int), out["n_terms"].astype(int)))
    assert got == {3: 1, 2: 1, 1: 2}


def test_term_df_spectrum_multiblock_partials(ray_session):
    # the df partial must sum exactly across blocks: same corpus, 1 block
    # vs 8 blocks, identical spectrum
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import term_df_spectrum

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(50)]
    docs = pd.DataFrame({"text": [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
        for _ in range(200)
    ]})
    one = term_df_spectrum(rd.from_pandas(docs), num_buckets=4).to_pandas()
    many = term_df_spectrum(
        rd.from_pandas(docs).repartition(8), num_buckets=4
    ).to_pandas()
    key = lambda d: sorted(map(tuple, d[["df", "n_terms"]].to_numpy()))
    assert key(one) == key(many)


def test_rrf_fuse_ranks_ties_and_missing_channels(ray_session):
    import ray as _r
    from featureextraction_jl_ray.stages.vectorize import rrf_fuse

    # channel A: doc 3 best, then tie (2, 5) broken by id, then 9
    a = pa.table({"doc_id": [2, 3, 5, 9],
                  "score": [0.5, 0.9, 0.5, 0.1]})
    # channel B: doc 5 best; docs 3/9 absent; doc 7 only here
    b = pa.table({"doc_id": [5, 2, 7],
                  "score": [0.8, 0.4, 0.2]})
    out = rrf_fuse([_r.data.from_arrow(a), _r.data.from_arrow(b)],
                   id_col="doc_id", k=3, k0=60)
    got = dict(zip(out["doc_id"], out["rrf"]))
    # k=3 cuts channel A to ranks: 3→1, 2→2 (tie with 5, smaller id), 5→3
    # channel B ranks: 5→1, 2→2, 7→3; doc 9 cut everywhere
    assert got == {
        3: round(1 / 61, 6),
        2: round(1 / 62 + 1 / 62, 6),
        5: round(1 / 63 + 1 / 61, 6),
        7: round(1 / 63, 6),
    }
    assert 9 not in got


# ---------------------------------------------------------------- pmi


def test_pmi_collocations_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import pmi_collocations

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(200):
        words = list(rng.choice(vocab, 12))
        if i % 2 == 0:
            # plant the collocation: "alpha beta" always adjacent
            words[3:3] = ["alpha", "beta"]
        docs.append(" ".join(words))
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    out = pmi_collocations(ds, "text", min_count=5, top_k=5, num_buckets=4)
    assert (out.iloc[0][["w1", "w2"]].tolist() == ["alpha", "beta"])
    assert out.iloc[0]["n_ab"] == 100
    # pmi of the planted pair ~ ln(N / n_alpha) since beta follows alpha
    # always; it must dominate the random pairs
    assert out.iloc[0]["pmi"] > out.iloc[1]["pmi"] + 1.0


def test_pmi_matches_bruteforce(ray_session):
    import collections
    import math

    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import pmi_collocations

    docs = ["a b c a b", "b c a b", "c c a b a"]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    out = pmi_collocations(ds, "text", min_count=1, top_k=100,
                           num_buckets=2)
    uni = collections.Counter(t for d in docs for t in d.split())
    bi = collections.Counter(
        (a, b) for d in docs
        for a, b in zip(d.split()[:-1], d.split()[1:]))
    n = sum(bi.values())
    for _, r in out.iterrows():
        want = math.log(float(n) * bi[(r.w1, r.w2)]
                        / (uni[r.w1] * uni[r.w2]))
        assert abs(r.pmi - round(want, 6)) < 1e-9, (r.w1, r.w2)
    assert len(out) == len(bi)


# ---------------------------------------------------------------- chi2


def test_chi2_terms_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import chi2_terms

    rng = np.random.default_rng(1)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for i in range(400):
        pos = i % 2 == 0
        words = list(rng.choice(vocab, 10))
        if pos:
            words.append("signalword")   # only in positive docs
        rows.append({"text": " ".join(words), "y": pos})
    df = pd.DataFrame(rows)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    out = chi2_terms(ds, "text", "y", min_df=5, top_k=5, num_buckets=4)
    assert out.iloc[0]["term"] == "signalword"
    assert out.iloc[0]["df_pos"] == 200 and out.iloc[0]["df_neg"] == 0
    # perfectly separating term: chi2 = N
    assert out.iloc[0]["chi2"] == 400.0
    # background vocab is independent of the label → far smaller chi2
    assert out.iloc[1]["chi2"] < 30.0


def test_chi2_terms_presence_not_occurrence(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.vectorize import chi2_terms

    # the same term repeated 50× in one doc counts once
    df = pd.DataFrame({
        "text": ["spam " * 50] * 3 + ["ham"] * 3,
        "y": [True] * 3 + [False] * 3,
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    out = chi2_terms(ds, "text", "y", min_df=1, top_k=10, num_buckets=2)
    spam = out[out.term == "spam"].iloc[0]
    assert spam.df_pos == 3 and spam.df_neg == 0
