"""Dedup + near-dup + similarity operators vs oracles (SURVEY.md §5.2 №3/№7)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.functions.phash import ahash64_batch
from featureextraction_jl_ray.stages.dedup import (
    exact_dedup,
    hamming_dedup,
    hamming_near_dup_pairs,
    popcount64,
    span_dedup,
)
from featureextraction_jl_ray.stages.groupagg import grouped_aggregate, grouped_topn
from featureextraction_jl_ray.stages.minhash import (
    minhash_near_dup_pairs,
    ngram_jaccard,
    simhash_near_dup_pairs,
    with_simhash,
)
from featureextraction_jl_ray.stages.similarity import (
    embedding_near_dup_pairs,
    knn_cosine,
    knn_cosine_ivf,
)
from featureextraction_jl_ray.synth import SynthConfig, synth_images


def test_popcount():
    x = np.array([0, 1, 3, -1, 1 << 40], dtype=np.int64)
    assert popcount64(x).tolist() == [0, 1, 2, 64, 1]


def test_exact_dedup_skewed_matches_oracle(ray_session, sf_dir):
    ev = ray_session.data.read_parquet(f"{sf_dir}/events.parquet")
    got = (
        exact_dedup(ev, "event_type", order_cols=["ts", "event_id"],
                    num_salts=8, num_buckets=16)
        .to_pandas()
    )
    want = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/events.parquet' "
        "QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)=1"
    ).fetchdf()
    assert set(got.event_id) == set(want.event_id)
    # salting must not change results
    got1 = (
        exact_dedup(ev, "event_type", order_cols=["ts", "event_id"],
                    num_salts=1, num_buckets=4)
        .to_pandas()
    )
    assert set(got.event_id) == set(got1.event_id)


def test_span_dedup_semantics(ray_session):
    """Duplicate spans collapse to the (doc_id, span_idx)-first copy,
    fully-duplicated documents vanish, surviving docs reassemble their
    remaining spans in order (whitespace normalized to single spaces)."""
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "a b c d e f g h i j",   # spans: "a b c d e" | "f g h i j"
            "a b c d e x y z w v",   # span 0 duplicates doc 1's span 0
            "f g h i j",             # entirely covered by doc 1's span 1
            "  p  q \t r ",          # messy whitespace, short tail span
        ],
    })
    out = (span_dedup(ray_session.data.from_pandas(df), span_words=5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.doc_id.tolist() == [1, 2, 4]
    assert out.text_dedup.tolist() == [
        "a b c d e f g h i j", "x y z w v", "p q r"]
    assert out.n_spans.tolist() == [2, 1, 1]


def _substring_dedup_naive(docs: dict, n: int) -> dict:
    """Pure-Python reference for substring_dedup: global-first stride-1
    n-gram occurrences survive, loser windows' token ranges drop."""
    toks = {d: t.split() for d, t in docs.items()}
    occ = {}
    for d in sorted(toks):
        words = toks[d]
        for p in range(len(words) - n + 1):
            occ.setdefault(" ".join(words[p:p + n]), []).append((d, p))
    removed = {d: set() for d in toks}
    for positions in occ.values():
        for d, p in positions[1:]:
            removed[d].update(range(p, p + n))
    return {
        d: (" ".join(w for i, w in enumerate(words) if i not in removed[d]),
            len(words), len(removed[d]))
        for d, words in toks.items()
    }


def test_substring_dedup_arbitrary_offsets(ray_session):
    """The Lee-et-al-class upgrade over span_dedup: an 8+-word sequence
    repeated at DIFFERENT offsets (where aligned spans can't line up) is
    still removed everywhere but its globally first (doc_id, pos)
    occurrence; within-doc repeats are removed too; short docs pass
    through whitespace-normalized."""
    from featureextraction_jl_ray.stages.dedup import substring_dedup

    boiler = "the quick brown fox jumps over the lazy dog tonight"  # 10 words
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "alpha beta " + boiler + " gamma delta",        # first (pos 2)
            "one two three four " + boiler,                 # offset 4 → removed
            boiler + " unique tail words here now ok yes",  # offset 0 → removed
            "totally unrelated words nothing shared at all in this document",
            "short  doc",                                   # < gram_words
            boiler + " " + boiler,                          # within-doc repeat
        ],
    })
    out = (substring_dedup(ray_session.data.from_pandas(df), gram_words=8,
                           num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _substring_dedup_naive(dict(zip(df.doc_id, df.text)), 8)
    assert len(out) == 6
    for _, r in out.iterrows():
        wt, wn, wr = want[r.doc_id]
        assert r.text_dedup == wt, r.doc_id
        assert r.n_tokens == wn and r.n_removed == wr, r.doc_id
    # spot-check the headline semantics directly
    assert out.loc[0, "text_dedup"].count(boiler) == 1
    assert out.loc[1, "text_dedup"] == "one two three four"
    assert out.loc[5, "text_dedup"] == ""   # fully-duplicated doc, row kept


def test_substring_dedup_matches_naive_on_random_corpus(ray_session):
    """Derandomized sweep: synthetic corpus from a tiny vocabulary (so
    repeated ≥n-word runs arise by chance at arbitrary offsets) must
    match the pure-Python reference token-for-token."""
    from featureextraction_jl_ray.stages.dedup import substring_dedup

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {int(d): " ".join(rng.choice(vocab, size=int(rng.integers(5, 60))))
            for d in range(60)}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    out = (substring_dedup(ray_session.data.from_pandas(df), gram_words=4,
                           num_buckets=8)
           .to_pandas().set_index("doc_id"))
    want = _substring_dedup_naive(docs, 4)
    assert len(out) == len(docs)
    removed_total = 0
    for d, (wt, wn, wr) in want.items():
        assert out.loc[d, "text_dedup"] == wt, d
        assert out.loc[d, "n_tokens"] == wn and out.loc[d, "n_removed"] == wr
        removed_total += wr
    assert removed_total > 0   # the corpus genuinely exercises removal


def test_span_dedup_cross_doc_boilerplate_kept_once(ray_session):
    """Boilerplate repeated across MANY docs (the skewed-key case the
    salted reduce exists for) survives exactly once corpus-wide."""
    boiler = "subscribe to our newsletter for daily updates today"
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": [f"unique{i} body{i} words{i} here{i} now{i} " + boiler
                 for i in range(40)],
    })
    out = (span_dedup(ray_session.data.from_pandas(df), span_words=5,
                      num_salts=4, num_buckets=8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 40
    joined = " ".join(out.text_dedup)
    assert joined.count(boiler) == 1          # kept once, corpus-wide
    assert out.loc[0, "text_dedup"].endswith(boiler)  # in the FIRST doc
    # doc 0: its unique span + the 8-word boilerplate's two spans
    assert out.n_spans.tolist() == [3] + [1] * 39


def test_phash_near_dup_skew_cluster_collapses(ray_session):
    """The synth skew cluster shares ONE phash: the exact-collapse
    pre-step must reduce it to a single representative (no O(n²) pair
    blowup) and hamming_dedup keeps exactly one row per cluster."""
    img = synth_images(SynthConfig(n_entities=40, seed=42))
    ph = img.column("phash").to_numpy()
    vals, counts = np.unique(ph, return_counts=True)
    cluster_hash = vals[counts.argmax()]
    assert counts.max() > 10  # the skew cluster exists
    ids = np.arange(len(ph), dtype=np.int64)
    ds = ray_session.data.from_arrow(
        pa.table({"iid": pa.array(ids), "phash": pa.array(ph)})
    )
    pairs = hamming_near_dup_pairs(ds, "phash", "iid", max_distance=0,
                                   num_buckets=16).to_pandas()
    # d=0 pairs are BETWEEN distinct hashes → none; the cluster collapsed
    assert len(pairs) == 0  # (empty result may come back schemaless)
    kept, _ = hamming_dedup(ds, "phash", "iid", max_distance=0, num_buckets=16)
    kept_df = kept.to_pandas()
    assert len(kept_df) == len(vals)  # one row per distinct hash
    in_cluster = ids[ph == cluster_hash]
    assert len(set(kept_df.iid) & set(in_cluster)) == 1


def test_hamming_near_dup_banding(ray_session):
    """Distinct hashes within Hamming ≤ 2 pair up via pigeonhole bands."""
    base = np.int64(0x0123456789ABCDEF)
    hashes = np.array([base, base ^ 3, base ^ (1 << 40), ~base], dtype=np.int64)
    ds = ray_session.data.from_arrow(
        pa.table({"iid": pa.array(np.arange(4, dtype=np.int64)),
                  "phash": pa.array(hashes)})
    )
    pairs = hamming_near_dup_pairs(ds, "phash", "iid", max_distance=2,
                                   num_buckets=8).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got  # distance 2
    assert (0, 2) in got  # distance 1
    assert not any(3 in p for p in got)  # distance 62+


def test_minhash_near_dup(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "the quick brown fox jumps over the lazy dog near the river shore",
        "a completely different sentence about distributed data processing",
        "another unrelated string with ray data pipelines and arrow batches",
    ]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts)})
    )
    pairs = minhash_near_dup_pairs(ds, text_col="text", id_col="doc_id",
                                   threshold=0.5, num_perms=64, bands=16,
                                   num_buckets=8).to_pandas()
    assert {(1, 2)} == set(zip(pairs.id_a, pairs.id_b))
    assert ngram_jaccard(texts[0], texts[1]) > 0.5


def test_ngram_jaccard_pairs_exact(ray_session):
    """Distributed inverted-index exact Jaccard == per-pair reference
    ngram_jaccard, including the short-doc / empty-doc / exact-dup edges."""
    from featureextraction_jl_ray.stages.minhash import ngram_jaccard_pairs

    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "the quick brown fox jumps over the lazy dog near the river shore",
        "a completely different sentence about distributed data processing",
        "the quick brown fox jumps over the lazy dog near the river bank",
        "tiny doc",          # < k words → single joined shingle
        "tiny doc",          # identical short doc → jaccard 1 with row 5
        "",                  # empty → '∅' shingle
        "",                  # empty pair → jaccard 1 with row 7
    ]
    ids = list(range(1, len(texts) + 1))
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(3)
    got = ngram_jaccard_pairs(ds, text_col="text", id_col="doc_id",
                              threshold=0.5, num_buckets=8).to_pandas()
    got_pairs = {(a, b): j for a, b, j in zip(got.id_a, got.id_b, got.jaccard)}
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jac = ngram_jaccard(texts[i], texts[j])
            if jac >= 0.5:
                want[(ids[i], ids[j])] = jac
    assert set(got_pairs) == set(want)
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 1e-12


def test_jaccard_dedup_collapses_triangle(ray_session):
    """A 3-doc near-dup triangle collapses to its min-id representative;
    isolated docs all survive."""
    from featureextraction_jl_ray.stages.minhash import jaccard_dedup

    base = "the quick brown fox jumps over the lazy dog near the river"
    texts = [
        base + " bank",          # 1 ┐
        base + " shore",         # 2 ├ triangle → keep 1
        base + " delta",         # 3 ┘
        "a completely different sentence about distributed data processing",
        "another unrelated string with ray data pipelines and arrow batches",
    ]
    ids = [1, 2, 3, 4, 5]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    kept, pairs = jaccard_dedup(ds, text_col="text", id_col="doc_id",
                                threshold=0.5, num_buckets=8)
    assert set(zip(pairs.id_a, pairs.id_b)) == {(1, 2), (1, 3), (2, 3)}
    assert sorted(kept.to_pandas()["doc_id"]) == [1, 4, 5]


def test_simhash_near_dup(ray_session):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappax",
        "totally different content here about something else entirely",
    ]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(texts)})
    )
    sh = with_simhash(ds).to_pandas().sort_values("doc_id")
    d12 = popcount64(np.array([sh.simhash.iloc[0] ^ sh.simhash.iloc[1]]))[0]
    d13 = popcount64(np.array([sh.simhash.iloc[0] ^ sh.simhash.iloc[2]]))[0]
    assert d12 < d13
    pairs = simhash_near_dup_pairs(ds, max_distance=int(d12), num_buckets=8).to_pandas()
    assert (1, 2) in set(zip(pairs.id_a, pairs.id_b))


def test_knn_bruteforce_matches_numpy(ray_session, sf_dir):
    tbl = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(tbl.embedding.to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Q = Xn[:3]
    ds = ray_session.data.read_parquet(f"{sf_dir}/embeddings.parquet").repartition(4)
    got = knn_cosine(ds, X[:3], vector_col="embedding", id_col="vec_id", k=5)
    S = Xn @ Q.T
    for qi in range(3):
        want_ids = tbl.vec_id.to_numpy()[np.argsort(-S[:, qi], kind="stable")[:5]]
        got_ids = got[got.query_id == qi].vec_id.to_numpy()
        assert set(got_ids) == set(want_ids)
        assert got_ids[0] == tbl.vec_id.iloc[qi]  # self is nearest


def test_knn_ivf_recall(ray_session, sf_dir):
    tbl = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(tbl.embedding.to_numpy()).astype(np.float64)
    ds = ray_session.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    exact = knn_cosine(ds, X[:2], vector_col="embedding", id_col="vec_id", k=10)
    approx = knn_cosine_ivf(ds, X[:2], vector_col="embedding", id_col="vec_id",
                            k=10, n_clusters=8, nprobe=4)
    # recall@10 of the IVF path ≥ 0.5 on random data with half the cells probed
    for qi in (0, 1):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        assert len(e & a) / len(e) >= 0.5


def test_ivf_persisted_index_matches_session_index(ray_session, sf_dir, tmp_path):
    """The hive-partitioned on-disk index (partition-pruned probe) and the
    session-local materialized index must return identical neighbors."""
    from featureextraction_jl_ray.stages.similarity import build_ivf_index

    tbl = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(tbl.embedding.to_numpy()).astype(np.float64)
    ds = ray_session.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    mem_idx = build_ivf_index(ds, vector_col="embedding", id_col="vec_id",
                              n_clusters=8, materialize_in_memory=True)
    # the in-memory form without explicit opt-in must refuse (100-TB
    # accident guard)
    with pytest.raises(ValueError, match="materialize"):
        build_ivf_index(ds, vector_col="embedding", id_col="vec_id", n_clusters=8)
    disk_idx = build_ivf_index(ds, vector_col="embedding", id_col="vec_id",
                               n_clusters=8, path=str(tmp_path / "ivf"))
    np.testing.assert_allclose(mem_idx.centroids, disk_idx.centroids)
    a = knn_cosine_ivf(mem_idx, X[:2], vector_col="embedding", id_col="vec_id",
                       k=5, nprobe=4)
    b = knn_cosine_ivf(disk_idx, X[:2], vector_col="embedding", id_col="vec_id",
                       k=5, nprobe=4)
    assert list(a.vec_id) == list(b.vec_id)
    np.testing.assert_allclose(a.score.to_numpy(), b.score.to_numpy(), rtol=1e-12)


def test_embedding_near_dup(ray_session):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(32)
    rows = [base, base + rng.standard_normal(32) * 0.01, rng.standard_normal(32)]
    ds = ray_session.data.from_arrow(
        pa.table({
            "vec_id": pa.array([1, 2, 3], type=pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in rows],
                                  type=pa.list_(pa.float32())),
        })
    )
    pairs = embedding_near_dup_pairs(ds, vector_col="embedding", id_col="vec_id",
                                     threshold=0.95, bands=8, planes_per_band=8,
                                     num_buckets=4).to_pandas()
    assert (1, 2) in set(zip(pairs.id_a, pairs.id_b))
    assert not any(3 in p for p in zip(pairs.id_a, pairs.id_b))


def test_embedding_near_dup_planted_recall(ray_session):
    """Multi-band LSH recall on PLANTED near-dup pairs (round-1 VERDICT
    item 7): 40 planted cos≥0.97 pairs among 400 random 32-d vectors;
    b=8 × r=8 must recover ≥90% (theory ≈ 0.93 at cos 0.95, higher at
    0.97) while the random background stays near-empty at this threshold."""
    rng = np.random.default_rng(7)
    vecs, ids = [], []
    next_id = 0
    planted = []
    for _ in range(40):
        base = rng.standard_normal(32)
        dup = base + rng.standard_normal(32) * 0.02 * np.linalg.norm(base) / np.sqrt(32)
        a, b = next_id, next_id + 1
        next_id += 2
        vecs += [base, dup]
        ids += [a, b]
        planted.append((a, b))
    for _ in range(320):
        vecs.append(rng.standard_normal(32))
        ids.append(next_id)
        next_id += 1
    norm = [v / np.linalg.norm(v) for v in vecs]
    true = {(a, b) for a, b in planted
            if float(norm[ids.index(a)] @ norm[ids.index(b)]) >= 0.95}
    ds = ray_session.data.from_arrow(
        pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        })
    ).repartition(4)
    pairs = embedding_near_dup_pairs(ds, vector_col="embedding", id_col="vec_id",
                                     threshold=0.95, bands=8, planes_per_band=8,
                                     num_buckets=8).to_pandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert len(true) >= 35  # the fixture actually plants near-dups
    recall = len(got & true) / len(true)
    assert recall >= 0.9, f"recall {recall:.2f} over {len(true)} planted pairs"


def test_grouped_aggregate_matches_duckdb(ray_session, sf_dir):
    ds = ray_session.data.read_parquet(f"{sf_dir}/lineitem.parquet")
    got = grouped_aggregate(
        ds, ["l_returnflag"], {"sum_qty": ("l_quantity", "sum"),
                               "n": ("l_quantity", "count"),
                               "avg_qty": ("l_quantity", "mean"),
                               "max_qty": ("l_quantity", "max")},
        num_buckets=4,
    ).to_pandas().sort_values("l_returnflag", ignore_index=True)
    want = duckdb.sql(
        f"SELECT l_returnflag, sum(l_quantity) sum_qty, count(l_quantity) n, "
        f"avg(l_quantity) avg_qty, max(l_quantity) max_qty "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    np.testing.assert_allclose(got.sum_qty, want.sum_qty, rtol=1e-12)
    assert (got.n.to_numpy() == want.n.to_numpy()).all()
    np.testing.assert_allclose(got.avg_qty, want.avg_qty, rtol=1e-12)


def test_grouped_var_countdistinct_quantile_match_duckdb(ray_session, sf_dir):
    """The round-2 aggregate family: partialized var/std, two-exchange
    exact COUNT(DISTINCT), exact per-key quantiles — all vs DuckDB."""
    from featureextraction_jl_ray.stages.groupagg import (
        grouped_count_distinct,
        grouped_quantile,
    )

    ev = f"{sf_dir}/events.parquet"
    ds = ray_session.data.read_parquet(ev)
    got_v = grouped_aggregate(
        ds, ["event_type"], {"v": ("value", "var"), "s": ("value", "std")},
        num_buckets=4,
    ).to_pandas().sort_values("event_type", ignore_index=True)
    want_v = duckdb.sql(
        f"SELECT event_type, var_samp(value) v, stddev_samp(value) s "
        f"FROM '{ev}' GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    np.testing.assert_allclose(got_v.v, want_v.v, rtol=1e-9)
    np.testing.assert_allclose(got_v.s, want_v.s, rtol=1e-9)

    got_d = grouped_count_distinct(
        ds, "event_type", "user_id", out_name="nd", num_buckets=4
    ).to_pandas().sort_values("event_type", ignore_index=True)
    want_d = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) nd FROM '{ev}' "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    assert (got_d.nd.to_numpy() == want_d.nd.to_numpy()).all()

    got_q = grouped_quantile(
        ds, "event_type", "value", qs=(0.5, 0.9), num_buckets=4
    ).to_pandas().sort_values("event_type", ignore_index=True)
    want_q = duckdb.sql(
        f"SELECT event_type, quantile_cont(value, 0.5) q50, "
        f"quantile_cont(value, 0.9) q90 FROM '{ev}' GROUP BY 1 ORDER BY 1"
    ).fetchdf()
    np.testing.assert_allclose(got_q.q50, want_q.q50, rtol=1e-12)
    np.testing.assert_allclose(got_q.q90, want_q.q90, rtol=1e-12)


def test_grouped_topn_matches_duckdb(ray_session, sf_dir):
    ds = ray_session.data.read_parquet(f"{sf_dir}/orders.parquet")
    got = grouped_topn(ds, "o_custkey", ["o_totalprice", "o_orderkey"], n=2,
                       ascending=[False, True], num_buckets=8).to_pandas()
    want = duckdb.sql(
        f"SELECT * FROM '{sf_dir}/orders.parquet' QUALIFY row_number() OVER "
        "(PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2"
    ).fetchdf()
    assert set(got.o_orderkey) == set(want.o_orderkey)


def test_embedding_dedup_collapses_planted_cluster(ray_session):
    from featureextraction_jl_ray.stages.similarity import embedding_dedup

    rng = np.random.default_rng(3)
    base = rng.standard_normal(32)
    rows = [base,
            base + rng.standard_normal(32) * 0.01,
            base + rng.standard_normal(32) * 0.01,
            rng.standard_normal(32),
            rng.standard_normal(32)]
    ds = ray_session.data.from_arrow(
        pa.table({
            "vec_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in rows],
                                  type=pa.list_(pa.float32())),
        })
    ).repartition(2)
    kept, pairs = embedding_dedup(ds, vector_col="embedding", id_col="vec_id",
                                  threshold=0.95, bands=8, planes_per_band=8,
                                  num_buckets=4)
    assert {(1, 2), (1, 3), (2, 3)} <= set(zip(pairs.id_a, pairs.id_b))
    assert sorted(kept.to_pandas()["vec_id"]) == [1, 4, 5]


def test_grouped_quantile_sketch_accuracy(ray_session, sf_dir):
    """Mergeable bottom-k sketch quantiles land within sampling error of
    the exact quantiles (rank error O(1/√k); assert a loose value bound
    via the exact per-key spread)."""
    from featureextraction_jl_ray.stages.groupagg import (
        grouped_quantile,
        grouped_quantile_sketch,
    )

    ds = ray_session.data.read_parquet(f"{sf_dir}/events.parquet")
    exact = grouped_quantile(
        ds, "event_type", "value", qs=(0.5, 0.9), num_buckets=4
    ).to_pandas().sort_values("event_type", ignore_index=True)
    approx = grouped_quantile_sketch(
        ds, "event_type", "value", qs=(0.5, 0.9), sketch_size=512, num_buckets=4
    ).to_pandas().sort_values("event_type", ignore_index=True)
    assert list(exact.event_type) == list(approx.event_type)
    spread = exact.q90.to_numpy() - exact.q50.to_numpy()
    for col in ("q50", "q90"):
        err = np.abs(exact[col].to_numpy() - approx[col].to_numpy())
        # 512-sample rank error ~4.4%/sqrt at 1σ; allow 5σ in value terms
        assert (err <= 0.25 * np.maximum(spread, 1e-9)).all(), (col, err, spread)


def test_grouped_count_distinct_hll_error_bound(ray_session):
    """HLL estimate within ~5σ of exact (σ ≈ 1.04/√m ≈ 1.6% at p=12),
    across the linear-counting and raw-estimator regimes."""
    from featureextraction_jl_ray.stages.groupagg import grouped_count_distinct_hll

    rng = np.random.default_rng(11)
    keys, vals = [], []
    truth = {"small": 500, "large": 60_000}
    for k, n_distinct in truth.items():
        v = rng.choice(n_distinct * 10, size=n_distinct, replace=False)
        v = np.concatenate([v, rng.choice(v, size=n_distinct)])  # dup rows
        keys += [k] * len(v)
        vals.append(v)
    ds = ray_session.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(np.concatenate(vals))})
    ).repartition(4)
    got = grouped_count_distinct_hll(ds, "k", "v", out_name="nd", precision=12,
                                     num_buckets=4).to_pandas()
    for k, n_distinct in truth.items():
        est = int(got.loc[got.k == k, "nd"].iloc[0])
        assert abs(est - n_distinct) / n_distinct < 0.08, (k, est, n_distinct)


def test_grouped_heavy_hitters_exact_regime(ray_session):
    """With capacity above the distinct-value count, no MG compress
    triggers and the top-k equals the exact pandas group-count top-k
    (count desc, value asc tiebreak)."""
    from featureextraction_jl_ray.stages.groupagg import grouped_heavy_hitters

    rng = np.random.default_rng(23)
    k = rng.choice(["a", "b"], size=5000)
    v = rng.zipf(1.5, size=5000) % 100
    ds = ray_session.data.from_arrow(
        pa.table({"k": pa.array(k), "v": pa.array(v.astype(np.int64))})
    ).repartition(4)
    got = (
        grouped_heavy_hitters(ds, "k", "v", k=5, capacity=1024, num_buckets=4)
        .to_pandas()
        .sort_values(["k", "rank"], ignore_index=True)
    )
    df = pd.DataFrame({"k": k, "v": v.astype(np.int64)})
    exp = (
        df.groupby(["k", "v"]).size().reset_index(name="n")
        .sort_values(["k", "n", "v"], ascending=[True, False, True])
        .groupby("k").head(5)
    )
    exp["rank"] = exp.groupby("k").cumcount() + 1
    exp = exp.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "v", "n", "rank"]], exp[["k", "v", "n", "rank"]],
        check_dtype=False,
    )


def test_grouped_heavy_hitters_mg_guarantee(ray_session):
    """Compressed regime (capacity << distinct): every value with true
    frequency > n/(capacity+1) is reported, and reported counts
    under-count by at most n/(capacity+1) (the Misra–Gries bound —
    summing per-batch/merge decrements stays within one global bound
    because decrement totals are sub-additive under merge)."""
    from featureextraction_jl_ray.stages.groupagg import grouped_heavy_hitters

    rng = np.random.default_rng(31)
    # 3 planted heavy values + a long uniform tail of 5000 distinct values
    heavy = np.repeat([1_000_001, 1_000_002, 1_000_003], [800, 600, 400])
    tail = rng.integers(0, 5000, size=8200)
    v = np.concatenate([heavy, tail])
    rng.shuffle(v)
    n = len(v)
    cap = 64
    ds = ray_session.data.from_arrow(
        pa.table({"k": pa.array(["x"] * n), "v": pa.array(v.astype(np.int64))})
    ).repartition(4)
    got = (
        grouped_heavy_hitters(ds, "k", "v", k=10, capacity=cap, num_buckets=2)
        .to_pandas()
    )
    bound = n / (cap + 1)
    true_counts = pd.Series(v).value_counts()
    for hv, tc in ((1_000_001, 800), (1_000_002, 600), (1_000_003, 400)):
        assert tc > bound  # planted heavies are above the MG threshold
        row = got.loc[got.v == hv]
        assert len(row) == 1, (hv, got)
        assert 0 < row.n.iloc[0] <= tc
        assert tc - row.n.iloc[0] <= bound + 1e-9
    # reported counts never exceed true counts (MG only under-counts)
    for _, r in got.iterrows():
        assert r.n <= true_counts.get(r.v, 0) or r.n <= bound


def test_scalar_quantizer_roundtrip_and_recall(ray_session):
    import ray.data as rd

    from featureextraction_jl_ray.stages.similarity import (
        fit_scalar_quantizer,
        knn_cosine,
        knn_cosine_quantized,
        quantize_embeddings,
    )

    ds = rd.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    qz = fit_scalar_quantizer(ds, "embedding")
    df = ds.to_pandas()
    X = np.stack(df.embedding.to_numpy()).astype(np.float32)
    # per-dim round-trip error ≤ scale/2 (+ float eps)
    err = np.abs(qz.dequantize(qz.quantize(X)) - X)
    assert (err <= qz.scale / 2 + 1e-6).all()
    # recall@10 of quantized kNN vs exact ≥ 0.9 (usually ≈1.0)
    queries = X[:4].astype(np.float64)
    exact = knn_cosine(ds, queries, vector_col="embedding", id_col="vec_id", k=10)
    qds = quantize_embeddings(ds, qz, vector_col="embedding")
    approx = knn_cosine_quantized(qds, queries, qz, vector_col="qvec",
                                  id_col="vec_id", k=10)
    recs = []
    for qi in range(4):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recs.append(len(e & a) / len(e))
    assert np.mean(recs) >= 0.9, recs


def test_edit1_pairs_planted_typos(ray_session):
    """Planted substitution/deletion/insertion typos all surface at
    distance 1; an edit-2 string does not; exact dups at distance 0."""
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.editdist import edit1_pairs

    base = "the quick brown fox"
    rows = {
        0: base,
        1: base,                        # exact dup → dist 0
        2: "the quack brown fox",       # substitution → 1
        3: "the quick brwn fox",        # deletion → 1
        4: "the quick browns fox",      # insertion → 1
        5: "the qvack brwn fox",        # 3 edits from base
        6: "completely different words",
    }
    t = pa.table({"doc_id": pa.array(list(rows), type=pa.int64()),
                  "text": pa.array(list(rows.values()))})
    out = edit1_pairs(rd.from_arrow(t), text_col="text", id_col="doc_id",
                      max_len=32).to_pandas()
    got = {(a, b): d for a, b, d in
           zip(out.id_a, out.id_b, out.dist)}
    assert got[(0, 1)] == 0
    for other in (2, 3, 4):
        assert got[(0, other)] == 1 and got[(1, other)] == 1
    assert not any(5 in p or 6 in p for p in got)


def test_edit1_mask_kernel_cases():
    import numpy as np

    from featureextraction_jl_ray.stages.editdist import _edit1_mask

    a = np.array(["abc", "abc", "abc", "abc", "", "a", "abc"], dtype=object)
    b = np.array(["abc", "abd", "ab", "abcd", "x", "", "xbd"], dtype=object)
    want = [True, True, True, True, True, True, False]
    np.testing.assert_array_equal(_edit1_mask(a, b, 8), want)


def test_ivfpq_recall_and_disk_index(ray_session, tmp_path):
    """IVF-PQ (VERDICT r3 missing #3): the tight-cluster corpus (80
    near-duplicates per cluster, within-cluster cosine gaps below any
    8-byte code's resolution) is exactly the regime where the exact
    refine stage (IVFADC+R) is required — with it recall must be high;
    the pure-ADC disk-index path must agree with the pure-ADC in-memory
    path and store no vectors."""
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.similarity import (
        build_ivfpq_index,
        knn_cosine,
        knn_cosine_ivfpq,
    )

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((6, 32))
    rows, ids = [], []
    vid = 0
    for c in range(6):
        for _ in range(80):
            rows.append(centers[c] + rng.standard_normal(32) * 0.15)
            ids.append(vid)
            vid += 1
    tbl = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows],
                              type=pa.list_(pa.float64())),
    })
    ds = ray_session.data.from_arrow(tbl).repartition(4)
    Q = centers[:4] + rng.standard_normal((4, 32)) * 0.05

    exact = knn_cosine(ds, Q, vector_col="embedding", id_col="vec_id", k=10)
    # raw dataset in → auto-refined (ADC shortlist, exact re-rank)
    approx = knn_cosine_ivfpq(ds, Q, vector_col="embedding", id_col="vec_id",
                              k=10, n_clusters=6, m=8, nprobe=2)
    recall = np.mean([
        len(set(exact[exact.query_id == q].vec_id)
            & set(approx[approx.query_id == q].vec_id)) / 10
        for q in range(4)
    ])
    assert recall >= 0.9, recall

    # pure ADC: on-disk hive-partitioned index == in-memory index
    idx_mem = build_ivfpq_index(ds, vector_col="embedding", id_col="vec_id",
                                n_clusters=6, m=8,
                                materialize_in_memory=True)
    idx = build_ivfpq_index(ds, vector_col="embedding", id_col="vec_id",
                            n_clusters=6, m=8, path=str(tmp_path / "ivfpq"))
    adc_mem = knn_cosine_ivfpq(idx_mem, Q, vector_col="embedding",
                               id_col="vec_id", k=10, nprobe=2)
    adc_disk = knn_cosine_ivfpq(idx, Q, vector_col="embedding",
                                id_col="vec_id", k=10, nprobe=2)
    assert adc_disk[["query_id", "vec_id"]].equals(
        adc_mem[["query_id", "vec_id"]])
    # refine from the disk index with an explicit vector source
    refined = knn_cosine_ivfpq(idx, Q, vector_col="embedding",
                               id_col="vec_id", k=10, nprobe=2,
                               refine_ds=ds)
    assert refined[["query_id", "vec_id"]].equals(
        approx[["query_id", "vec_id"]])
    # the stored cells carry only (id, cell, m uint8 codes) — no vectors
    import pyarrow.parquet as pq

    stored = pq.read_table(str(tmp_path / "ivfpq"))
    assert "embedding" not in stored.schema.names
    assert stored.schema.field("pq_code").type == pa.list_(pa.uint8(), 8)


def test_ivfpq_pure_adc_recall_separable(ray_session):
    """Pure ADC (no refine) must already rank well when true neighbors
    are separable — 10 planted near-duplicates per query against a
    far-away background (the near-dup-retrieval regime)."""
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.similarity import (
        build_ivfpq_index,
        knn_cosine,
        knn_cosine_ivfpq,
    )

    rng = np.random.default_rng(7)
    qvecs = rng.standard_normal((4, 32))
    rows = [q + rng.standard_normal(32) * 0.03 for q in qvecs
            for _ in range(10)]                      # planted neighbors
    rows += list(rng.standard_normal((400, 32)) * 3)  # background
    tbl = pa.table({
        "vec_id": pa.array(range(len(rows)), type=pa.int64()),
        "embedding": pa.array([np.asarray(r).tolist() for r in rows],
                              type=pa.list_(pa.float64())),
    })
    ds = ray_session.data.from_arrow(tbl).repartition(4)
    idx = build_ivfpq_index(ds, vector_col="embedding", id_col="vec_id",
                            n_clusters=8, m=8, materialize_in_memory=True)
    exact = knn_cosine(ds, qvecs, vector_col="embedding", id_col="vec_id", k=10)
    adc = knn_cosine_ivfpq(idx, qvecs, vector_col="embedding",
                           id_col="vec_id", k=10, nprobe=4)
    recall = np.mean([
        len(set(exact[exact.query_id == q].vec_id)
            & set(adc[adc.query_id == q].vec_id)) / 10
        for q in range(4)
    ])
    assert recall >= 0.9, recall


def test_pq_roundtrip_error_bounded():
    """decode(encode(x)) must be close on clustered data — the
    quantization error that bounds ADC score drift."""
    import numpy as np

    from featureextraction_jl_ray.stages.similarity import (
        _normalize,
        fit_product_quantizer,
    )

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, 16))
    X = _normalize(np.repeat(centers, 50, axis=0)
                   + rng.standard_normal((250, 16)) * 0.1)
    pq_ = fit_product_quantizer(X, m=4, ksub=16, seed=1)
    Xr = pq_.decode(pq_.encode(X))
    # cosine between original and reconstruction stays high
    cos = (X * _normalize(Xr)).sum(axis=1)
    assert cos.mean() > 0.95 and cos.min() > 0.8


def test_grouped_skew_kurt_match_duckdb(ray_session, sf_dir):
    """Sample-adjusted G1 skewness / excess-G2 kurtosis from mergeable
    centered-moment partials (n, mean, M2, M3, M4) — vs DuckDB's
    skewness()/kurtosis(), including the NULL contract (n<3 / n<4 /
    zero variance) and invariance to partition count."""
    ev = f"{sf_dir}/events.parquet"
    for nparts in (2, 17):
        ds = ray_session.data.read_parquet(ev).repartition(nparts)
        got = grouped_aggregate(
            ds, ["event_type"],
            {"sk": ("value", "skew"), "ku": ("value", "kurt")},
            num_buckets=4,
        ).to_pandas().sort_values("event_type", ignore_index=True)
        want = duckdb.sql(
            f"SELECT event_type, skewness(value) sk, kurtosis(value) ku "
            f"FROM '{ev}' GROUP BY 1 ORDER BY 1"
        ).fetchdf()
        np.testing.assert_allclose(got.sk, want.sk, rtol=1e-9)
        np.testing.assert_allclose(got.ku, want.ku, rtol=1e-9)

    # edge groups: n=2 (skew+kurt NULL), n=3 (kurt NULL), constant (both NULL)
    import pandas as pd
    import ray as _ray

    edge = pd.DataFrame({
        "k": [0, 0, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3],
        "v": [1.0, 2.0, 1.0, 2.0, 4.0, 7.0, 7.0, 7.0, 7.0, 1.0, 3.0, 9.0, 27.0],
    })
    got = grouped_aggregate(
        _ray.data.from_pandas(edge).repartition(5), "k",
        {"sk": ("v", "skew"), "ku": ("v", "kurt")}, num_buckets=2,
    ).to_pandas().set_index("k").sort_index()
    want = duckdb.query_df(
        edge, "t",
        "SELECT k, skewness(v) sk, kurtosis(v) ku FROM t GROUP BY k ORDER BY k",
    ).df().set_index("k")
    np.testing.assert_allclose(got.sk, want.sk, rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(got.ku, want.ku, rtol=1e-9, equal_nan=True)


def test_kmeans_distributed_matches_inmemory_lloyd(ray_session):
    """Full-pass distributed Lloyd == in-memory NumPy Lloyd from the SAME
    init (sample_rows ≥ n ⇒ init is the deterministic id-sorted full-data
    fit), planted blobs recovered, centroids invariant to partition count."""
    import ray as _ray
    from featureextraction_jl_ray.stages.similarity import (
        _assign_to_centroids,
        _normalize,
        assign_clusters,
        kmeans_fit,
        kmeans_fit_distributed,
    )

    rng = np.random.default_rng(11)
    centers = np.eye(4, 8) * 9.0
    lab = rng.integers(0, 4, 2500)
    X = centers[lab] + rng.normal(0, 0.4, (2500, 8))
    df = pd.DataFrame({"vid": np.arange(2500), "emb": list(X.astype(np.float32))})

    got = kmeans_fit_distributed(
        _ray.data.from_pandas(df).repartition(9), "emb", 4,
        id_col="vid", iters=6, metric="cosine", sample_rows=10**9,
    )
    # reference: same init (full data, id-sorted), plain NumPy refinement
    Xf = np.stack(df.sort_values("vid")["emb"].to_numpy()).astype(np.float64)
    C = kmeans_fit(Xf, 4, seed=42)
    Xn = _normalize(Xf)
    for _ in range(6):
        a = _assign_to_centroids(Xn, C, "cosine")
        C_new = C.copy()
        for c in range(4):
            m = a == c
            if m.any():
                C_new[c] = Xn[m].mean(axis=0)
        C_new = _normalize(C_new)
        if np.abs(C_new - C).max() < 1e-6:
            C = C_new
            break
        C = C_new
    np.testing.assert_allclose(got, C, atol=1e-9)

    # partition invariance
    got2 = kmeans_fit_distributed(
        _ray.data.from_pandas(df).repartition(2), "emb", 4,
        id_col="vid", iters=6, metric="cosine", sample_rows=10**9,
    )
    np.testing.assert_allclose(got, got2, atol=1e-12)

    # planted blobs recovered: assignment purity ≈ 1
    out = assign_clusters(
        _ray.data.from_pandas(df), got, vector_col="emb", out_col="cl"
    ).to_pandas().sort_values("vid")
    tab = pd.crosstab(pd.Series(lab, name="lab"), out.cl.to_numpy())
    assert tab.max(axis=1).sum() / 2500 >= 0.99

    # l2 metric: distributed refinement == NumPy Lloyd from the same init
    # (planted-center recovery is init-dependent — Lloyd local optima —
    # so the oracle is step-for-step equivalence, not the global optimum)
    from featureextraction_jl_ray.stages.similarity import _lloyd

    got_l2 = kmeans_fit_distributed(
        _ray.data.from_pandas(df).repartition(5), "emb", 4,
        id_col="vid", iters=6, metric="l2", sample_rows=10**9,
    )
    C = _lloyd(Xf, 4, seed=42)
    for _ in range(6):
        a = _assign_to_centroids(Xf, C, "l2")
        C_new = C.copy()
        for c in range(4):
            m = a == c
            if m.any():
                C_new[c] = Xf[m].mean(axis=0)
        if np.abs(C_new - C).max() < 1e-6:
            C = C_new
            break
        C = C_new
    np.testing.assert_allclose(got_l2, C, atol=1e-9)


def test_embedding_outlier_scores(ray_session):
    """Planted off-centroid vector gets the lowest similarity in its
    group; scores match a NumPy whole-corpus reference; unknown keys
    raise loudly."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import (
        embedding_outlier_scores,
    )

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (2, 16))
    lab = rng.integers(0, 2, 400)
    X = base[lab] + rng.normal(0, 0.05, (400, 16))
    X[7] = -base[lab[7]] * 3.0  # the planted outlier, anti-aligned
    df = pd.DataFrame({"vid": np.arange(400), "grp": lab,
                       "emb": list(X.astype(np.float32))})
    out = embedding_outlier_scores(
        _ray.data.from_pandas(df).repartition(6), key_col="grp",
        vector_col="emb", id_col="vid",
    ).to_pandas().sort_values("vid", ignore_index=True)

    Xd = np.stack(df.emb.to_numpy()).astype(np.float64)
    want = np.empty(400)
    for g in (0, 1):
        m = lab == g
        c = Xd[m].mean(axis=0)
        want[m] = (Xd[m] @ c) / (np.linalg.norm(Xd[m], axis=1) * np.linalg.norm(c))
    np.testing.assert_allclose(out.centroid_sim, want, atol=1e-9)
    assert out.loc[out.grp == lab[7], "centroid_sim"].idxmin() == 7

    # loud max_keys guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_keys"):
        embedding_outlier_scores(
            _ray.data.from_pandas(df), key_col="vid", vector_col="emb",
            id_col="vid", max_keys=10,
        )


def test_set_jaccard_pairs(ray_session):
    """Per-key value sets spread across blocks still assemble exactly;
    result equals a brute-force reference; guards fire loudly."""
    import ray as _ray

    from featureextraction_jl_ray.stages.minhash import set_jaccard_pairs

    rng = np.random.default_rng(9)
    keys, vals = [], []
    sets = {k: set(rng.choice(20, size=rng.integers(2, 8), replace=False))
            for k in range(30)}
    for k, s in sets.items():
        for v in s:
            # duplicate occurrences on purpose — the op must distinct them
            for _ in range(rng.integers(1, 4)):
                keys.append(k)
                vals.append(f"item{v}")
    df = pd.DataFrame({"k": np.array(keys, dtype=np.int64), "v": vals})
    df = df.sample(frac=1.0, random_state=0, ignore_index=True)  # scatter
    got = set_jaccard_pairs(
        _ray.data.from_pandas(df).repartition(7), key_col="k", value_col="v",
        threshold=0.4, num_buckets=8,
    ).to_pandas().sort_values(["key_a", "key_b"], ignore_index=True)

    want = {}
    for a in range(30):
        for b in range(a + 1, 30):
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.4:
                want[(a, b)] = j
    assert set(zip(got.key_a, got.key_b)) == set(want)
    for _, r in got.iterrows():
        assert abs(r.jaccard - want[(r.key_a, r.key_b)]) < 1e-12

    with pytest.raises(ValueError, match="max_set"):
        set_jaccard_pairs(_ray.data.from_pandas(df), key_col="k",
                          value_col="v", max_set=3).to_pandas()

    # max_df drops a degenerate shared value instead of exploding pairs
    df2 = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": "common"})
    out2 = set_jaccard_pairs(_ray.data.from_pandas(df2), key_col="k",
                             value_col="v", threshold=0.1, max_df=10,
                             num_buckets=4).to_pandas()
    assert len(out2) == 0


def test_ivf_refined_centroids_improve_and_stay_exact(ray_session, tmp_path):
    """build_ivf_index(refine_iters>0) trains cells on the full corpus;
    exhaustive-probe kNN stays exactly brute force regardless of
    centroid quality (probe-pruning invariant)."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import (
        build_ivf_index,
        knn_cosine,
        knn_cosine_ivf,
    )

    rng = np.random.default_rng(21)
    X = rng.normal(0, 1, (800, 12)).astype(np.float32)
    df = pd.DataFrame({"vid": np.arange(800, dtype=np.int64), "emb": list(X)})
    ds = _ray.data.from_pandas(df).repartition(4)
    idx = build_ivf_index(ds, vector_col="emb", id_col="vid", n_clusters=6,
                          refine_iters=4, path=str(tmp_path / "ivf"))
    q = rng.normal(0, 1, (3, 12))
    got = knn_cosine_ivf(idx, q, vector_col="emb", id_col="vid", k=5,
                         nprobe=6)
    want = knn_cosine(ds, q, vector_col="emb", id_col="vid", k=5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True)[["query_id", "vid"]],
        want.reset_index(drop=True)[["query_id", "vid"]])


def test_random_projection_jl_property(ray_session):
    """Projection == X @ R (GEMM parity with the seeded matrix);
    pairwise distances distort within the JL bound at this out_dim;
    deterministic across partitionings and runs."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import random_projection

    rng = np.random.default_rng(31)
    X = rng.normal(0, 1, (300, 64)).astype(np.float32)
    df = pd.DataFrame({"vid": np.arange(300, dtype=np.int64),
                       "emb": list(X)})
    out = random_projection(_ray.data.from_pandas(df).repartition(5),
                            vector_col="emb", out_dim=32, seed=7
                            ).to_pandas().sort_values("vid", ignore_index=True)
    Z = np.stack(out.emb_rp32.to_numpy()).astype(np.float64)
    R = np.random.default_rng(7).standard_normal((64, 32)) / np.sqrt(32)
    np.testing.assert_allclose(Z, X.astype(np.float64) @ R, atol=1e-6)

    # JL distortion on 200 random pairs at out_dim=32: generous 0.6 bound
    ia = rng.integers(0, 300, 200)
    ib = rng.integers(0, 300, 200)
    keep = ia != ib
    d_in = np.linalg.norm(X[ia[keep]] - X[ib[keep]], axis=1).astype(np.float64)
    d_out = np.linalg.norm(Z[ia[keep]] - Z[ib[keep]], axis=1)
    ratio = d_out / d_in
    assert 0.4 < ratio.min() and ratio.max() < 1.6

    out2 = random_projection(_ray.data.from_pandas(df).repartition(2),
                             vector_col="emb", out_dim=32, seed=7
                             ).to_pandas().sort_values("vid", ignore_index=True)
    np.testing.assert_array_equal(
        np.stack(out.emb_rp32.to_numpy()), np.stack(out2.emb_rp32.to_numpy()))


def test_semdedup_planted_cluster_dups(ray_session):
    """SemDeDup: within-cluster near-dups collapse; the survivor under
    the paper's rule is the component member least similar to its
    centroid; distinct members and other clusters are untouched."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import semdedup

    rng = np.random.default_rng(5)
    d = 16

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    a = np.zeros(d); a[0] = 1.0
    b = np.zeros(d); b[1] = 1.0
    # cluster A: two near-identical vectors + one distinct-enough vector
    v0 = unit(a + 0.01 * rng.standard_normal(d))          # dup pair…
    v1 = unit(v0 + 0.005 * rng.standard_normal(d))        # …cos > 0.99
    far = np.zeros(d); far[0] = 1.0; far[2] = 0.9
    v2 = unit(far)                                        # cos(v0,v2) ~ 0.74
    # cluster B: two distinct vectors
    v3 = unit(b + 0.01 * rng.standard_normal(d))
    v4 = unit(b + np.array([0.0, 0.0, 0.0, 0.8] + [0.0] * (d - 4)))
    df = pd.DataFrame({"vid": [0, 1, 2, 3, 4],
                       "emb": [list(v) for v in (v0, v1, v2, v3, v4)]})
    ds = _ray.data.from_pandas(df)
    kept = semdedup(ds, vector_col="emb", id_col="vid", n_clusters=2,
                    tau=0.95, iters=3, seed=3, num_buckets=4)
    got = sorted(r["vid"] for r in kept.take_all())
    # exactly one of {0, 1} dropped; 2, 3, 4 survive
    assert len(got) == 4
    assert 2 in got and 3 in got and 4 in got
    assert (0 in got) != (1 in got)
    # paper rule: survivor = lower cosine to the cluster centroid
    from featureextraction_jl_ray.stages.similarity import (
        _normalize,
        assign_clusters,
        kmeans_fit_distributed,
    )
    C = kmeans_fit_distributed(ds, "emb", 2, iters=3, seed=3,
                               metric="cosine")
    Cn = _normalize(C.astype(np.float64))
    cl = {r["vid"]: r["c"] for r in assign_clusters(
        ds, C, vector_col="emb", out_col="c").take_all()}
    sims = {i: float(unit(v) @ Cn[cl[i]]) for i, v in
            ((0, v0), (1, v1))}
    want_survivor = min(sims, key=lambda i: (sims[i], i))
    assert want_survivor in got

    # min_id rule: survivor is vid 0 regardless of centroid distance
    kept2 = semdedup(ds, vector_col="emb", id_col="vid", n_clusters=2,
                     tau=0.95, keep="min_id", iters=3, seed=3,
                     num_buckets=4)
    got2 = sorted(r["vid"] for r in kept2.take_all())
    assert 0 in got2 and 1 not in got2 and len(got2) == 4

    # cluster_col passthrough keeps the assignment column
    kept3 = semdedup(ds, vector_col="emb", id_col="vid", n_clusters=2,
                     tau=0.95, iters=3, seed=3, num_buckets=4,
                     cluster_col="cl")
    assert "cl" in kept3.schema().names


def test_semdedup_cluster_size_guard(ray_session):
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import semdedup

    rng = np.random.default_rng(6)
    df = pd.DataFrame({"vid": range(8),
                       "emb": [list(rng.standard_normal(8)) for _ in range(8)]})
    ds = _ray.data.from_pandas(df)
    with pytest.raises(Exception, match="max_cluster_rows|n_clusters"):
        semdedup(ds, vector_col="emb", id_col="vid", n_clusters=1,
                 iters=1, seed=1, num_buckets=2,
                 max_cluster_rows=2).materialize()


def test_embedding_decontaminate_flag_filter_and_cap(ray_session):
    """Semantic decontamination: planted near-benchmark vector flags,
    orthogonal ones don't; filter mode drops; loud benchmark cap."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import (
        embedding_decontaminate,
    )

    d = 8
    b1 = np.zeros(d); b1[0] = 1.0
    bench = pd.DataFrame({"vid": [100], "emb": [list(b1)]})
    close = b1 + 0.01 * np.arange(d)          # cos ~ 0.999
    ortho = np.zeros(d); ortho[1] = 1.0
    train = pd.DataFrame({"vid": [1, 2],
                          "emb": [list(close), list(ortho)]})
    tds = _ray.data.from_pandas(train)
    bds = _ray.data.from_pandas(bench)
    out = embedding_decontaminate(
        tds, bds, vector_col="emb", id_col="vid",
        threshold=0.95).to_pandas().sort_values("vid", ignore_index=True)
    assert out.contaminated.tolist() == [True, False]
    assert out.max_benchmark_cosine.iloc[0] > 0.99
    # filter mode drops the contaminated row, keeps schema + score col
    kept = embedding_decontaminate(
        tds, bds, vector_col="emb", id_col="vid", threshold=0.95,
        mode="filter").to_pandas()
    assert kept.vid.tolist() == [2]
    assert "contaminated" not in kept.columns
    # empty benchmark: nothing flags
    ebds = _ray.data.from_pandas(bench.iloc[:0])
    out2 = embedding_decontaminate(
        tds, ebds, vector_col="emb", id_col="vid").to_pandas()
    assert (~out2.contaminated).all()
    # loud cap
    with pytest.raises(Exception, match="max_benchmark_rows"):
        embedding_decontaminate(
            tds, bds, vector_col="emb", id_col="vid",
            max_benchmark_rows=0).materialize()


def test_embedding_cross_filter_planted(ray_session):
    """Cross-dedup A against B: A rows near a B vector drop; within-A
    near-dups and A rows far from B survive; empty-pair fast path."""
    import ray as _ray

    from featureextraction_jl_ray.stages.similarity import (
        embedding_cross_filter,
    )

    d = 16

    def unit(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    e0 = np.zeros(d); e0[0] = 1.0
    e1 = np.zeros(d); e1[1] = 1.0
    e2 = np.zeros(d); e2[2] = 1.0
    rng = np.random.default_rng(41)
    a_rows = pd.DataFrame({
        "vid": [1, 2, 3, 4],
        "emb": [list(unit(e0 + 0.01 * rng.standard_normal(d))),  # ~B:100
                list(unit(e1)),                                   # within-A twin
                list(unit(e1 + 0.01 * rng.standard_normal(d))),   # within-A twin
                list(unit(e2))],                                  # far from all
    })
    b_rows = pd.DataFrame({"vid": [100], "emb": [list(unit(e0))]})
    a = _ray.data.from_pandas(a_rows)
    b = _ray.data.from_pandas(b_rows)
    kept = embedding_cross_filter(a, b, vector_col="emb", id_col="vid",
                                  threshold=0.95, num_buckets=4)
    got = sorted(r["vid"] for r in kept.take_all())
    # vid 1 condemned by B; the within-A twins 2/3 BOTH survive
    assert got == [2, 3, 4]
    # no near-dups at all -> A passes through untouched
    far_b = _ray.data.from_pandas(
        pd.DataFrame({"vid": [200],
                      "emb": [list(unit(np.ones(d)))]}))
    kept2 = embedding_cross_filter(a, far_b, vector_col="emb",
                                   id_col="vid", threshold=0.999,
                                   num_buckets=4)
    assert kept2.count() == 4


# ---------------------------------------------------------------------------
# greedy k-center diversity sampling (kcenter_fit)
# ---------------------------------------------------------------------------

def _blobs(rng, centers, per=40, scale=0.02):
    X = np.concatenate([c + rng.normal(0, scale, (per, len(c)))
                        for c in centers])
    return X


def test_greedy_kcenter_picks_one_per_separated_blob():
    from featureextraction_jl_ray.stages.similarity import greedy_kcenter

    rng = np.random.default_rng(3)
    centers = np.eye(4) * 5.0  # far-apart blob means in 4D
    X = _blobs(rng, centers)
    sel = greedy_kcenter(X, 4, metric="l2")
    # each selected point belongs to a distinct blob
    blobs = set((sel // 40).tolist())
    assert blobs == {0, 1, 2, 3}
    # determinism + tie contract
    sel2 = greedy_kcenter(X, 4, metric="l2")
    np.testing.assert_array_equal(sel, sel2)


def test_kcenter_fit_single_block_equals_inmemory(ray_session):
    import ray as _r
    from featureextraction_jl_ray.stages.similarity import (
        greedy_kcenter, kcenter_fit, _kcenter_start)

    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (120, 6))
    ids = np.arange(1000, 1120)
    t = pa.table({"vid": ids,
                  "vec": pa.array([r.tolist() for r in X],
                                  pa.list_(pa.float64()))})
    ds = _r.data.from_arrow(t)  # one block: pool == full data
    C, cids = kcenter_fit(ds, "vec", 7, id_col="vid", metric="l2")
    start = _kcenter_start(ids, len(X), 42)
    want = greedy_kcenter(X, 7, "l2", start)
    np.testing.assert_array_equal(cids, ids[want])
    np.testing.assert_allclose(C, X[want])


def test_kcenter_fit_multiblock_and_compose_covers_blobs(ray_session):
    import ray as _r
    from featureextraction_jl_ray.stages.similarity import (
        assign_clusters, kcenter_fit)

    rng = np.random.default_rng(9)
    means = np.eye(5) * 4.0
    X = _blobs(rng, means, per=60)
    perm = rng.permutation(len(X))  # blobs spread across blocks
    X = X[perm]
    t = pa.table({"vid": np.arange(len(X)),
                  "vec": pa.array([r.tolist() for r in X],
                                  pa.list_(pa.float64()))})
    ds = _r.data.from_arrow(t).repartition(6)
    # max_pool=8 < 6 blocks × 5 = 30 local centers → compose path runs
    C, cids = kcenter_fit(ds, "vec", 5, id_col="vid", metric="l2",
                          max_pool=8)
    assert len(C) == 5 and len(cids) == 5
    # the 5 centers land in 5 DISTINCT blobs (nearest blob mean)
    blob_of = np.linalg.norm(C[:, None, :] - means[None], axis=2).argmin(1)
    assert len(set(blob_of.tolist())) == 5
    # and every corpus row is within a blob radius of its center
    out = assign_clusters(ds, C, vector_col="vec", out_col="c",
                          dist_col="d", metric="l2").to_pandas()
    assert out["d"].max() < 1.0  # blob diameter ≪ inter-blob distance 4+


def test_kcenter_fit_k_exceeds_rows(ray_session):
    import ray as _r
    from featureextraction_jl_ray.stages.similarity import kcenter_fit

    t = pa.table({"vid": [1, 2, 3],
                  "vec": pa.array([[0.0, 1], [1, 0], [1, 1]],
                                  pa.list_(pa.float64()))})
    C, cids = kcenter_fit(_r.data.from_arrow(t), "vec", 10, id_col="vid",
                          metric="l2")
    assert len(C) == 3 and set(cids.tolist()) == {1, 2, 3}
