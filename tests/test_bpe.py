"""Self-contained BPE tokenizer (VERDICT r3 missing #2): the distributed
fit must equal a naive single-process reference, encoding must
round-trip, and the BPE-budget chunker must obey its documented
capacity bound and reassemble to the whole document."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.bpe import (
    BPETokenizer,
    chunk_documents_bpe,
    fit_bpe,
    with_bpe_token_counts,
)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "quick quick brown foxes and lazy lazy dogs",
    "over the river and through the woods the fox goes",
    "dogs and foxes run through the brown woods",
] * 3


def _naive_fit(texts, num_merges, min_pair_count=2):
    """Straight-line reference: word counts in one dict, merge loop with
    the same deterministic tie-break (count desc, pair asc)."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    words = {w: tuple(w) for w in wc}
    merges = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + wc[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


def _corpus_ds(ray, parts=3):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(CORPUS), dtype=np.int64)),
                  "text": pa.array(CORPUS)})
    ).repartition(parts)


def test_fit_matches_naive_reference(ray_session):
    want = _naive_fit(CORPUS, num_merges=40)
    got = fit_bpe(_corpus_ds(ray_session), "text", num_merges=40).merges
    assert got == want and len(got) > 10


def test_fit_partition_invariant(ray_session):
    a = fit_bpe(_corpus_ds(ray_session, parts=2), "text", num_merges=25).merges
    b = fit_bpe(_corpus_ds(ray_session, parts=7), "text", num_merges=25).merges
    assert a == b


def test_encode_round_trip_and_compression():
    tok = BPETokenizer(_naive_fit(CORPUS, num_merges=60))
    for w in ["quick", "brown", "foxes", "through", "unseenword", "a", ""]:
        subs = tok.encode_word(w)
        assert "".join(subs) == w
    # frequent words compress below character count
    assert len(tok.encode_word("the")) == 1
    assert 1 <= len(tok.encode_word("quick")) < len("quick")


def test_merges_export_import_round_trip():
    """A fitted tokenizer serialized to GPT-2 merges.txt lines and
    re-imported must encode every word identically (word_prefix stays
    "" — from-scratch merges never contain the byte-level marker)."""
    tok = BPETokenizer(_naive_fit(CORPUS, num_merges=60))
    tok2 = BPETokenizer.from_merges_lines(tok.to_merges_lines())
    assert tok2.word_prefix == ""
    assert tok2.merges == tok.merges
    for w in ["quick", "brown", "foxes", "through", "unseen", "a", ""]:
        assert tok2.encode_word(w) == tok.encode_word(w)


def test_pretrained_merges_fixture_import(tmp_path):
    """Checked-in GPT-2-style fixture: the Ġ space marker is
    auto-detected and every word is encoded with it prepended, so the
    pretrained merge table actually fires."""
    import pathlib

    fx = pathlib.Path(__file__).parent / "fixtures" / "merges_small.txt"
    tok = BPETokenizer.from_merges_file(fx)
    assert tok.word_prefix == "Ġ"
    assert len(tok.merges) == 9
    assert tok.encode_word("the") == ["Ġthe"]
    assert tok.encode_word("lower") == ["Ġ", "lowe", "r"]
    assert tok.encode_word("dog") == ["Ġdog"]
    # unknown word falls back to marker + characters
    assert tok.encode_word("xyz") == ["Ġ", "x", "y", "z"]
    # explicit override disables the marker
    tok_raw = BPETokenizer.from_merges_file(fx, word_prefix="")
    assert tok_raw.encode_word("the") == ["t", "he"]


def test_chunk_documents_bpe_under_imported_vocab(ray_session):
    """The BPE-budget chunker's capacity bound and reassembly invariants
    hold under an IMPORTED pretrained merge table (word_prefix active),
    not just the from-scratch fit."""
    import pathlib

    fx = pathlib.Path(__file__).parent / "fixtures" / "merges_small.txt"
    tok = BPETokenizer.from_merges_file(fx)
    docs = CORPUS + ["the dog the dog the dog lower lower"]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                  "text": pa.array(docs)})
    ).repartition(4)
    size = 5
    out = chunk_documents_bpe(ds, tok, size=size).to_pandas()
    counter = tok.token_counter()
    max_word = max(counter(w) for d in docs for w in d.split())
    assert (out.n_tokens <= size + max_word - 1).all()
    for txt, n in zip(out.chunk_text, out.n_tokens):
        assert n == sum(counter(w) for w in txt.split())
    re = (out.sort_values(["doc_id", "chunk_id"])
          .groupby("doc_id").chunk_text.agg(" ".join))
    for i, d in enumerate(docs):
        assert re[i] == " ".join(d.split())


def test_token_counts_column(ray_session):
    tok = BPETokenizer(_naive_fit(CORPUS, num_merges=60))
    out = with_bpe_token_counts(_corpus_ds(ray_session), tok,
                                text_col="text").to_pandas()
    counter = tok.token_counter()
    for t, n in zip(out.text, out.n_bpe_tokens):
        assert n == sum(counter(w) for w in t.split())


def test_chunk_documents_bpe_capacity_and_reassembly(ray_session):
    tok = BPETokenizer(_naive_fit(CORPUS, num_merges=60))
    docs = CORPUS + ["", "   ", "one two three four five six seven eight"]
    ds = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
                  "text": pa.array(docs)})
    ).repartition(4)
    size = 6
    out = chunk_documents_bpe(ds, tok, size=size).to_pandas()
    counter = tok.token_counter()
    max_word = max(counter(w) for d in docs for w in d.split())
    # capacity bound of the watermark relaxation
    assert (out.n_tokens <= size + max_word - 1).all()
    # n_tokens is the true BPE count of the chunk text
    for txt, n in zip(out.chunk_text, out.n_tokens):
        assert n == sum(counter(w) for w in txt.split())
    # chunks reassemble to the whole doc, in chunk_id order
    re = (out.sort_values(["doc_id", "chunk_id"])
          .groupby("doc_id").chunk_text.agg(" ".join))
    for i, d in enumerate(docs):
        want = " ".join(d.split())
        if want:
            assert re[i] == want
        else:
            assert i not in re.index  # empty/ws-only docs emit no chunks
    # chunk ids are dense per doc
    for _, g in out.groupby("doc_id"):
        assert sorted(g.chunk_id) == list(range(len(g)))
