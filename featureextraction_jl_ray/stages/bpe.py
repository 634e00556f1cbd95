"""Self-contained byte-pair-encoding tokenizer (VERDICT r3 missing #2):
training-data pipelines budget text in BPE tokens, not whitespace
tokens, and no tokenizer library ships in this sandbox.

Scale shape (the Sennrich 2016 formulation — PAPERS.md): BPE merges
depend only on the *word → count* table, never on document order, so
the fit splits into

1. a DISTRIBUTED word count: per-block ``pc.value_counts`` partials
   (pre-aggregated before the exchange) → ``groupby(word).sum`` →
   deterministic top-``max_words`` cut (count desc, word asc — ties at
   the boundary cannot flap with partitioning), and
2. a DRIVER merge loop over that bounded table: O(max_words · merges)
   work on ≤ max_words rows, independent of corpus size — the same
   "driver holds O(model), never O(data)" contract as the char-bigram
   LM fit (text.py) and the PCA eigh.

Encoding is greedy lowest-rank pair merging with a per-task memo over
DISTINCT words (Zipf: a 20k-row batch typically holds < 3k distinct
words), so the hot path is one ``pd.Series.map`` per batch, not a
Python loop per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import split_ws_tokens

__all__ = ["BPETokenizer", "fit_bpe", "word_counts", "with_bpe_token_counts",
           "chunk_documents_bpe"]


def word_counts(ds, text_col: str = "text"):
    """Distributed (word, c) table over whitespace tokens — per-block
    ``value_counts`` partials keep the exchange at distinct-words-per-
    block rows, then one bounded groupby-sum."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(split_ws_tokens(
            pc.fill_null(batch.column(text_col), "")))
        if len(toks) == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        vc = toks.value_counts()
        return pa.table({"word": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
    out = partials.groupby("word").sum("c")
    return out.rename_columns(["word", "c"])


def _merge_loop(words: list[tuple[str, ...]], counts: np.ndarray,
                num_merges: int, min_pair_count: int) -> list[tuple[str, str]]:
    """Reference BPE merge loop over a bounded (word-symbols, count)
    vocab.  Deterministic: best pair = (max total count, then
    lexicographically smallest pair)."""
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in zip(words, counts):
            for i in range(len(w) - 1):
                p = (w[i], w[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(c)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _ = best
        ab = a + b
        merges.append((a, b))
        new_words = []
        for w in words:
            if a not in w:
                new_words.append(w)
                continue
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    return merges


@dataclass
class BPETokenizer:
    """Fitted merge table + greedy encoder (tiny: ships in task
    closures; a per-task memo over distinct words makes batch encoding
    one vectorized map).

    ``word_prefix`` supports PRETRAINED GPT-2-family merge tables
    (VERDICT r4 next-steps #5): byte-level BPE vocabularies mark a
    leading space as ``Ġ`` and their merges reference it, so an
    imported table only fires if each word is encoded with the marker
    prepended.  The from-scratch :func:`fit_bpe` keeps ``word_prefix=""``
    (its merges never contain the marker); import via
    :meth:`from_merges_lines` / :meth:`from_merges_file` auto-detects it."""

    merges: list = field(default_factory=list)
    word_prefix: str = ""

    def __post_init__(self):
        self.ranks = {tuple(m): r for r, m in enumerate(self.merges)}

    def to_merges_lines(self) -> list[str]:
        """Serialize to the huggingface/GPT-2 ``merges.txt`` line format
        (one ``A B`` pair per line, rank = line order, ``#``-comment
        header).  Round-trips through :meth:`from_merges_lines`."""
        return ["#version: 0.2"] + [f"{a} {b}" for a, b in self.merges]

    @classmethod
    def from_merges_lines(cls, lines, word_prefix: str | None = None):
        """Build a tokenizer from GPT-2-style merge lines: ``A B`` per
        line, rank = order; blank lines and ``#`` comments skipped.
        ``word_prefix=None`` auto-detects the byte-level space marker
        (``Ġ``): if any merge symbol starts with it, every word is
        encoded with the marker prepended, matching how a pretrained
        byte-level vocabulary counts leading-space tokens."""
        merges = []
        for ln in lines:
            ln = ln.rstrip("\n")
            if not ln.strip() or ln.startswith("#"):
                continue
            parts = ln.split(" ")
            if len(parts) != 2:
                raise ValueError(f"malformed merges line: {ln!r}")
            merges.append((parts[0], parts[1]))
        if word_prefix is None:
            word_prefix = "Ġ" if any(
                a.startswith("Ġ") for a, _ in merges) else ""
        return cls(merges, word_prefix=word_prefix)

    @classmethod
    def from_merges_file(cls, path, word_prefix: str | None = None):
        with open(path, encoding="utf-8") as f:
            return cls.from_merges_lines(f, word_prefix=word_prefix)

    def encode_word(self, word: str) -> list[str]:
        syms = list(self.word_prefix + word) if self.word_prefix else list(word)
        if len(syms) < 2:
            return syms
        while True:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                return syms
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            if len(syms) == 1:
                return syms

    def token_counter(self):
        """word → n_subtokens with a memo (per task / per actor)."""
        memo: dict[str, int] = {}

        def n_tokens(word: str) -> int:
            n = memo.get(word)
            if n is None:
                n = memo[word] = len(self.encode_word(word))
            return n

        return n_tokens


def fit_bpe(ds, text_col: str = "text", *, num_merges: int = 200,
            max_words: int = 50_000, min_pair_count: int = 2) -> BPETokenizer:
    """Fit BPE merges: distributed word count → deterministic
    top-``max_words`` cut → driver merge loop (see module docstring).
    The driver pull is ≤ max_words rows by construction."""
    wc = word_counts(ds, text_col)
    top = wc.sort(["c", "word"], descending=[True, False]).limit(max_words)
    df = top.to_pandas()
    words = [tuple(w) for w in df["word"].astype(str)]
    counts = df["c"].to_numpy(dtype=np.int64)
    keep = np.array([len(w) > 0 for w in words], dtype=bool)
    return BPETokenizer(_merge_loop(
        [w for w, k in zip(words, keep) if k], counts[keep],
        num_merges, min_pair_count))


def with_bpe_token_counts(ds, tokenizer: BPETokenizer, *,
                          text_col: str = "text",
                          out_col: str = "n_bpe_tokens"):
    """Append the BPE token count of each text — distinct-word memo per
    batch, vectorized map over the exploded token list."""

    def fn(batch: pa.Table) -> pa.Table:
        counter = tokenizer.token_counter()
        toks = split_ws_tokens(pc.fill_null(batch.column(text_col), ""))
        flat = pd.Series(pc.list_flatten(toks).to_numpy(zero_copy_only=False))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        per_word = flat.map(lambda w: counter(w) if w else 0).to_numpy(
            dtype=np.int64) if len(flat) else np.array([], dtype=np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        out = np.zeros(len(lens), dtype=np.int64)
        np.add.at(out, doc_of, per_word)
        return batch.append_column(out_col, pa.array(out, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents_bpe(ds, tokenizer: BPETokenizer, *,
                        text_col: str = "text", id_col: str = "doc_id",
                        size: int = 64, out_col: str = "chunk_text"):
    """Split documents into ≈``size``-BPE-token chunks of whole
    whitespace words — the BPE-budget form of :func:`chunk_documents`.

    Watermark relaxation (same as ``pack_chunks``): chunk ordinal =
    ``floor(bpe_tokens_before_word / size)`` per document, fully
    vectorized across the batch; a chunk holds ≤ size + max_word_tokens
    − 1 BPE tokens (asserted in pytest) and chunks concatenate back to
    the whole document.  An exact capacity cap would need a sequential
    per-word scan; the bounded overflow is the streaming-safe trade."""

    def fn(batch: pa.Table) -> pa.Table:
        counter = tokenizer.token_counter()
        toks = split_ws_tokens(pc.fill_null(batch.column(text_col), ""))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        trimmed = pc.utf8_length(pc.utf8_trim_whitespace(
            pc.fill_null(batch.column(text_col), ""))).to_numpy(
            zero_copy_only=False)
        lens = np.where(trimmed == 0, 0, lens)  # ws-only doc → 0 words
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        flat_all = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        # ws-only docs still contribute [''] to the flat array — rebuild
        # the flat view from the corrected lens via per-doc offsets
        true_lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        empty = pa.table({
            id_col: pa.array([], type=pa.from_numpy_dtype(ids.dtype)
                             if ids.dtype.kind in "iuf" else pa.string()),
            "chunk_id": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            out_col: pa.array([], type=pa.string()),
        })
        if int(lens.sum()) == 0:
            return empty
        doc_of = np.repeat(np.arange(len(ids)), lens)
        starts = np.cumsum(true_lens) - true_lens
        within = (np.arange(len(doc_of), dtype=np.int64)
                  - np.repeat(np.cumsum(lens) - lens, lens))
        flat = flat_all[starts[doc_of] + within]
        w = pd.Series(flat).map(lambda s: counter(s) if s else 0).to_numpy(
            dtype=np.int64)
        cum = np.cumsum(w) - w
        doc_first = np.cumsum(lens) - lens  # index of each doc's 1st word
        before = cum - np.repeat(cum[doc_first[lens > 0]], lens[lens > 0])
        k = before // size
        # group key = (doc, chunk): stable label per (doc_of, k)
        lab = doc_of * (int(k.max()) + 1 if len(k) else 1) + k
        s = pd.Series(flat)
        joined = s.groupby(lab).agg(" ".join)
        gdoc = pd.Series(doc_of).groupby(lab).first().to_numpy()
        gtok = pd.Series(w).groupby(lab).sum().to_numpy()
        # dense per-doc chunk ordinal: a word heavier than `size` makes
        # floor(before/size) skip values, so rank the (sorted) groups
        # within each doc instead of reusing k
        doc_starts = np.flatnonzero(np.r_[True, gdoc[1:] != gdoc[:-1]])
        seg_len = np.diff(np.append(doc_starts, len(gdoc)))
        dense = np.arange(len(gdoc), dtype=np.int64) - np.repeat(
            doc_starts, seg_len)
        return pa.table({
            id_col: pa.array(ids[gdoc]),
            "chunk_id": pa.array(dense, type=pa.int64()),
            "n_tokens": pa.array(gtok, type=pa.int64()),
            out_col: pa.array(joined.to_numpy(), type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
