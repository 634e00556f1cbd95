"""Composed C4-style cleaning pipeline — the public C4 (T5) corpus
rules as one streamed funnel over line-structured web text:

1. **within-page line dedup** (:class:`~..stages.text.LineDedup`):
   repeated lines inside a document (nav bars, banners, footers) drop,
   first occurrence survives — block-local, no exchange;
2. **line filter** (:class:`~..stages.text.LineFilter`): keep lines
   ending in terminal punctuation with ≥ ``min_words`` words —
   block-local;
3. **document drop**: documents with fewer than ``min_lines`` surviving
   lines leave the corpus;
4. **corpus-level exact dedup** on the CLEANED text (C4 dedups at
   corpus scale after cleaning): skew-safe two-stage salted reduce,
   survivor = smallest ``id_col``.

Stage ORDER is load-bearing and the composed oracle locks it: filtering
before the within-page dedup would keep punct-terminated boilerplate
repeats; deduping the corpus on RAW text would miss documents that
clean to identical text.  Only stage 4 shuffles — 1–3 stream
block-locally, so the funnel's exchange pays on the (smaller)
post-filter corpus.
"""

from __future__ import annotations

from ..stages.dedup import exact_dedup
from ..stages.text import LineDedup, LineFilter

__all__ = ["run_c4_clean"]


def run_c4_clean(ds, *, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 3, min_lines: int = 1, sep: str = "\n",
                 out_col: str = "text_clean", num_buckets: int = 64):
    """line-structured documents → cleaned, line- and corpus-deduped
    corpus with ``out_col`` (cleaned text) and ``n_lines_kept``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    deduped = ds.map_batches(
        LineDedup(text_col=text_col, sep=sep, count=False),
        batch_format="pyarrow", zero_copy_batch=True)
    filtered = deduped.map_batches(
        LineFilter(text_col=text_col, out_col=out_col, min_words=min_words,
                   sep=sep),
        batch_format="pyarrow", zero_copy_batch=True)

    def keep_docs(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("n_lines_kept"),
                                         min_lines))

    alive = filtered.map_batches(keep_docs, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return exact_dedup(alive, out_col, order_cols=id_col,
                       num_buckets=num_buckets)
