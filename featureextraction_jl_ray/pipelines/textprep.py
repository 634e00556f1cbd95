"""Composed text-preparation pipeline — the document-side counterpart of
the image flagship (task brief: what a training-data pipeline runs over a
raw document corpus before tokenization):

    documents ─ exact dedup (salted, keep min doc_id per text)
              ─ near-dup collapse (exact n-gram Jaccard inverted index →
                connected components, min id per cluster)
              ─ language-ID + token counts + quality ratios (stateless
                vectorized stages)
              → curated corpus with per-doc features

Every stage is individually driver-oracled; the composition is oracled
END-TO-END by one chained SQL (dedup QUALIFY → shingle self-join →
recursive component CTE → stopword-hit lang CASE → stats expressions),
so a wrong interaction between stages — not just a wrong stage — fails
the gate.
"""

from __future__ import annotations

__all__ = ["run_text_prep"]


def run_text_prep(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    num_buckets: int = 32,
):
    """documents Dataset → (curated Dataset, near-dup pairs DataFrame)."""
    from ..stages.dedup import exact_dedup
    from ..stages.minhash import jaccard_dedup
    from ..stages.text import with_langid, with_quality, with_token_stats

    ds = exact_dedup(ds, [text_col], order_cols=[id_col],
                     num_salts=4, num_buckets=num_buckets)
    kept, pairs = jaccard_dedup(ds, text_col=text_col, id_col=id_col,
                                threshold=jaccard_threshold,
                                num_buckets=num_buckets)
    out = with_langid(kept, text_col=text_col)
    out = with_token_stats(out, text_col=text_col)
    out = with_quality(out, text_col=text_col)
    return out, pairs
