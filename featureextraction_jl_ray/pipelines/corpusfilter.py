"""Composed corpus-filter pipeline: the end-to-end document quality
funnel a pretraining corpus goes through — exact dedup, a corpus-fitted
char-bigram LM score (fitted on the DEDUPED corpus, as production does:
duplicates would bias the model), language ID, token counts and
repetition signals, then one vectorized threshold filter.

Composed-oracle contract: the driver query mirrors every stage in ONE
chained SQL, so wrong stage INTERACTIONS (e.g. fitting the LM before
dedup) fail the gate, not just wrong stages.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.dedup import exact_dedup
from ..stages.text import (
    fit_char_bigram_lm,
    score_char_bigram_lm,
    with_langid,
    with_repetition_stats,
    with_token_stats,
)

__all__ = ["run_corpus_filter"]


def run_corpus_filter(ds, *, lang: str = "en", min_tokens: int = 15,
                      min_lm: float = -1.75, max_dup: float = 0.65):
    """documents ds → the surviving docs with their quality signals."""
    d = exact_dedup(ds, ["text"], order_cols=["doc_id"], num_salts=4,
                    num_buckets=32)
    logp = fit_char_bigram_lm(d)
    d = score_char_bigram_lm(d, logp)
    d = with_langid(d)
    d = with_token_stats(d)
    d = with_repetition_stats(d)

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.equal(t.column("lang_pred"), pa.scalar(lang)),
                    pc.greater_equal(t.column("n_tokens_ws"),
                                     pa.scalar(min_tokens))),
            pc.and_(pc.greater_equal(t.column("lm_score"), pa.scalar(min_lm)),
                    pc.less_equal(t.column("word_dup_ratio"),
                                  pa.scalar(max_dup))),
        )
        return t.filter(pc.fill_null(m, False))

    return d.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
