"""Composed corpus-hygiene pipeline: the LLM pretraining pre-flight a
corpus goes through right before tokenization — test-set
DECONTAMINATION (drop every doc sharing a word n-gram with the
benchmark suite), DATA MIXING (downsample sources to the target mixture
over the SURVIVING corpus), then PII REDACTION on what ships.

Stage ORDER is load-bearing and the composed oracle locks it: mixture
rates must be computed on the post-decontamination counts (mixing first
under-fills any source the benchmark overlaps), and redaction runs last
so dropped rows never pay the regex pass.

Composed-oracle contract: the driver query mirrors all three stages in
ONE chained SQL, so wrong stage interactions fail the gate, not just
wrong stages.
"""

from __future__ import annotations

from ..stages.split import mixture_sample
from ..stages.text import decontaminate, with_pii_redact

__all__ = ["run_corpus_hygiene"]


def run_corpus_hygiene(train_ds, benchmark_ds, parts, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       group_col: str = "source", n: int = 8,
                       method: str = "exact"):
    """train documents → decontaminated, mixture-sampled, PII-scrubbed
    corpus (full schema + ``n_redactions``).

    The decontaminated set is MATERIALIZED before mixing:
    ``mixture_sample`` reads its input twice (count pass + filter pass),
    and pinning the blocks means the n-gram probe runs once, not twice —
    the ``with_global_rank`` multi-pass lesson applied here."""
    clean = decontaminate(train_ds, benchmark_ds, text_col=text_col,
                          id_col=id_col, n=n, method=method, mode="filter")
    clean = clean.materialize()
    mixed = mixture_sample(clean, group_col, id_col, parts)
    return with_pii_redact(mixed, text_col=text_col)
