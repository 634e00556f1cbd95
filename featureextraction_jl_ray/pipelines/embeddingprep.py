"""Composed EMBEDDING corpus-prep funnel: per-group outlier filter →
embedding-cosine near-dup collapse.

Stage ORDER is the contract (and what the chained oracle locks): the
outlier filter runs FIRST, so a junk row can never survive as the
representative of a near-dup cluster while its clean partner gets
collapsed away — dedup-then-filter would do exactly that (pytest plants
the case).  Mirrors ``run_corpus_hygiene``'s shape on the vector side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["run_embedding_prep"]


def run_embedding_prep(
    ds,
    *,
    vector_col: str,
    id_col: str,
    key_col: str,
    sim_threshold: float = 0.0,
    dedup_threshold: float = 0.8,
    bands: int = 8,
    planes_per_band: int = 8,
    num_buckets: int = 16,
    round_decimals: int | None = 6,
):
    """outlier-filter → near-dup-collapse over an embedding table.

    1. :func:`embedding_outlier_scores` attaches cosine-to-own-group-
       centroid; rows below ``sim_threshold`` drop (scores rounded to
       ``round_decimals`` BEFORE the compare so an SQL mirror filters
       the identical set — ulp-near-threshold rows round the same way
       on both sides).
    2. :func:`embedding_dedup` collapses cosine ≥ ``dedup_threshold``
       clusters to the min-id representative among SURVIVORS.

    Returns (kept_ds, pairs) — pairs per ``dedup.pairs_to_result``.
    Vectors ride only the stages that need them; the filter is
    stateless after one bounded centroid fit.
    """
    from ..stages.similarity import embedding_dedup, embedding_outlier_scores

    scored = embedding_outlier_scores(
        ds, key_col=key_col, vector_col=vector_col, id_col=id_col,
        num_buckets=num_buckets, keep_vector=True)

    def flt(t: pa.Table) -> pa.Table:
        s = t.column("centroid_sim").to_numpy(zero_copy_only=False)
        if round_decimals is not None:
            s = np.round(s, round_decimals)
            t = t.set_column(t.schema.get_field_index("centroid_sim"),
                             "centroid_sim", pa.array(s))
        return t.filter(pa.array(s >= sim_threshold))

    # vectors ride the scoring output (keep_vector) so the filter needs
    # no re-join — Acero can't carry list payloads through a hash join
    # anyway, and a semi-join would be a second exchange
    survivors = scored.map_batches(flt, batch_format="pyarrow",
                                   zero_copy_batch=True)
    kept, pairs = embedding_dedup(
        survivors, vector_col=vector_col, id_col=id_col,
        threshold=dedup_threshold, bands=bands,
        planes_per_band=planes_per_band)
    return kept, pairs
