"""LAION-style image–caption PAIR curation — the multimodal corpus
funnel a text-to-image training set goes through before training:

1. **image quality gates** (:class:`~..stages.codec.SharpnessStats`):
   drop blurry (low variance-of-Laplacian) and exposure-clipped images
   — block-local, pixels never leave their block;
2. **caption gates** (:class:`~..stages.text.TokenStats`): drop pairs
   whose caption has fewer than ``min_caption_tokens`` whitespace
   tokens — block-local;
3. **perceptual near-dup collapse**
   (:func:`~..stages.dedup.hamming_dedup` on the phash column, Hamming
   ≤ ``max_distance``): one representative per visual-duplicate
   cluster, AFTER the quality gates so the exchange pays on the
   (smaller) surviving corpus and a filtered-out min-id duplicate can't
   shadow its surviving twin.

Stage order is load-bearing (filter → dedup, the ``corpus_filter`` /
``run_embedding_prep`` pattern): dedup-first would collapse a cluster
to its min-id member and then lose the WHOLE cluster when that one
member fails a quality gate — curation keeps the best surviving copy
instead.  Only stage 3 exchanges, and it ships (hash, id) pairs — the
image bytes never shuffle.

The real system computes the hash from pixels
(:class:`~..stages.codec.HashImages`, ``compute_hash="phash"``); the
default uses the table's precomputed ``phash`` column (the
north-rule contract) and keeps the decode out of the funnel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.codec import HashImages, SharpnessStats
from ..stages.dedup import hamming_dedup
from ..stages.text import TokenStats

__all__ = ["run_pair_curation"]


def run_pair_curation(images, *, id_col: str = "image_id",
                      caption_col: str = "caption",
                      hash_col: str = "phash",
                      compute_hash: str | None = None,
                      min_caption_tokens: int = 2,
                      blur_threshold: float = 100.0,
                      clip_threshold: float = 0.3,
                      max_distance: int = 3,
                      num_buckets: int = 64,
                      max_pairs: int = 10_000_000):
    """images(+captions) table → curated pairs Dataset (one row per
    kept pair, bytes dropped, quality columns attached)."""
    quality = images.map_batches(
        SharpnessStats(blur_threshold, clip_threshold, drop_bytes=False),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)
    if compute_hash is not None:
        quality = quality.map_batches(
            HashImages(methods=(compute_hash,), drop_bytes=True,
                       prefix="computed_"),
            batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)
        hash_col = f"computed_{compute_hash}"
    else:
        quality = quality.map_batches(
            lambda t: t.drop_columns(["bytes"]),
            batch_format="pyarrow", zero_copy_batch=True)
    tokens = quality.map_batches(
        TokenStats(text_col=caption_col), batch_format="pyarrow",
        zero_copy_batch=True)

    def gates(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.invert(t.column("flag_blurry")),
                    pc.invert(t.column("flag_clipped"))),
            pc.greater_equal(t.column("n_tokens_ws"),
                             min_caption_tokens))
        return t.filter(keep)

    alive = tokens.map_batches(gates, batch_format="pyarrow",
                               zero_copy_batch=True)
    kept, _ = hamming_dedup(alive, hash_col, id_col,
                            max_distance=max_distance,
                            num_buckets=num_buckets, max_pairs=max_pairs,
                            return_pairs="dataset")
    return kept
