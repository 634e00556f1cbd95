"""Composed image corpus-prep funnel — the image-side analog of the
text `corpusfilter` pipeline:

    resize to the model input size → per-image quality stats/flags
      → drop dark / bright / low-contrast frames
      → phash near-dup collapse (exact-collapse + Hamming banding)
      → surviving images with their quality features

Every stage is an existing operator; the pipeline documents the
corpus-prep ORDER (filter before dedup: dropping junk first shrinks the
dedup problem — flags are per-row, dedup is the exchange).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.codec import resize_images, with_image_stats
from ..stages.dedup import hamming_dedup

__all__ = ["run_image_prep"]


def run_image_prep(images, *, out_w: int = 16, out_h: int = 16,
                   max_distance: int = 2):
    """images ds (image_id, bytes, w, h, fmt, phash) → (kept ds, pairs).

    ``kept`` carries the per-image quality stats of the surviving,
    flag-clean, near-dup-collapsed corpus."""
    resized = resize_images(images, out_w=out_w, out_h=out_h)
    stats = with_image_stats(resized, drop_bytes=True)

    def clean(t: pa.Table) -> pa.Table:
        bad = pc.or_(pc.or_(t.column("flag_dark"), t.column("flag_bright")),
                     t.column("flag_low_contrast"))
        return t.filter(pc.invert(pc.fill_null(bad, True)))

    clean_ds = stats.map_batches(clean, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def to_int_id(t: pa.Table) -> pa.Table:
        col = t.column("image_id")
        ent = pc.cast(pc.utf8_slice_codeunits(col, 4, 9), pa.int64())
        seq = pc.cast(pc.utf8_slice_codeunits(col, 10, 14), pa.int64())
        iid = pc.add(pc.multiply(ent, pa.scalar(10_000, pa.int64())), seq)
        return t.append_column("iid", iid)

    with_iid = clean_ds.map_batches(to_int_id, batch_format="pyarrow",
                                    zero_copy_batch=True)
    kept, pairs = hamming_dedup(with_iid, "phash", "iid",
                                max_distance=max_distance)
    return kept, pairs
