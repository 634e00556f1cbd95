"""Composed INCREMENTAL corpus refresh — the nightly loop of a
production corpus at 100 TB, where re-processing everything is off the
table: diff the new snapshot against the previous one, re-process ONLY
the added/changed documents, and drop any whose (new) content the
historical fingerprint store has already seen.

Stage order is load-bearing and the composed oracle locks it:

1. ``snapshot_diff`` (stages/diff.py) — one tagged-union exchange on
   the key hash finds added / changed / removed rows; everything
   unchanged is discarded HERE, so downstream cost is delta-sized.
2. keep additions + changes (removals are a metadata event, not work).
3. ``dedup_against_store`` (stages/fpstore.py) — the delta probes the
   historical content store partition-locally; a "changed" doc whose
   new text duplicates any historical document is dropped (content
   already represented), the store itself never moves.

Returns the surviving (key, change, new content) rows — the work list
for the downstream feature pipeline.  The companion store update
(``fingerprint_store_update`` on the survivors) is the caller's
post-processing commit, deliberately not fused here: updating before
the downstream pipeline succeeds would poison the next night's probe.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.diff import snapshot_diff
from ..stages.fpstore import dedup_against_store

__all__ = ["run_incremental_refresh"]


def run_incremental_refresh(old_ds, new_ds, store_dir: str, *,
                            key_col: str, content_col: str,
                            num_buckets: int = 64, seed: int = 0):
    """Delta-only refresh work list; see module docstring."""
    delta = snapshot_diff(old_ds, new_ds, key_col,
                          compare_cols=content_col,
                          num_buckets=num_buckets)

    new_content = f"new_{content_col}"

    def keep_work(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(t.column("change"), "removed")
        t = t.filter(keep)
        # carry the NEW content forward under the content column's name
        return pa.table({
            key_col: t.column(key_col),
            "change": t.column("change"),
            content_col: t.column(new_content),
        })

    work = delta.map_batches(keep_work, batch_format="pyarrow",
                             zero_copy_batch=True)
    return dedup_against_store(work, store_dir, content_col,
                               num_buckets=num_buckets, seed=seed)
