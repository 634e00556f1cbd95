"""Nightly incremental corpus refresh over the documents table — the
loop a 100 TB corpus runs instead of ever re-processing itself:

    documents v1 (history)
      → content fingerprints persisted to a hash-partitioned store
        (8 B identity per doc; the corpus itself never re-shuffles)
    documents v2 (tonight's snapshot, here derived with deterministic
        mutations: removals, edits, additions, planted duplicates)
      → snapshot_diff v1→v2: added/changed/removed — unchanged rows
        are discarded AT THE EXCHANGE, so everything downstream is
        delta-sized
      → store probe: a changed/added doc whose content history already
        has is dropped (each bucket task reads only ITS partition)
      → the surviving work list feeds the feature pipeline; the store
        update runs LAST, as the post-success commit
      → expectations suite gates the refreshed output before publish

Run:  python examples/incremental_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc

# runnable from anywhere: the package resolves relative to this file,
# and PYTHONPATH propagates it to Ray worker processes
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from featureextraction_jl_ray.pipelines.incremental import (
        run_incremental_refresh,
    )
    from featureextraction_jl_ray.stages.expect import expect
    from featureextraction_jl_ray.stages.fpstore import (
        fingerprint_store_stats,
        fingerprint_store_update,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def _mod(k, m):
        return pc.subtract(k, pc.multiply(pc.divide(k, m), m))

    def tonight(t: pa.Table) -> pa.Table:
        # deterministic v2: drop ~1/13, edit ~1/7, everything else as-is
        k = t.column("doc_id")
        t = t.filter(pc.not_equal(_mod(k, 13), 5))
        k = t.column("doc_id")
        edited = pc.binary_join_element_wise(
            "edited: ", t.column("text"), "")
        text = pc.if_else(pc.equal(_mod(k, 7), 0), edited, t.column("text"))
        return pa.table({"doc_id": k, "text": text})

    v2 = docs.map_batches(tonight, batch_format="pyarrow",
                          zero_copy_batch=True)

    store = tempfile.mkdtemp(prefix="fx_example_store_")
    added = fingerprint_store_update(docs, store, "doc_id", "text",
                                     num_buckets=32)
    print(f"history store: {added} fingerprints, "
          f"{fingerprint_store_stats(store)}")

    # materialize the work list ONCE: it is delta-sized by construction,
    # and the probe must not lazily re-execute after the store commit
    # below mutates what it reads
    work = run_incremental_refresh(docs, v2, store, key_col="doc_id",
                                   content_col="text",
                                   num_buckets=32).materialize()
    work_df = work.to_pandas()
    print(f"delta work list: {len(work_df)} docs "
          f"({work_df.change.value_counts().to_dict()})")

    # ... the downstream feature pipeline would consume `work` here ...

    # expectations gate BEFORE anything publishes
    report = expect(work, [
        ("not_null", "text"),
        ("unique", "doc_id"),
        ("matches", "change", "added|changed"),
    ])
    print(report.to_string(index=False))
    bad = report[report.pass_rate < 1.0]
    if len(bad):
        raise SystemExit(f"expectations failed:\n{bad}")

    # post-success commit: tonight's survivors join the history store
    committed = fingerprint_store_update(
        rd.from_arrow(pa.Table.from_pandas(
            work_df[["doc_id", "text"]], preserve_index=False)),
        store, "doc_id", "text", num_buckets=32)
    print(f"committed {committed} new fingerprints — published")
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:])
