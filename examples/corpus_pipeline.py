"""End-to-end LLM corpus preparation over the documents table — the
pipeline a user of the reference engine would run here instead:

    hygiene pre-flight (8-gram test-set decontamination → source
        mixture sampling → PII redaction)
      → quality funnel (dedup → LM → lang-ID → repetition filter)
      → near-dup collapse (exact n-gram Jaccard)
      → chunking (32-token windows, 8-token overlap)
      → sequence packing (≈256-token bins in doc shards)
      → deterministic train/val/test split by doc
      → hive-partitioned parquet, one directory per split

Run:  python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: the package resolves relative to this file,
# and PYTHONPATH propagates it to Ray worker processes
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")

import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fx_corpus_out"

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False)

import ray.data as rd

from featureextraction_jl_ray.pipelines.corpusfilter import run_corpus_filter
from featureextraction_jl_ray.stages.minhash import jaccard_dedup
from featureextraction_jl_ray.stages.split import hash_split
from featureextraction_jl_ray.stages.text import chunk_documents, pack_chunks

from featureextraction_jl_ray.pipelines.hygiene import run_corpus_hygiene

docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
print(f"input docs: {docs.count()}")

# hygiene pre-flight: a held-out benchmark slice decontaminates the
# corpus, sources rebalance to a target mixture, PII is scrubbed
# (in production the benchmark is the eval-suite table, not a slice)
bench = docs.map_batches(
    lambda b: b.filter((b.column("doc_id").to_numpy() % 7) == 0),
    batch_format="pyarrow")
train = docs.map_batches(
    lambda b: b.filter((b.column("doc_id").to_numpy() % 7) != 0),
    batch_format="pyarrow")
parts = {f"src{i}": w for i, w in enumerate([4, 3, 2, 2, 2, 1])}
docs = run_corpus_hygiene(train, bench, parts)
print(f"after hygiene pre-flight: {docs.count()}")

kept = run_corpus_filter(docs)          # quality funnel
kept, _pairs = jaccard_dedup(kept, text_col="text", id_col="doc_id",
                             threshold=0.5)
print(f"after quality funnel + near-dup collapse: {kept.count()}")

chunks = chunk_documents(kept, size=32, stride=24)
packed = pack_chunks(chunks, capacity=256, num_shards=8)
packed = hash_split(packed, "doc_id",
                    {"train": 0.9, "val": 0.05, "test": 0.05})
print(f"packed chunks: {packed.count()}")

packed.write_parquet(out_dir, partition_cols=["split"])
print(f"written to {out_dir}/split=*/")
ray.shutdown()
