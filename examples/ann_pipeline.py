"""Vector-retrieval pipeline over the embeddings table — build a
persistent compressed ANN index once, then serve top-k queries from it:

    embeddings.parquet
      → IVF-PQ index build (coarse cells + residual product-quantized
        codes, 8 B/vector) written hive-partitioned, one dir per cell
      → query: probe nprobe cells (directory-pruned reads), ADC-score
        the codes, exact-refine the shortlist against the raw vectors
      → compare recall@10 against exact brute force

The on-disk layout is the 10⁹⁺-vector shape: the float corpus never
persists inside the index, probes touch nprobe/n_clusters of the data at
the storage layer, and the refine pass scans one column-pruned pass
filtered to the bounded shortlist.

Run:  python examples/ann_pipeline.py [sf_dir] [index_dir]
"""

from __future__ import annotations

import os
import sys

# runnable from anywhere: the package resolves relative to this file,
# and PYTHONPATH propagates it to Ray worker processes
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")

import numpy as np
import ray

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
index_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fx_ann_index"

if not ray.is_initialized():
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from featureextraction_jl_ray import configure_execution
from featureextraction_jl_ray.stages.similarity import (
    build_ivfpq_index,
    knn_cosine,
    knn_cosine_ivfpq,
)

configure_execution()

emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")

# ---- build once: hive-partitioned (id, cell, pq_code) ------------------
index = build_ivfpq_index(
    emb, vector_col="embedding", id_col="vec_id",
    n_clusters=16, m=8, ksub=256, path=index_dir,
)
print(f"index built at {index_dir}: "
      f"{sum(len(f) for _, _, f in os.walk(index_dir))} files, "
      f"{index.centroids.shape[0]} cells, 8 B codes/vector")

# ---- serve: a few deterministic query vectors ---------------------------
head = emb.take(4)
Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in head])

approx = knn_cosine_ivfpq(
    index, Q, vector_col="embedding", id_col="vec_id",
    k=10, nprobe=4, refine_ds=emb,          # exact re-rank of the shortlist
)
exact = knn_cosine(emb, Q, vector_col="embedding", id_col="vec_id", k=10)

recall = np.mean([
    len(set(exact[exact.query_id == q].vec_id)
        & set(approx[approx.query_id == q].vec_id)) / 10
    for q in range(len(Q))
])
print(approx.head(12).to_string())
print(f"recall@10 vs brute force: {recall:.2f}")

ray.shutdown()
