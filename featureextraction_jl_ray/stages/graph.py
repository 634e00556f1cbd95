"""Graph centrality over edge Datasets — fixed-iteration PageRank.

Why a data-processing engine ships this: large-corpus curation weights
sources by link/interaction centrality (Common Crawl's harmonic-
centrality ranking, domain-authority corpus reweighting), and tabular
feature pipelines derive entity-importance features from interaction
graphs (customer↔supplier, user↔item).  The operator here is the
curation workhorse: damped PageRank run a FIXED number of synchronous
iterations, which makes the result deterministic, SQL-mirrorable (the
oracle unrolls the same K iterations), and cheap to reason about at
scale — K passes, each one bucketed join + one keyed partial-aggregate.

Scale shape (100 TB honest): the rank vector is O(nodes) and NEVER
lands on the driver — ranks live as a Dataset, each iteration is

    contribs = bucketed_hash_join(edges', ranks, on=src)     # exchange 1
    inflow   = grouped_aggregate(contribs, dst, sum)         # exchange 2
    ranks    = bucketed_hash_join(nodes, inflow, how=left)   # exchange 3

with per-edge contribution factors c_e = d·w_e/outdeg(src) precomputed
ONCE, so iterations ship only (node, float64) pairs plus the static
edge table.  ``ranks.materialize()`` between iterations pins the
O(nodes) intermediate in the object store — without it the lazy DAG
re-executes all previous iterations each pass.  Bucket count and the
stable key hash are the engine-wide ones, so edges stay co-partitioned
across iterations.

Semantics (documented, mirrored by the oracle):
- weighted: a ``weight_col`` scales both outdegree and contribution;
  ``None`` = every edge weight 1.0 (multi-edges then count).
- dangling nodes (no out-edges) contribute no redistributed mass —
  their share leaks to the teleport term, the simplest well-defined
  convention.  Symmetrize the edge list upstream if leakage matters.
- r_0(v) = 1/N;  r_{k+1}(v) = (1−d)/N + Σ_{(u→v)} c_{uv}·r_k(u).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .groupagg import grouped_aggregate
from .joins import bucketed_hash_join

__all__ = ["pagerank", "pagerank_table"]


def pagerank_table(edges: pa.Table, *, src_col: str = "src",
                   dst_col: str = "dst", weight_col: str | None = None,
                   damping: float = 0.85, iters: int = 3,
                   out_col: str = "rank") -> pa.Table:
    """PageRank over a MODEL-SIZED collapsed edge table — the fit half
    of the engine's reduce-then-fit pattern (PCA moments, k-means
    centroids, category maps): the 100 TB of raw interactions reduce to
    one weighted edge per distinct (src, dst) via ``grouped_aggregate``
    (bounded by entity-pair cardinality in the source-ranking use-case),
    and the iteration runs vectorized NumPy on that bounded table —
    K·nnz work, no per-iteration exchange.  Use :func:`pagerank` when
    the node set itself is unbounded.

    Same semantics as :func:`pagerank` (fixed synchronous iterations,
    weighted, dangling mass leaks to teleport)."""
    if iters < 1:
        raise ValueError("pagerank_table: iters must be >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("pagerank_table: damping must be in (0, 1)")
    src = edges.column(src_col).to_numpy(zero_copy_only=False)
    dst = edges.column(dst_col).to_numpy(zero_copy_only=False)
    if weight_col is None:
        w = np.ones(len(src), dtype=np.float64)
    else:
        w = edges.column(weight_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
    nodes, codes = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si = codes[: len(src)]
    di = codes[len(src):]
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], type=edges.schema.field(
            src_col).type), out_col: pa.array([], type=pa.float64())})
    od = np.zeros(n)
    np.add.at(od, si, w)
    c = damping * w / od[si]
    base = (1.0 - damping) / n
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        inflow = np.zeros(n)
        np.add.at(inflow, di, c * r[si])
        r = base + inflow
    return pa.table({"node": pa.array(nodes),
                     out_col: pa.array(r, type=pa.float64())})


def _node_list(edges, src_col: str, dst_col: str, node_type: pa.DataType,
               num_buckets: int):
    """Distinct union of both endpoint columns as a (node,) Dataset."""
    def pick(col):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column(col)})
        return fn

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    long = edges.map_batches(pick(src_col), **kw).union(
        edges.map_batches(pick(dst_col), **kw)
    )
    nodes = grouped_aggregate(long, "node", {"__n": ("node", "count")},
                              num_buckets=num_buckets)
    return nodes.map_batches(
        lambda b: b.select(["node"]), **kw
    )


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = None, damping: float = 0.85,
             iters: int = 3, num_buckets: int = 64,
             edge_types: dict | None = None, out_col: str = "rank"):
    """Fixed-iteration weighted PageRank over an edge Dataset.

    Returns a Dataset of ``(node, out_col)`` with one row per distinct
    endpoint.  ``edge_types`` ({name: arrow type}) skips the
    ``edges.schema()`` partial-execution cost like the other bucketed
    stages.  See the module docstring for semantics and scale shape.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("pagerank: damping must be in (0, 1)")

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    # the edge DAG is consumed by outdeg, the factor join, and the node
    # list (twice) — pin it once so the (possibly expensive) upstream
    # pipeline doesn't re-execute per consumer
    edges = edges.materialize()
    if edge_types is None:
        s = edges.schema()
        edge_types = dict(zip(s.names, s.types))
    node_type = edge_types[src_col]
    w_type = (edge_types[weight_col] if weight_col else pa.float64())

    # --- static prep: outdegree and per-edge contribution factor -----
    if weight_col is None:
        def add_w(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__w", pa.array(np.ones(batch.num_rows), type=pa.float64())
            )
        edges_w = edges.map_batches(add_w, **kw)
        wcol = "__w"
    else:
        def cast_w(batch: pa.Table) -> pa.Table:
            w = batch.column(weight_col).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "__w", pa.array(w.astype(np.float64), type=pa.float64())
            )
        edges_w = edges.map_batches(cast_w, **kw)
        wcol = "__w"

    ew_types = {**edge_types, "__w": pa.float64()}
    outdeg = grouped_aggregate(edges_w, src_col, {"__od": (wcol, "sum")},
                               num_buckets=num_buckets)
    ej = bucketed_hash_join(
        edges_w, outdeg, on=src_col, num_buckets=num_buckets,
        left_types=ew_types,
        right_types={src_col: node_type, "__od": pa.float64()},
    )

    d = float(damping)

    def contrib_factor(batch: pa.Table) -> pa.Table:
        w = batch.column("__w").to_numpy(zero_copy_only=False)
        od = batch.column("__od").to_numpy(zero_copy_only=False)
        c = d * w / od
        return pa.table({
            src_col: batch.column(src_col),
            dst_col: batch.column(dst_col),
            "__c": pa.array(c, type=pa.float64()),
        })

    # the edge table with factors is reused every iteration — pin it
    edges_c = ej.map_batches(contrib_factor, **kw).materialize()
    ec_types = {src_col: node_type, dst_col: node_type, "__c": pa.float64()}

    nodes = _node_list(edges, src_col, dst_col, node_type,
                       num_buckets).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: b.append_column(out_col, pa.array(
                np.zeros(0), type=pa.float64())), **kw)
    r0 = 1.0 / n_nodes
    base = (1.0 - d) / n_nodes

    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            "__r": pa.array(np.full(batch.num_rows, r0), type=pa.float64()),
        })

    ranks = nodes.map_batches(init_rank, **kw).materialize()
    rank_types = {"node": node_type, "__r": pa.float64()}

    for _ in range(iters):
        joined = bucketed_hash_join(
            edges_c, ranks, on=src_col, right_on="node",
            num_buckets=num_buckets,
            left_types=ec_types, right_types=rank_types,
        )

        def contrib_value(batch: pa.Table) -> pa.Table:
            c = batch.column("__c").to_numpy(zero_copy_only=False)
            r = batch.column("__r").to_numpy(zero_copy_only=False)
            return pa.table({
                dst_col: batch.column(dst_col),
                "__cv": pa.array(c * r, type=pa.float64()),
            })

        inflow = grouped_aggregate(
            joined.map_batches(contrib_value, **kw),
            dst_col, {"__in": ("__cv", "sum")}, num_buckets=num_buckets,
        )
        new = bucketed_hash_join(
            nodes, inflow, on="node", right_on=dst_col, how="left",
            num_buckets=num_buckets,
            left_types={"node": node_type},
            right_types={dst_col: node_type, "__in": pa.float64()},
        )

        def apply_update(batch: pa.Table) -> pa.Table:
            inf = batch.column("__in").to_numpy(zero_copy_only=False)
            inf = np.where(np.isnan(inf.astype(np.float64)), 0.0,
                           inf.astype(np.float64))
            return pa.table({
                "node": batch.column("node"),
                "__r": pa.array(base + inf, type=pa.float64()),
            })

        ranks = new.map_batches(apply_update, **kw).materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch.column("node"),
            out_col: batch.column("__r"),
        })

    return ranks.map_batches(finish, **kw)
