"""Distributed Gram-matrix construction + centering over a Dataset of
feature vectors (SURVEY.md §2-A K3/K9 at engine scale).

The n×n kernel matrix is never materialized in one place: the vector
table is cut into row-blocks, every (i ≤ j) block pair becomes one GEMM
task producing a TILE, and centering each tile needs only the broadcast
(row-sums, grand-mean) state — the per-tile identity
K̃ᵢⱼ = Kᵢⱼ − rᵢ − rⱼ + g (Schölkopf et al. 1998).

Row sums are accumulated from the tiles themselves (one pass), so the
whole centered-kernel pipeline is: blocks → tiles (GEMM) → row-sum
partials → broadcast (r, g) → center tiles.  Tiles live in a Dataset
``(bi, bj, i0, j0, tile: list<double>)`` and stream to whatever consumes
them (KPCA solve, nearest-neighbor kernels, writes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.veccol import list_column_to_numpy
from .kernel import KernelCenterer

__all__ = ["gram_tiles", "center_gram_tiles", "gram_row_sums",
           "centered_gram_dataset", "iter_tile_arrays"]


def _collect_blocks(ds, vector_col: str, block_rows: int):
    """Materialize the (small-n) vector table into row blocks with offsets.

    The dual/Gram path is only legitimate when n is modest (SURVEY.md K3:
    "only for small-n model fit"); guard accordingly."""
    tbl = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
    X = list_column_to_numpy(tbl, vector_col)
    n = X.shape[0]
    if n > 100_000:
        raise ValueError(
            f"gram path is for small-n fits (n={n}); use covariance moments"
        )
    blocks = []
    for start in range(0, n, block_rows):
        blocks.append((start, X[start : start + block_rows]))
    return blocks, n


def gram_tiles(ds, vector_col: str, *, block_rows: int = 2048,
               kernel: str = "linear", gamma: float | None = None):
    """Dataset of upper-triangular kernel tiles (bi ≤ bj).

    ``kernel``: "linear" (A·Bᵀ) or "rbf" (exp(−γ‖a−b‖²), computed per
    tile from the same GEMM plus broadcast row norms)."""
    if kernel not in ("linear", "rbf"):
        raise ValueError(f"unsupported kernel {kernel!r}")
    blocks, n = _collect_blocks(ds, vector_col, block_rows)
    if kernel == "rbf" and gamma is None:
        gamma = 1.0 / blocks[0][1].shape[1]  # 1/p, the scikit-style default
    # Block payloads go to the object store ONCE; the Dataset rows carry only
    # (bi, bj, i0, j0) int64 coordinates.  Shipping the ObjectRefs through a
    # Dataset COLUMN would defeat Arrow conversion (Ray falls back to pickled
    # python objects); a closure-captured ref list is serialized natively and
    # each task ray.get()s just the two blocks it needs, zero-copy.
    offsets_ = [start for start, _ in blocks]
    block_refs = [ray.put(B) for _, B in blocks]

    items = []
    for bi, i0 in enumerate(offsets_):
        for bj, j0 in enumerate(offsets_):
            if bj < bi:
                continue
            items.append({"bi": bi, "bj": bj, "i0": i0, "j0": j0})

    import ray.data as rd

    def make_tile(batch):
        out = {"bi": [], "bj": [], "i0": [], "j0": [], "rows": [], "cols": []}
        flats = []
        for bi_, bj_, i0_, j0_ in zip(
            batch["bi"], batch["bj"], batch["i0"], batch["j0"],
        ):
            A = ray.get(block_refs[int(bi_)])
            B = ray.get(block_refs[int(bj_)])
            T = A @ B.T
            if kernel == "rbf":
                na = np.einsum("ij,ij->i", A, A)
                nb = np.einsum("ij,ij->i", B, B)
                T = np.exp(-gamma * (na[:, None] + nb[None, :] - 2.0 * T))
            out["bi"].append(bi_)
            out["bj"].append(bj_)
            out["i0"].append(i0_)
            out["j0"].append(j0_)
            out["rows"].append(T.shape[0])
            out["cols"].append(T.shape[1])
            flats.append(np.ascontiguousarray(T.reshape(-1), dtype=np.float64))
        return _tiles_to_arrow(out, flats)

    return rd.from_items(items).map_batches(make_tile, batch_size=1), n


def _tiles_to_arrow(meta: dict, flats: list[np.ndarray]) -> pa.Table:
    """Build the tile Dataset block as real Arrow (large_list<float64>).

    Variable-width tiles as numpy object arrays trip Ray's tensor-extension
    conversion and silently fall back to PICKLED python objects in the
    object store; an explicit offsets+values list column keeps the tile
    payload zero-copy Arrow end to end."""
    values = pa.array(
        np.concatenate(flats) if flats else np.empty(0, dtype=np.float64),
        type=pa.float64(),
    )
    offsets = np.zeros(len(flats) + 1, dtype=np.int64)
    if flats:
        np.cumsum([len(f) for f in flats], out=offsets[1:])
    tile_col = pa.LargeListArray.from_arrays(pa.array(offsets), values)
    cols = {k: pa.array(np.asarray(v, dtype=np.int64)) for k, v in meta.items()}
    cols["tile"] = tile_col
    return pa.table(cols)


def iter_tile_arrays(tiles):
    """Yield (i0, j0, T) dense tile views from the Arrow tile Dataset."""
    for b in tiles.iter_batches(batch_size=None, batch_format="pyarrow"):
        i0s = b.column("i0").to_numpy()
        j0s = b.column("j0").to_numpy()
        rs = b.column("rows").to_numpy()
        cs = b.column("cols").to_numpy()
        tile_col = b.column("tile").combine_chunks()
        flat = tile_col.flatten().to_numpy(zero_copy_only=False)
        offs = tile_col.offsets.to_numpy()
        for k in range(len(b)):
            T = flat[offs[k] : offs[k + 1]].reshape(int(rs[k]), int(cs[k]))
            yield int(i0s[k]), int(j0s[k]), T


def gram_row_sums(tiles, n: int) -> np.ndarray:
    """Row sums of the full symmetric K from its upper-triangular tiles."""
    sums = np.zeros(n)
    for i0, j0, T in iter_tile_arrays(tiles):
        sums[i0 : i0 + T.shape[0]] += T.sum(axis=1)
        if i0 != j0:  # mirror the off-diagonal tile
            sums[j0 : j0 + T.shape[1]] += T.sum(axis=0)
    return sums


def center_gram_tiles(tiles, centerer: KernelCenterer):
    """Center every tile with the broadcast (r, g) state — stateless map."""
    r_ref = ray.put(centerer.row_means_)
    g = centerer.grand_mean_

    def fn(batch: pa.Table) -> pa.Table:
        r = ray.get(r_ref)
        i0s = batch.column("i0").to_numpy()
        j0s = batch.column("j0").to_numpy()
        rs = batch.column("rows").to_numpy()
        cs = batch.column("cols").to_numpy()
        tile_col = batch.column("tile").combine_chunks()
        flat = tile_col.flatten().to_numpy(zero_copy_only=False)
        offs = tile_col.offsets.to_numpy()
        meta = {"bi": batch.column("bi").to_numpy(),
                "bj": batch.column("bj").to_numpy(),
                "i0": i0s, "j0": j0s, "rows": rs, "cols": cs}
        out_tiles = []
        for k in range(len(batch)):
            T = flat[offs[k] : offs[k + 1]].reshape(int(rs[k]), int(cs[k]))
            ri = r[i0s[k] : i0s[k] + T.shape[0]]
            rj = r[j0s[k] : j0s[k] + T.shape[1]]
            out_tiles.append((T - ri[:, None] - rj[None, :] + g).reshape(-1))
        return _tiles_to_arrow(meta, out_tiles)

    return tiles.map_batches(fn, batch_format="pyarrow", batch_size=4)


def centered_gram_dataset(ds, vector_col: str, *, block_rows: int = 2048,
                          kernel: str = "linear", gamma: float | None = None):
    """embeddings Dataset → (centered tile Dataset, KernelCenterer, n)."""
    tiles, n = gram_tiles(ds, vector_col, block_rows=block_rows,
                          kernel=kernel, gamma=gamma)
    tiles = tiles.materialize()  # tiles are reused for row sums + centering
    sums = gram_row_sums(tiles, n)
    centerer = KernelCenterer.from_partials(sums, n)
    return center_gram_tiles(tiles, centerer), centerer, n
