"""Distribution-invariance tests (SURVEY.md §5.2 №2): the distributed
moments/PCA fit over a Ray Dataset must match the in-memory NumPy oracle
regardless of block/batch layout."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from featureextraction_jl_ray.functions.veccol import list_column_to_numpy
from featureextraction_jl_ray.stages.transform import apply_pca_transform
from featureextraction_jl_ray.state.moments import fit_moments
from featureextraction_jl_ray.state.pca import PCAModel, fit_pca
from tests.oracle import oracle_pca


@pytest.fixture(scope="module")
def embeddings(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    X = list_column_to_numpy(tbl, "embedding")
    return tbl, X


@pytest.mark.parametrize("nblocks,batch_size", [(1, None), (7, 64), (16, 17)])
def test_fit_moments_layout_invariant(ray_session, embeddings, nblocks, batch_size):
    tbl, X = embeddings
    ds = ray_session.data.from_arrow(tbl).repartition(nblocks)
    m = fit_moments(ds, "embedding", batch_size=batch_size, fan_in=4)
    assert m.n == X.shape[0]
    np.testing.assert_allclose(m.mean, X.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(m.cov(), np.cov(X, rowvar=False), rtol=1e-8, atol=1e-10)


def test_distributed_pca_matches_oracle(ray_session, embeddings):
    tbl, X = embeddings
    o = oracle_pca(X)
    ds = ray_session.data.from_arrow(tbl).repartition(8)
    model = fit_pca(ds, "embedding", k=8)
    np.testing.assert_allclose(model.eigvals, o["eigvals"][:8], rtol=1e-7)
    np.testing.assert_allclose(model.components, o["U"][:, :8], rtol=1e-6, atol=1e-8)


def test_actor_pool_transform_matches_oracle(ray_session, embeddings):
    tbl, X = embeddings
    o = oracle_pca(X)
    ds = ray_session.data.from_arrow(tbl).repartition(4)
    model = fit_pca(ds, "embedding", k=5)
    out = apply_pca_transform(
        ds, model, "embedding", out_col="z", mode="pca_whiten", concurrency=2
    )
    res = out.to_pandas()
    # realign by vec_id (streaming execution does not preserve order)
    order = np.argsort(res["vec_id"].to_numpy())
    ids = tbl.column("vec_id").to_numpy()
    Z = np.stack(res["z"].to_numpy()[order])[np.argsort(np.argsort(ids))]
    np.testing.assert_allclose(Z, o["Z_pcawhite"][:, :5], rtol=1e-4, atol=1e-4)
