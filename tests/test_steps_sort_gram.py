"""Step/Pipeline API (X1), range-partition sort (R1), distributed Gram
tiles + centering (K3/K9 engine path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from featureextraction_jl_ray.pipelines.steps import (
    DecodeStep,
    MapStep,
    PCAStep,
    Pipeline,
    WindowStep,
)
from featureextraction_jl_ray.stages.sort import (
    range_partition_sort,
    sample_boundaries,
)
from featureextraction_jl_ray.state.gram import centered_gram_dataset
from featureextraction_jl_ray.synth import SynthConfig, write_synth_tables
from tests.oracle import oracle_center_kernel


def test_pipeline_decode_pca(ray_session, tmp_path):
    paths = write_synth_tables(SynthConfig(n_entities=40, seed=42), str(tmp_path))
    images = ray_session.data.read_parquet(paths["images"])
    pipe = Pipeline([DecodeStep(grid=4), PCAStep("pix", k=6)])
    out = pipe.fit_transform(images).to_pandas()
    Z = np.stack(out["z"].to_numpy())
    assert Z.shape[1] == 6
    np.testing.assert_allclose(np.cov(Z.T), np.eye(6), atol=0.05)
    # refit-free transform reuses state
    out2 = pipe.transform(images).to_pandas()
    assert len(out2) == len(out)


def test_pipeline_unfitted_raises(ray_session):
    pipe = Pipeline([PCAStep("embedding", k=2)])
    with pytest.raises(RuntimeError, match="unfitted"):
        pipe.transform(ray_session.data.range(3))


def test_window_step(ray_session, sf_dir):
    ev = ray_session.data.read_parquet(f"{sf_dir}/events.parquet")
    pipe = Pipeline([WindowStep("user_id", "ts", lag_cols=("value",),
                                session_gap="30min", num_buckets=8,
                                tiebreak_cols=("event_id",))])
    out = pipe.fit_transform(ev).to_pandas()
    assert {"lag1_value", "session_id"} <= set(out.columns)


def test_range_partition_sort_global_order(ray_session, sf_dir):
    ev = ray_session.data.read_parquet(f"{sf_dir}/events.parquet")
    bounds = sample_boundaries(ev, "user_id", 8)
    assert bounds == sorted(bounds)
    out = range_partition_sort(ev, ["user_id", "ts"], boundaries=bounds)
    df = out.to_pandas()
    key = list(zip(df.user_id, df.ts))
    assert key == sorted(key)


def test_boundaries_persist_roundtrip(ray_session, sf_dir, tmp_path):
    ev = ray_session.data.read_parquet(f"{sf_dir}/events.parquet")
    p = str(tmp_path / "bounds.json")
    out1 = range_partition_sort(ev, "user_id", boundaries_path=p, num_partitions=4)
    out1.count()
    from featureextraction_jl_ray.stages.sort import load_boundaries

    saved = load_boundaries(p)
    out2 = range_partition_sort(ev, "user_id", boundaries_path=p, num_partitions=4)
    out2.count()
    assert load_boundaries(p) == saved  # reused, not re-sampled


def test_centered_gram_tiles_match_oracle(ray_session, sf_dir):
    tbl = pd.read_parquet(f"{sf_dir}/embeddings.parquet").head(300)
    X = np.stack(tbl.embedding.to_numpy()).astype(np.float64)
    want = oracle_center_kernel(X @ X.T)
    ds = ray_session.data.from_pandas(tbl).repartition(3)
    tiles, centerer, n = centered_gram_dataset(ds, "embedding", block_rows=128)
    assert n == 300
    got = np.full((n, n), np.nan)
    from featureextraction_jl_ray.state.gram import iter_tile_arrays

    for i0, j0, T in iter_tile_arrays(tiles):
        got[i0 : i0 + T.shape[0], j0 : j0 + T.shape[1]] = T
        got[j0 : j0 + T.shape[1], i0 : i0 + T.shape[0]] = T.T
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got, want, atol=1e-8)

# ---------------------------------------------------------------- zorder


def test_zorder_key_properties():
    import numpy as np

    from featureextraction_jl_ray.stages.sort import zorder_key

    # interleave identity: z(x, 0) spreads x's bits to even positions
    x = np.array([0b1011], dtype=np.int64)
    z = zorder_key([x, np.zeros(1, dtype=np.int64)], bits=4)
    assert z[0] == 0b1000101           # bits 0,1,3 of x at lanes 0,2,6
    z2 = zorder_key([np.zeros(1, dtype=np.int64), x], bits=4)
    assert z2[0] == 0b1000101 << 1     # column 1 owns the odd lanes
    # locality: sorting by z groups a 2x2 quadrant contiguously
    import itertools

    pts = np.array(list(itertools.product(range(8), range(8))))
    z = zorder_key([pts[:, 0], pts[:, 1]], bits=3)
    order = np.argsort(z)
    first4 = set(map(tuple, pts[order[:4]]))
    assert first4 == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_zorder_key_guards():
    import numpy as np
    import pytest

    from featureextraction_jl_ray.stages.sort import zorder_key

    with pytest.raises(ValueError, match="outside"):
        zorder_key([np.array([70000], dtype=np.int64),
                    np.array([0], dtype=np.int64)], bits=16)
    with pytest.raises(ValueError, match="> 64"):
        zorder_key([np.zeros(1, dtype=np.int64)] * 5, bits=16)
    with pytest.raises(TypeError, match="not integer"):
        zorder_key([np.array([0.5]), np.array([1], dtype=np.int64)], bits=4)


def test_zorder_sql_mirror_randomized():
    import duckdb
    import numpy as np
    import pandas as pd

    from featureextraction_jl_ray.stages.sort import zorder_key, zorder_sql_expr

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"a": rng.integers(0, 2**16, 300),
                       "b": rng.integers(0, 2**16, 300),
                       "c": rng.integers(0, 2**16, 300)})
    for cols in (["a", "b"], ["a", "b", "c"]):
        z = zorder_key([df[c].to_numpy() for c in cols], bits=16)
        got = duckdb.sql(
            f"SELECT {zorder_sql_expr(cols)} AS z FROM df").df()["z"]
        np.testing.assert_array_equal(z, got.to_numpy())


# ---------------------------------------------------------------- watermark


def test_watermark_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.sort import with_watermark

    rng = np.random.default_rng(0)
    n = 2000
    # arrival order = oid; event time loosely increasing with jitter
    base = np.cumsum(rng.integers(0, 120, n))
    jit = rng.integers(-900, 900, n)
    df = pd.DataFrame({
        "oid": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(base + jit, unit="s"),
    })
    got = (with_watermark(
        rd.from_arrow(pa.Table.from_pandas(df)), "oid", "ts",
        lateness="5min", num_partitions=8)
        .to_pandas().sort_values("oid", ignore_index=True))
    # brute force: prefix max of strictly-earlier arrivals
    t = df.ts.to_numpy().astype("datetime64[us]").astype(np.int64)
    prev = np.concatenate([[np.iinfo(np.int64).min],
                           np.maximum.accumulate(t)[:-1]])
    has = prev != np.iinfo(np.int64).min
    wm = prev - 300_000_000
    want_late = (has & (t < wm)).astype(np.int64)
    np.testing.assert_array_equal(got.is_late.to_numpy(), want_late)
    assert want_late.sum() > 0          # the fixture must exercise lateness
    got_wm = got.watermark.to_numpy().astype("datetime64[us]").astype(np.int64)
    np.testing.assert_array_equal(got_wm[has], wm[has])
    assert got.watermark.isna().to_numpy()[0]   # first arrival: no watermark


def test_watermark_sorted_input_never_late(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.sort import with_watermark

    df = pd.DataFrame({
        "oid": np.arange(500, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(500) * 60, unit="s"),
    })
    got = with_watermark(rd.from_arrow(pa.Table.from_pandas(df)),
                         "oid", "ts", lateness="1s",
                         num_partitions=4).to_pandas()
    assert got.is_late.sum() == 0
