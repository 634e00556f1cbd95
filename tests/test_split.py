"""Deterministic hash split/sample: SQL-mix drift guard, determinism,
proportions, key-consistency."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.split import (
    hash_sample,
    hash_split,
    hash_u32,
    split_thresholds,
    sql_hash_cte,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_hash_u32_matches_duckdb_cte():
    """The numpy fmix32 and the SQL CTE must agree bit-for-bit — this is
    the drift guard behind the oracled split query."""
    keys = np.array(
        [0, 1, 2, -1, -999, 12345, 2**62, -(2**62), 999999999999], dtype=np.int64
    )
    got = hash_u32(keys)
    cte = sql_hash_cte("t", "k", "k")
    want = duckdb.sql(
        f"WITH t(k) AS (SELECT unnest({keys.tolist()}::BIGINT[])), {cte} "
        "SELECT k, h FROM __hx"
    ).fetchall()
    assert all(int(h) == int(g) for (_, h), g in zip(want, got))


def test_split_thresholds_and_validation():
    b = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert [x[0] for x in b] == ["train", "val", "test"]
    assert b[-1][1] == 2**32
    assert b[0][1] == int(0.8 * 2**32)
    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.4})


def test_hash_split_deterministic_and_proportional(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["event_id", "user_id"])
    out1 = hash_split(ds, "event_id").to_pandas().sort_values("event_id")
    out2 = hash_split(ds, "event_id").to_pandas().sort_values("event_id")
    assert (out1["split"].to_numpy() == out2["split"].to_numpy()).all()
    frac = out1["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.05
    assert abs(frac["test"] - 0.1) < 0.05


def test_split_key_consistency_across_datasets(ray_session):
    """Same key ⇒ same split label in any table (the group-leakage
    guarantee)."""
    import ray.data as rd

    a = rd.from_arrow(pa.table({"uid": pa.array([7, 8, 9], type=pa.int64())}))
    b = rd.from_arrow(
        pa.table({"uid": pa.array([9, 9, 8, 7, 100], type=pa.int64())})
    )
    la = {r["uid"]: r["split"] for r in hash_split(a, "uid").take_all()}
    lb = {r["uid"]: r["split"] for r in hash_split(b, "uid").take_all()}
    for k in la:
        assert lb[k] == la[k]


def test_hash_sample_subset_and_string_keys(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(EVENTS, columns=["event_id"])
    n = ds.count()
    kept = hash_sample(ds, "event_id", 0.25)
    k = kept.count()
    assert abs(k / n - 0.25) < 0.07
    # sample at fraction f is a strict subset of the sample at f' > f
    bigger = set(r["event_id"] for r in hash_sample(ds, "event_id", 0.5).take_all())
    assert set(r["event_id"] for r in kept.take_all()) <= bigger
    # string keys route through SipHash and still split deterministically
    sds = rd.from_arrow(pa.table({"k": [f"doc_{i}" for i in range(1000)]}))
    s1 = hash_split(sds, "k").to_pandas()
    assert set(s1["split"]) == {"train", "val", "test"}
    assert abs((s1["split"] == "train").mean() - 0.8) < 0.06


def test_weighted_sample_inclusion_proportional_to_weight():
    """A-Res k=1 property: P(row selected) = w/Σw.  Empirically over
    many seeds using the same hash→uniform→priority formula the
    operator applies (kernel-level; the operator itself is gate-oracled
    row-exactly)."""
    import numpy as np

    from featureextraction_jl_ray.stages.split import hash_u32

    ids = np.arange(4, dtype=np.int64)
    w = np.array([1.0, 2.0, 3.0, 4.0])
    wins = np.zeros(4)
    n_seeds = 4000
    for seed in range(n_seeds):
        h = hash_u32(ids, seed=seed)
        u = (h.astype(np.float64) + 0.5) / 2**32
        pri = np.log(u) / w
        wins[np.argmax(pri)] += 1
    freq = wins / n_seeds
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.03)


def test_weighted_sample_by_key_operator(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.split import weighted_sample_by_key

    t = pa.table({
        "k": pa.array([0] * 6 + [1] * 2, type=pa.int64()),
        "id": pa.array(range(8), type=pa.int64()),
        "w": pa.array([1.0, 2.0, 0.0, -1.0, 3.0, 4.0, 5.0, 6.0]),
    })
    a = weighted_sample_by_key(rd.from_arrow(t), "k", "id", "w", k=2).to_pandas()
    b = weighted_sample_by_key(rd.from_arrow(t), "k", "id", "w", k=2).to_pandas()
    a = a.sort_values("id", ignore_index=True)
    b = b.sort_values("id", ignore_index=True)
    assert a.equals(b)  # deterministic
    assert (a.groupby("k").size() <= 2).all()
    assert set(a[a.k == 1].id) == {6, 7}  # k ≥ group size keeps all
    assert not set(a.id) & {2, 3}  # weight ≤ 0 excluded


def test_negative_samples_properties(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from featureextraction_jl_ray.stages.split import negative_samples

    t = pa.table({"id": pa.array(range(100), type=pa.int64())})
    a = negative_samples(rd.from_arrow(t), "id", k=4, n_ids=100).to_pandas()
    b = negative_samples(rd.from_arrow(t), "id", k=4, n_ids=100).to_pandas()
    a = a.sort_values(["id", "j"], ignore_index=True)
    b = b.sort_values(["id", "j"], ignore_index=True)
    assert a.equals(b)                       # deterministic
    assert (a.neg_id != a.id).all()          # no self pairs
    assert a.neg_id.between(0, 99).all()     # dense id space
    assert len(a) <= 400 and len(a) >= 380   # ≤k per anchor, few collisions
    # draws look uniform-ish: every quartile of the id space is hit
    assert (np.histogram(a.neg_id, bins=4, range=(0, 100))[0] > 50).all()


def test_sample_k_per_key_deterministic_and_capped(ray_session):
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.split import sample_k_per_key

    rng = np.random.default_rng(5)
    n = 2000
    tbl = pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "key": pa.array(rng.integers(0, 20, n)),
        "v": pa.array(rng.standard_normal(n)),
    })
    ds = ray_session.data.from_arrow(tbl)
    a = sample_k_per_key(ds, "key", "id", k=5).to_pandas()
    # cap respected, and keys with >=5 rows yield exactly 5
    sizes = a.groupby("key").size()
    assert (sizes <= 5).all() and (sizes == 5).sum() == 20
    # deterministic across repartitions
    b = sample_k_per_key(ds.repartition(7), "key", "id", k=5).to_pandas()
    assert sorted(a.id) == sorted(b.id)


def test_global_rank_nulls_last_and_unique(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from featureextraction_jl_ray.stages.sort import with_global_rank

    rng = np.random.default_rng(9)
    n = 5000
    v = rng.integers(0, 50, n).astype(np.float64)  # heavy ties
    v[:25] = np.nan
    tbl = pa.table({"id": pa.array(np.arange(n, dtype=np.int64)),
                    "v": pa.array(v)})
    out = with_global_rank(ray_session.data.from_arrow(tbl).repartition(5),
                           "v", tiebreak_cols=("id",), num_partitions=8
                           ).to_pandas()
    assert len(out) == n
    ranks = np.sort(out.global_rank.to_numpy())
    assert (ranks == np.arange(1, n + 1)).all()  # dense, unique, 1-based
    exp = pd.DataFrame({"id": np.arange(n), "v": v}).sort_values(
        ["v", "id"], na_position="last", ignore_index=True)
    exp["global_rank"] = np.arange(1, n + 1)
    got = out.sort_values("global_rank", ignore_index=True)
    assert (got.id.to_numpy() == exp.id.to_numpy()).all()


def test_global_rank_nondeterministic_upstream(ray_session):
    """ADVICE r3: with_global_rank reads its input three times (boundary
    sample, count pre-pass, tag shuffle); an unseeded random upstream
    must still yield a dense permutation 1..n — the input is pinned once
    before the passes."""
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.stages.sort import with_global_rank

    base = ray_session.data.from_arrow(
        pa.table({"k": pa.array(np.arange(2000, dtype=np.int64)),
                  "u": pa.array(np.arange(2000, dtype=np.int64))})
    ).repartition(8)

    def jitter(batch: pa.Table) -> pa.Table:
        # deliberately UNSEEDED: every execution keeps a different subset
        keep = np.random.random(batch.num_rows) < 0.5
        return batch.filter(pa.array(keep))

    ds = base.map_batches(jitter, batch_format="pyarrow")
    out = with_global_rank(ds, "k", tiebreak_cols=("u",),
                           num_partitions=6).to_pandas()
    n = len(out)
    assert sorted(out.global_rank) == list(range(1, n + 1))
    assert list(out.sort_values("global_rank").k) == sorted(out.k)


def test_sample_global_k_row_exact_vs_sql(ray_session, sf_dir):
    """Global bottom-k == the SQL mirror row-for-row; invariant to
    partition count; k > n returns everything."""
    from featureextraction_jl_ray.stages.split import (
        sample_global_k,
        sql_hash_cte,
    )

    ev = f"{sf_dir}/events.parquet"
    cte = sql_hash_cte(f"'{ev}'", "event_id", "event_id, user_id")
    want = duckdb.sql(
        f"WITH {cte} SELECT event_id, user_id FROM __hx "
        f"ORDER BY h, event_id LIMIT 200").fetchdf()
    for nparts in (3, 17):
        ds = ray_session.data.read_parquet(
            ev, columns=["event_id", "user_id"]).repartition(nparts)
        got = sample_global_k(ds, "event_id", k=200).to_pandas()
        assert sorted(got.event_id) == sorted(want.event_id)
    small = sample_global_k(
        ray_session.data.read_parquet(ev, columns=["event_id"]).limit(50),
        "event_id", k=999).to_pandas()
    assert len(small) == 50


def test_weighted_thin_deterministic_and_exact(ray_session):
    """Per-row Bernoulli thinning: p=0 never keeps, p=1 always keeps,
    survival follows hash < floor(p*2^32) exactly, draws are
    reproducible, null p drops, keep_p=False drops the column."""
    import ray as _ray

    from featureextraction_jl_ray.stages.split import hash_u32, weighted_thin

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    p = np.where(ids % 4 == 0, 0.0,
                 np.where(ids % 4 == 1, 1.0, (ids % 100) / 100.0))
    df = pd.DataFrame({"id": ids, "p": p})
    df.loc[2, "p"] = np.nan
    ds = _ray.data.from_pandas(df)
    out = weighted_thin(ds, "id", "p").to_pandas()
    got = set(out["id"])
    h = hash_u32(ids)
    pp = np.nan_to_num(df["p"].to_numpy(), nan=0.0)
    thr = np.floor(np.clip(pp, 0, 1) * float(2**32)).astype(np.uint64)
    want = set(ids[h < thr])
    assert got == want
    assert not (set(ids[(ids % 4 == 0) | (ids == 2)]) & got)  # p=0/null drop
    assert set(ids[(ids % 4 == 1) & (ids != 2)]) <= got       # p=1 keeps
    # reproducible
    out2 = weighted_thin(_ray.data.from_pandas(df), "id", "p").to_pandas()
    assert set(out2["id"]) == got
    # survival rate tracks mean p (binomial tolerance)
    mid = (ids % 4 >= 2) & (ids != 2)
    rate = np.isin(ids[mid], list(got)).mean()
    assert abs(rate - pp[mid].mean()) < 0.06
    out3 = weighted_thin(_ray.data.from_pandas(df), "id", "p",
                         keep_p=False).to_pandas()
    assert "p" not in out3.columns
