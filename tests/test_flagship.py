"""Flagship pipeline end-to-end: leakage (№4), payload invariants (№5),
resume (№6), skew determinism (№7) — SURVEY.md §5.2."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from featureextraction_jl_ray.functions.phash import ahash64_batch
from featureextraction_jl_ray.pipelines.flagship import (
    FlagshipConfig,
    resume_flagship,
    run_flagship,
)
from featureextraction_jl_ray.sources.io import completed_partitions, load_manifest
from featureextraction_jl_ray.stages.codec import decode_batch
from featureextraction_jl_ray.synth import SynthConfig, synth_images, write_synth_tables

CFG = SynthConfig(n_entities=80, seed=42)
FCFG = FlagshipConfig(num_buckets=8, k=10)


@pytest.fixture(scope="module")
def tables(ray_session, tmp_path_factory):
    paths = write_synth_tables(CFG, str(tmp_path_factory.mktemp("synth")))
    return (
        ray_session.data.read_parquet(paths["images"]),
        ray_session.data.read_parquet(paths["captions"]),
    )


@pytest.fixture(scope="module")
def result(ray_session, tables):
    images, captions = tables
    ds, model = run_flagship(images, captions, cfg=FCFG)
    return ds.to_pandas(), model


def test_schema_and_rows(result, tables):
    df, _ = result
    assert len(df) == tables[0].count()
    for col in ("image_id", "entity_id", "ts", "caption", "phash", "caption_state",
                "session_id", "lag1_phash", "roll_count", "z"):
        assert col in df.columns, col


def test_zero_temporal_leakage(result):
    """Future 'LEAK_' caption states must never be attached (№4)."""
    df, _ = result
    assert not df["caption_state"].fillna("").str.startswith("LEAK_").any()


def test_whitened_features(result):
    df, model = result
    z = np.stack(df["z"].to_numpy())
    assert z.shape[1] == FCFG.k
    cov = np.cov(z, rowvar=False)
    np.testing.assert_allclose(cov, np.eye(FCFG.k), atol=1e-2)


def test_caption_and_payload_invariants():
    """Decode∘encode is exact for fmt=raw; phash column equals the hash of
    decoded pixels; captions survive generation byte-for-byte (№5)."""
    img = synth_images(SynthConfig(n_entities=20, seed=7))
    pix = decode_batch(img)
    assert (ahash64_batch(pix) == img.column("phash").to_numpy()).all()
    assert [p.tobytes() for p in pix] == img.column("bytes").to_pylist()


def test_sessionize_gap_semantics(result):
    df, _ = result
    df = df.sort_values(["entity_id", "ts"])
    gap = pd.Timedelta("30min")
    for _, g in list(df.groupby("entity_id"))[:10]:
        breaks = (g["ts"].diff() > gap).cumsum()
        assert (g["session_id"].to_numpy() == breaks.to_numpy()).all()


def test_checkpoint_resume_byte_identical(ray_session, tables, result, tmp_path):
    """Kill-after-k-partitions simulation: resume rewrites only missing
    partitions and the union equals a clean run (№6)."""
    images, captions = tables
    df_clean, model = result
    out = str(tmp_path / "out")
    recs, _ = run_flagship(images, captions, cfg=FCFG, model=model, out_dir=out)
    assert {r["partition_id"] for r in recs} <= set(range(FCFG.num_buckets))
    # wreck two partitions (file + manifest line)
    victims = sorted(r["partition_id"] for r in recs)[:2]
    for v in victims:
        os.remove(os.path.join(out, f"part-{v:05d}.parquet"))
    keep = [r for r in load_manifest(out) if r["partition_id"] not in victims]
    with open(os.path.join(out, "_manifest.jsonl"), "w") as fh:
        for r in keep:
            fh.write(json.dumps(r) + "\n")
    recs2, _ = resume_flagship(images, captions, out_dir=out, cfg=FCFG, model=model)
    assert sorted(r["partition_id"] for r in recs2) == victims
    full = pd.concat(
        [pd.read_parquet(p) for p in glob.glob(out + "/part-*.parquet")]
    )
    assert len(full) == len(df_clean)
    assert set(full["image_id"]) == set(df_clean["image_id"])
    # checksums in manifest match content re-hash
    done = completed_partitions(out, op_fingerprint=FCFG.fingerprint)
    assert done == set(r["partition_id"] for r in load_manifest(out))


def test_manifest_fingerprint_guard(tables, tmp_path, result):
    images, captions = tables
    df, model = result
    out = str(tmp_path / "out2")
    run_flagship(images, captions, cfg=FCFG, model=model, out_dir=out)
    other = FlagshipConfig(num_buckets=8, k=5)
    with pytest.raises(ValueError, match="different pipeline config"):
        completed_partitions(out, op_fingerprint=other.fingerprint)


def test_decode_mixed_dims_batch(ray_session):
    """Mixed (w, h) batches decode via the per-dims grouped fallback
    (round-1 ADVICE: the documented row-wise path did not exist)."""
    import numpy as np
    import pyarrow as pa

    from featureextraction_jl_ray.functions.phash import ahash64_batch
    from featureextraction_jl_ray.stages.codec import with_pixel_features

    rng = np.random.default_rng(3)
    sizes = [16, 8, 16, 32, 8]
    pix = [rng.integers(0, 256, size=(s, s, 3), dtype=np.uint8) for s in sizes]
    tbl = pa.table({
        "image_id": pa.array([f"i{i}" for i in range(len(sizes))]),
        "bytes": pa.array([p.tobytes() for p in pix], type=pa.binary()),
        "w": pa.array(sizes, type=pa.int32()),
        "h": pa.array(sizes, type=pa.int32()),
        "fmt": pa.array(["raw"] * len(sizes)),
        "phash": pa.array([int(ahash64_batch(p[None])[0]) for p in pix],
                          type=pa.int64()),
    })
    out = with_pixel_features(
        ray_session.data.from_arrow(tbl), grid=4, verify_phash=True,
        batch_size=5,
    ).to_pandas()
    assert out.phash_ok.all()
    assert all(len(v) == 4 * 4 * 3 for v in out.pix)
    # spot-check one feature against a direct downsample
    want = pix[1].astype(np.float32).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    got = np.asarray(out.loc[out.image_id == "i1", "pix"].iloc[0]).reshape(4, 4, 3)
    np.testing.assert_allclose(got, want / 255.0, rtol=1e-6)


def test_hive_layout_write_and_entity_pruned_read(ray_session, tmp_path):
    """hive_layout=True writes entity_bucket=<id>/ dirs; the pruned reader
    lists only the buckets of the requested entities and returns exactly
    their rows (round-1 VERDICT item 10: prunable output layout)."""
    import os

    from featureextraction_jl_ray.sources.io import read_entity_partitions
    from featureextraction_jl_ray.synth import SynthConfig, synth_captions, synth_images

    cfg_s = SynthConfig(n_entities=30, seed=11)
    images = ray_session.data.from_arrow(synth_images(cfg_s))
    captions = ray_session.data.from_arrow(synth_captions(cfg_s))
    out_dir = str(tmp_path / "feat")
    fcfg = FlagshipConfig(num_buckets=8, hive_layout=True, fit_sample_rows=None)
    records, _ = run_flagship(images, captions, cfg=fcfg, out_dir=out_dir)
    assert records and all("entity_bucket=" in r["path"] for r in records)
    dirs = [d for d in os.listdir(out_dir) if d.startswith("entity_bucket=")]
    assert len(dirs) >= 2
    want = ["ent_00003", "ent_00007"]
    got = read_entity_partitions(out_dir, want, num_buckets=8).to_pandas()
    assert set(got.entity_id) == set(want)
    full = images.to_pandas()
    assert len(got) == (full.entity_id.isin(want)).sum()


def test_adaptive_num_buckets_scales(monkeypatch):
    from featureextraction_jl_ray.stages import partition
    from featureextraction_jl_ray.stages.partition import adaptive_num_buckets

    # pin the cluster-parallelism floor so the test is host-independent
    monkeypatch.setattr(partition, "_cluster_cpus", lambda: 4)
    assert adaptive_num_buckets(0) == 8
    assert adaptive_num_buckets(10_000) == 8
    assert adaptive_num_buckets(250_000 * 64) == 64
    assert adaptive_num_buckets(10**12) == 65_536  # bounded above
    # the floor itself: a big cluster lifts small inputs to 2x cpus
    monkeypatch.setattr(partition, "_cluster_cpus", lambda: 32)
    assert adaptive_num_buckets(10_000) == 64
    assert adaptive_num_buckets(250_000 * 100) == 100


def test_resume_pins_manifest_bucket_count(tables, tmp_path, monkeypatch):
    """E3 across cluster sizes: the adaptive bucket count floors at
    2x cluster CPUs, so a resume on a DIFFERENT cluster must take its
    partitioning from the manifest, not the ambient cluster — otherwise
    the fingerprint mismatches and resume refuses (round-3 review)."""
    from featureextraction_jl_ray.stages import partition

    images, captions = tables
    out = str(tmp_path / "resume_xsize")
    monkeypatch.setattr(partition, "_cluster_cpus", lambda: 4)
    cfg = FlagshipConfig(num_buckets=None, k=4, grid=4)
    recs, model = run_flagship(images, captions, cfg=cfg, out_dir=out)
    assert len(recs) > 0
    # "move" to a bigger cluster: the floor would now resolve differently
    monkeypatch.setattr(partition, "_cluster_cpus", lambda: 32)
    recs2, _ = resume_flagship(
        images, captions, out_dir=out,
        cfg=FlagshipConfig(num_buckets=None, k=4, grid=4), model=model)
    assert recs2 == []  # everything already complete — no refusal, no rework


def test_job_cli_run_and_resume(ray_session, tmp_path):
    """The `ray job submit` entry (featureextraction_jl_ray.job): a run
    writes partitions + manifest; --resume over an intact output is a
    no-op (all partitions skipped upstream of the shuffle)."""
    from featureextraction_jl_ray.job import main

    paths = write_synth_tables(CFG, str(tmp_path / "synth"))
    out = str(tmp_path / "features")
    rc = main(["--images", paths["images"], "--captions", paths["captions"],
               "--out", out, "--k", "10", "--num-buckets", "8"])
    assert rc == 0
    recs = load_manifest(out)
    assert recs and sum(r["rows"] for r in recs) > 0
    n_parts = len(recs)
    rc = main(["--images", paths["images"], "--captions", paths["captions"],
               "--out", out, "--k", "10", "--num-buckets", "8", "--resume"])
    assert rc == 0
    assert len(load_manifest(out)) == n_parts  # nothing rewritten
    # --delta over unchanged inputs is also a no-op (fingerprints match)
    rc = main(["--images", paths["images"], "--captions", paths["captions"],
               "--out", out, "--k", "10", "--num-buckets", "8", "--delta"])
    assert rc == 0
    assert len(load_manifest(out)) == n_parts
    # --resume and --delta are mutually exclusive
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["--images", paths["images"], "--captions", paths["captions"],
              "--out", out, "--resume", "--delta"])


def test_delta_run_rewrites_only_changed_buckets(ray_session, tables, result, tmp_path):
    """VERDICT r3 missing #5: grow the input → run_flagship_delta must
    rewrite ONLY the buckets whose input set changed, and the resulting
    output must equal a from-scratch run on the grown input
    (per-partition manifest checksums + content)."""
    import pyarrow as pa

    from featureextraction_jl_ray.functions.hashing import bucket_of
    from featureextraction_jl_ray.pipelines.flagship import run_flagship_delta
    from featureextraction_jl_ray.sources.io import latest_manifest_records

    images, captions = tables
    _, model = result

    # "old" input: drop every entity that hashes to buckets {0, 1}
    drop = np.array([0, 1])

    def prune(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch.column("entity_id").to_numpy(zero_copy_only=False),
                      FCFG.num_buckets, seed=0)
        return batch.filter(pa.array(~np.isin(b, drop)))

    old_imgs = images.map_batches(prune, batch_format="pyarrow",
                                  zero_copy_batch=True)
    old_caps = captions.map_batches(prune, batch_format="pyarrow",
                                    zero_copy_batch=True)

    out_delta = str(tmp_path / "delta")
    recs1, _ = run_flagship(old_imgs, old_caps, cfg=FCFG, model=model,
                            out_dir=out_delta)
    assert all("input_fp" in r for r in recs1)
    written1 = {r["partition_id"] for r in recs1}
    assert not (written1 & set(drop.tolist()))

    # grow back to the full input → delta run
    recs2, _ = run_flagship_delta(images, captions, out_dir=out_delta,
                                  cfg=FCFG, model=model)
    assert sorted(r["partition_id"] for r in recs2) == sorted(drop.tolist())

    # equals a from-scratch run on the full input, checksum for checksum
    out_full = str(tmp_path / "full")
    recs_full, _ = run_flagship(images, captions, cfg=FCFG, model=model,
                                out_dir=out_full)
    want = {r["partition_id"]: (r["rows"], r["checksum"]) for r in recs_full}
    got = {pid: (r["rows"], r["checksum"])
           for pid, r in latest_manifest_records(out_delta).items()}
    assert got == want

    # a second delta run with identical input rewrites nothing
    recs3, _ = run_flagship_delta(images, captions, out_dir=out_delta,
                                  cfg=FCFG, model=model)
    assert recs3 == []
