"""End-to-end multimodal training-set curation over an image+caption
table — the LAION-style pair-prep a text-to-image team runs:

    images(+captions)
      → image quality gates (variance-of-Laplacian blur score,
        exposure-clip fractions) — block-local, pixels never shuffle
      → caption token gate
      → perceptual near-dup collapse (phash hamming bands; only
        (hash, id) pairs ride the exchange)
      → aspect-ratio bucketing + pixel-budget batch packing
        (dimension-homogeneous training batches, metadata-layer only)
      → partitioned parquet write

Run:  python examples/multimodal_pipeline.py [out_dir]
"""

from __future__ import annotations

import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
os.environ["PYTHONPATH"] = _repo + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from featureextraction_jl_ray.pipelines.paircuration import (
        run_pair_curation,
    )
    from featureextraction_jl_ray.stages.codec import with_aspect_bucket
    from featureextraction_jl_ray.synth import SynthConfig, write_synth_tables

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fx_multimodal_out"
    paths = write_synth_tables(SynthConfig(n_entities=2000, seed=42),
                               "/tmp/fx_example_cache")
    images = rd.read_parquet(paths["images"])
    n_in = images.count()

    kept = run_pair_curation(images, min_caption_tokens=2,
                             blur_threshold=5.0, num_buckets=16)
    bucketed = with_aspect_bucket(kept)
    bucketed.write_parquet(out_dir, mode="overwrite")

    out = rd.read_parquet(out_dir)
    n_out = out.count()
    print(f"pairs in:  {n_in}")
    print(f"pairs out: {n_out}  ({n_out / max(n_in, 1):.1%} kept)")
    print("columns:", out.schema().names)
    ray.shutdown()


if __name__ == "__main__":
    main()
