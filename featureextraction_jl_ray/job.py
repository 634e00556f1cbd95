"""The submittable job script (north_rule: "run via ray job submit").

    ray job submit --working-dir . -- \
        python -m featureextraction_jl_ray.job \
            --images s3://.../images --captions s3://.../captions \
            --out s3://.../features --hive-layout

Runs the flagship pipeline (as-of join + windowed features + whitened-PCA
transform) with a checkpointed, partition-manifested write; re-submitting
with ``--resume`` after a kill skips every partition whose manifest record
and file survive, pruning their rows upstream of the shuffle.

Owns its Ray session (the ONLY module besides bench.py and the test
fixture that may): inside ``ray job submit`` the address env is already
set, standalone it starts local — both via the guarded init below.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="featureextraction_jl_ray.job",
        description="flagship feature pipeline: resumable checkpointed run",
    )
    p.add_argument("--images", required=True, help="parquet dir of the image table")
    p.add_argument("--captions", required=True, help="parquet dir of the caption table")
    p.add_argument("--out", required=True, help="output dir (parquet + manifest)")
    p.add_argument("--grid", type=int, default=8)
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--mode", default="pca_whiten",
                   choices=["pca", "pca_whiten", "zca"])
    p.add_argument("--num-buckets", type=int, default=None,
                   help="wide-exchange bucket count (default: adaptive to rows)")
    p.add_argument("--hive-layout", action="store_true",
                   help="entity_bucket=<id>/ dirs for downstream pruned reads")
    p.add_argument("--resume", action="store_true",
                   help="skip partitions already complete in the manifest")
    p.add_argument("--delta", action="store_true",
                   help="incremental run over grown inputs: rerun ONLY the "
                        "buckets whose recorded input fingerprint changed "
                        "(manifest field written by every checkpointed run)")
    args = p.parse_args(argv)
    if args.resume and args.delta:
        p.error("--resume and --delta are exclusive (delta subsumes resume: "
                "an unchanged completed partition is skipped either way)")

    import ray

    if not ray.is_initialized():  # ray job submit sets the address env
        ray.init(include_dashboard=False)
    import ray.data as rd

    from .pipelines.flagship import (
        FlagshipConfig,
        resume_flagship,
        run_flagship,
        run_flagship_delta,
    )

    cfg = FlagshipConfig(grid=args.grid, k=args.k, mode=args.mode,
                         num_buckets=args.num_buckets,
                         hive_layout=args.hive_layout)
    images = rd.read_parquet(args.images)
    captions = rd.read_parquet(args.captions)
    if args.resume:
        recs, _model = resume_flagship(images, captions, out_dir=args.out, cfg=cfg)
    elif args.delta:
        recs, _model = run_flagship_delta(images, captions, out_dir=args.out,
                                          cfg=cfg)
    else:
        recs, _model = run_flagship(images, captions, cfg=cfg, out_dir=args.out)
    rows = sum(r.get("rows", 0) for r in recs)
    print(json.dumps({"partitions_written": len(recs), "rows": rows,
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
