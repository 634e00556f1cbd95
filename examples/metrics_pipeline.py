"""Label/score QA + drift + ranking metrics over the events table —
the evaluation pass a training-data pipeline runs before trusting a
label or score column:

    events.parquet
      → label-QA report (exact per-group ROC-AUC + two-sample KS +
        Welch effect size) — did the planted label separate?
      → ranking metrics (exact average precision, NDCG@100) — does a
        score column RANK well, not just separate?
      → robust statistics (exact weighted median / q-quantiles via the
        two-pass cut-partition search, Gini/Theil concentration)
      → temporal QA (per-user CUSUM change-point score, Spearman trend,
        lag-1 autocorrelation, time-weighted average)

Every exact order statistic here uses the PARTITION-PREFIX pattern:
range-partition on sampled value boundaries (equal values co-locate),
one narrow row exchange, bounded per-partition partials combined on the
driver — no task ever sorts a whole group, so the same code runs at
10⁹ rows/group.

Run:  python examples/metrics_pipeline.py [sf_dir]
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
import pyarrow as pa


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from featureextraction_jl_ray.pipelines.labelqa import run_label_qa
    from featureextraction_jl_ray.stages.metrics import (
        group_avg_precision,
        group_ndcg,
        grouped_weighted_median,
        inequality_stats,
    )
    from featureextraction_jl_ray.stages.window import (
        cusum_stats,
        time_weighted_avg,
        user_trend_spearman,
    )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        v = t.column("value").to_numpy(zero_copy_only=False)
        out = {c: t.column(c) for c in t.column_names}
        out["score"] = pa.array(np.floor(v))
        out["y"] = pa.array((u % 2 == 0).astype(np.int64))
        out["rel"] = pa.array((u % 3).astype(np.int64))
        return pa.table(out)

    labeled = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True)

    print("== label QA (AUC / KS / Welch per event_type) ==")
    print(run_label_qa(labeled, "event_type", "score", "y",
                       num_partitions=32).to_string(index=False))

    print("\n== ranking quality (AP, NDCG@100) ==")
    ap = group_avg_precision(labeled, "event_type", "score", "y",
                             "event_id", num_partitions=32)
    nd = group_ndcg(labeled, "event_type", "score", "rel", "event_id",
                    k=100, num_partitions=32)
    print(ap.merge(nd[["event_type", "ndcg"]], on="event_type")
            .to_string(index=False))

    print("\n== robust stats (exact p50/p90, Gini/Theil) ==")
    p50 = grouped_weighted_median(ds, "event_type", "value",
                                  num_partitions=32)
    p90 = grouped_weighted_median(ds, "event_type", "value", q=0.9,
                                  num_partitions=32)
    ineq = inequality_stats(ds, "event_type", "value", num_partitions=32)
    rep = (p50.rename(columns={"weighted_median": "p50"})
              [["event_type", "p50"]]
           .merge(p90.rename(columns={"weighted_median": "p90"})
                  [["event_type", "p90"]], on="event_type")
           .merge(ineq[["event_type", "gini", "theil"]], on="event_type"))
    print(rep.to_string(index=False))

    print("\n== temporal QA (top-5 CUSUM change-point users) ==")
    cs = cusum_stats(ds, "user_id", "ts", "value",
                     tiebreak_cols=("event_id",)).to_pandas()
    print(cs.nlargest(5, "cusum").to_string(index=False))

    print("\n== strongest monotonic trends (|Spearman|) ==")
    sp = user_trend_spearman(ds, "user_id", "ts", "value",
                             tiebreak_cols=("event_id",)).to_pandas()
    sp["abs"] = sp["spearman"].abs()
    print(sp.nlargest(5, "abs").drop(columns="abs").to_string(index=False))

    print("\n== time-weighted vs arithmetic mean (top divergence) ==")
    twa = time_weighted_avg(ds, "user_id", "ts", "value",
                            tiebreak_cols=("event_id",)).to_pandas()
    print(twa.head(5).to_string(index=False))

    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
