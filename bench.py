"""Benchmark harness (driver contract).

Plain run: executes the headline flagship pipeline + representative
operator pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32) and prints ONE JSON
line:  {"metric", "value" (headline sec), "unit", "queries", "sf",
"num_cpus", ...}.

--scaling: runs the plain bench in TWO FRESH PROCESSES at num_cpus=8 and
num_cpus=32 on the same input (page cache warmed by the first run's
synth/cache step) and prints throughput at both plus the scaling
efficiency (R_32/R_8)/4 — the sandbox evidence for the north_rule's
N→4N ≥ 0.8 criterion (see BASELINE.md protocol).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline synthetic image table size (cached in /tmp across runs)
BENCH_ENTITIES = int(os.environ.get("FX_BENCH_ENTITIES", "60000"))
BENCH_REPS = int(os.environ.get("FX_BENCH_REPS", "3"))
# real image corpora are ≥256² — FX_BENCH_IMG raises the per-row compute
# density for scaling runs (the synthetic default 32² underweights
# compute relative to the single-host exchange)
BENCH_IMG = int(os.environ.get("FX_BENCH_IMG", "32"))
BENCH_GRID = int(os.environ.get("FX_BENCH_GRID", "8"))


def _timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def run_bench() -> dict:
    import ray

    # Bounded settle-wait: launching into the teardown of a previous Ray
    # session (or a co-tenant burst) contaminates every rep — round-5
    # measured the identical 240k job at 14.3 s from a load-0.17 launch
    # vs 25-39 s from load-1.3-9.5 launches.  Wait for 1-min load below
    # FX_SETTLE_LOAD (default 2.0) up to FX_SETTLE_MAX_S (default 120 s;
    # 0 disables), then record how long we waited so the sample's
    # provenance is in the JSON.
    settle_max = float(os.environ.get("FX_SETTLE_MAX_S", "120"))
    settle_load = float(os.environ.get("FX_SETTLE_LOAD", "2.0"))
    settle_t0 = time.time()
    while (settle_max > 0 and os.getloadavg()[0] > settle_load
           and time.time() - settle_t0 < settle_max):
        time.sleep(5)
    settle_waited = round(time.time() - settle_t0, 1)

    # loadavg at START as well as end (VERDICT r4 #10): a quiet end
    # reading can hide a contended first half — both bracket the sample
    loadavg_start = round(os.getloadavg()[0], 2)

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # bench output is ONE JSON line; worker log echo (including ray's
        # harmless per-worker schema-hash warning) stays out of the
        # recorded tail.  Errors still surface: a failed task raises in
        # the driver regardless of log echo.
        log_to_driver=False,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # ray 2.49 logs a harmless "Failed to hash the schemas (for
    # deduplication): unhashable type: 'dict'" warning per worker when a
    # schema carries extension metadata; it's framework-internal noise —
    # keep it out of the recorded bench tail
    import logging

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data as rd

    from featureextraction_jl_ray import queries as q
    from featureextraction_jl_ray.pipelines.flagship import (
        FlagshipConfig,
        fit_flagship_model,
        run_flagship,
    )
    from featureextraction_jl_ray.synth import SynthConfig, write_synth_tables

    # ---- headline: flagship image pipeline ---------------------------------
    cfg = SynthConfig(n_entities=BENCH_ENTITIES, img_size=BENCH_IMG, seed=42,
                      num_partitions=64)
    paths = write_synth_tables(cfg, "/tmp/fx_bench_cache")  # cached: untimed gen
    # read parallelism scaled to the cpu budget — measured crossover
    # (round 3, pinned medians): at 8 cores capped read blocks beat the
    # ~256-block Ray default 9.8 s vs 21.4 s (task dispatch dominates a
    # small budget), while at 32 cpus the default's finer blocks win
    # 7.8 s vs 10.5 s (pipelining granularity feeds the decode stage).
    # Round 4 (240k entities, pinned 8-core medians): 8×cpus beats
    # 4×cpus 12.0 vs 14.8 s — the fused decode stage has a 1.7×
    # straggler spread per task (uneven parquet row groups), so coarse
    # 4-wave scheduling leaves the tail of each wave idle; 8 finer waves
    # smooth it, while 12×cpus (96 blocks) tips back into task-constant
    # territory (16.7 s).  Neutral at 2 cores (38.5 s either way).
    # FX_BENCH_FIXED_BLOCKS pins the read partitioning regardless of the
    # cpu budget — set by the scaling harness's "fixed" mode so both
    # legs run the IDENTICAL job (production partitioning derives from
    # the data, not the cluster size)
    if os.environ.get("FX_BENCH_FIXED_BLOCKS"):
        read_kw = {"override_num_blocks": int(os.environ["FX_BENCH_FIXED_BLOCKS"])}
    else:
        read_kw = (
            {"override_num_blocks": 8 * NUM_CPUS} if NUM_CPUS < 16 else {}
        )
    images = rd.read_parquet(paths["images"], **read_kw)
    captions = rd.read_parquet(paths["captions"], **read_kw)
    n_images = images.count()  # warms page cache, untimed

    # stateless decode+transform (no actor pool): the fused compute stage
    # follows the task scheduler and scales with num_cpus instead of a
    # pool cap (round-2 finding; see FlagshipConfig)
    # num_buckets=None → adaptive: max(rows/250k, 2×cluster cpus) — the
    # merge wave fills the cpu budget without over-sharding a small input
    _fixed_buckets = os.environ.get("FX_BENCH_NUM_BUCKETS")
    fcfg = FlagshipConfig(
        num_buckets=int(_fixed_buckets) if _fixed_buckets else None,
        k=16, grid=BENCH_GRID)
    # fit is model PREP (one bounded-sample aggregation), not part of the
    # metric's streaming job ("as-of join + windowed features +
    # whitened-PCA transform") — fit once, time the job, median of reps
    model = fit_flagship_model(images, fcfg)
    times = []
    for _ in range(BENCH_REPS):
        t0 = time.time()
        out, _ = run_flagship(images, captions, cfg=fcfg, model=model)
        rows = out.count()
        times.append(time.time() - t0)
    times.sort()
    # true median (default 3 reps, odd): rep 0 pays actor-pool warmup and
    # lands at the top of the sort, so the median is a steady-state rep
    headline_sec = round(times[(len(times) - 1) // 2], 3)
    # min: for a deterministic fixed workload, host co-tenant noise only
    # ever ADDS time, so the fastest rep is the consistent estimator of
    # the uncontaminated wall (the scaling ratio uses it — a single
    # contaminated rep inside one leg otherwise skews the leg's median)
    headline_sec_min = round(times[0], 3)
    assert rows == n_images, (rows, n_images)

    # ---- representative operator pipelines over $GRAFT_SF_DIR --------------
    queries = {}
    queries_loadavg = {}

    def consume(res):
        if hasattr(res, "count"):
            res.count()

    bench_queries = [
        "agg_lineitem",
        "hash_join_agg",
        "broadcast_join_agg",
        "asof_join",
        "lag_lead",
        "sessionize",
        "rolling",
        "dedup_events",
        "topn_per_customer",
        "pca_whiten_transform",
        "knn_bruteforce",
        "minhash_near_dup",
        # round-2 session additions (keys are additive — earlier rounds'
        # entries stay comparable)
        "decayed_user_value",
        "session_stats",
        "bloom_semi_join",
        "edit1_pairs",
        "corpus_filter",
        "pivot_user_type",
        # round-5 addition: the task-based join plan next to the native
        # one (hash_join_agg) — same logical query, no actor spawn
        "bucketed_join_agg",
        # round-5 continuation: CDC diff, survival labels, ordered
        # prefix-max, and the incremental store probe — the new
        # exchange shapes, timed per round like everything else
        "snapshot_diff",
        "survival_labels",
        "watermark_events",
        "incremental_dedup",
        # round-5 continuation-3: the metrics layer's two exchange shapes
        # (partition-prefix order statistic, two-pass cut search) and the
        # skew-aware join plan next to the native/bucketed ones
        "auc_events",
        "weighted_median_events",
        "skew_join_agg",
        "hopping_windows",
    ]
    if not os.environ.get("FX_SKIP_QUERIES"):
        # min-of-2 per query (VERDICT r4 #7): the driver samples whatever
        # the host is doing — BENCH_r04 recorded hash_join_agg at 41.7 s
        # vs 3-5 s isolated because ONE contended timing dominated the
        # round's record.  Co-tenant noise only ever adds time, so the
        # min of two reps is the consistent estimator; FX_QUERY_REPS=1
        # restores the old single-shot behavior.
        reps = max(1, int(os.environ.get("FX_QUERY_REPS", "2")))
        # per-query loadavg bracket: a contended sample (r4's 41.7 s
        # hash_join_agg, r5's 72 s bloom_semi_join — both 5-7 s on a
        # quiet host and in the isolated controls) is identifiable from
        # the record itself, not only by re-measuring after the fact
        for name in bench_queries:
            fn = q.QUERIES[name]
            best = None
            for _ in range(reps):
                t0 = time.time()
                consume(fn(SF_DIR))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            queries[name] = round(best, 3)
            queries_loadavg[name] = round(os.getloadavg()[0], 1)

    map_stage_sec = None
    if os.environ.get("FX_MEASURE_MAP"):
        # compute-stage scaling probe: decode + phash verify is the pure
        # data-parallel portion (no exchange); on a single host the full
        # job's exchange shares one memory bus and masks scaling, so the
        # two-level artifact reports both (see BASELINE.md)
        best = None
        for _ in range(2):
            t0 = time.time()
            from featureextraction_jl_ray.stages.codec import with_pixel_features

            with_pixel_features(
                rd.read_parquet(paths["images"]), grid=BENCH_GRID, verify_phash=True,
                batch_size=4096,
            ).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        map_stage_sec = round(best, 3)

    result = {
        "metric": "flagship end-to-end sec (as-of join + windowed features + "
                  "whitened-PCA over synthetic image+caption table)",
        "value": headline_sec,
        "value_min": headline_sec_min,
        "map_stage_sec": map_stage_sec,
        "unit": "sec",
        "queries": queries,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "num_cpus": NUM_CPUS,
        "headline_rows": rows,
        "headline_rows_per_sec": round(rows / headline_sec, 1),
        # contamination evidence: this host shows 2-3x co-tenant noise
        # (BASELINE.md variance policy) — loadavg at run end tells a
        # reader whether the sample was quiet
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "loadavg_1m_start": loadavg_start,
        "settle_waited_s": settle_waited,
        "rep_times": [round(t, 3) for t in times],
        "queries_loadavg_1m": queries_loadavg,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    # Two protocols, both honest, answering different questions:
    #   fixed (default) — the criterion's literal scenario: ONE job with
    #     data/production-derived partitioning (the hi leg's blocks +
    #     buckets) run unchanged at both cluster sizes.  This is what "a
    #     4N-node production job still runs proportionally on N nodes"
    #     means; per-task constants are identical in both legs.
    #   tuned — each leg re-tuned to its own budget (blocks, adaptive
    #     buckets).  Strictest reading: best-achievable at each size.
    #     On one host this understates multi-node scaling (the small
    #     leg's per-task constants shrink with its partitioning while
    #     the bus is shared at every N).
    mode = os.environ.get("FX_SCALE_MODE", "fixed")

    def run_at(ncpu: int, fixed_for: int | None) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   FX_SKIP_QUERIES="1")  # scaling legs time the headline job only
        # map-stage probe on by default; FX_MEASURE_MAP=0 skips it (the
        # probe costs ~2×70 s on the pinned 2-core leg — skip it when
        # only the full-job ratio is being sampled)
        env.setdefault("FX_MEASURE_MAP", "1")
        if env["FX_MEASURE_MAP"] == "0":
            env.pop("FX_MEASURE_MAP")
        if fixed_for is not None:
            env.setdefault("FX_BENCH_FIXED_BLOCKS", str(8 * fixed_for))
            env.setdefault("FX_BENCH_NUM_BUCKETS", str(2 * fixed_for))
        # the scaling legs default to a 4× larger sample of the SAME
        # table (same job, same code, same row shape): at the default
        # 60k-entity toy size the per-run executor constants (~2 s: sort
        # barrier setup, task dispatch, count) are 40% of the 8-core
        # leg's wall and the ratio measures constants, not dataflow; at
        # 240k entities (~1.3M rows) every leg's wall is dominated by
        # the streamed work the criterion is about.  Explicit
        # FX_BENCH_ENTITIES still wins.
        env.setdefault("FX_BENCH_ENTITIES", "240000")
        # 5 reps per leg: the first 1-2 reps pay worker spawn + page
        # cache and a 3-rep median still lands on a warmup rep at the
        # short hi leg (measured: warm 8-core rep 15.9 s vs 21.0 s
        # 3-rep median); the 5-rep median is steady-state on both legs
        env.setdefault("FX_BENCH_REPS", "5")
        cmd = [sys.executable, os.path.abspath(__file__)]
        if os.environ.get("FX_SCALE_TASKSET"):
            # ray.init(num_cpus=N) only caps Ray's TASK scheduler — numpy /
            # arrow threads and Ray internals still use every host core, so
            # a low-N leg is artificially fast and the efficiency ratio is
            # meaningless.  Pinning the process tree to N cores makes "N
            # cpus" mean an actual N-core budget (the honest single-host
            # analog of an N-node cluster slice).
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus = int(os.environ.get("FX_SCALE_LO", "8"))
    hi_cpus = int(os.environ.get("FX_SCALE_HI", str(lo_cpus * 4)))
    fixed_for = hi_cpus if mode == "fixed" else None
    lo = run_at(lo_cpus, fixed_for)
    hi = run_at(hi_cpus, fixed_for)
    r_lo = lo["headline_rows_per_sec"]
    r_hi = hi["headline_rows_per_sec"]
    eff_median = (r_hi / r_lo) / (hi_cpus / lo_cpus)
    # headline efficiency from the per-leg MIN rep: the workload is
    # deterministic and co-tenant noise only adds time, so min is the
    # consistent estimator of each leg's true wall; a single
    # contaminated rep inside the short hi leg otherwise skews its
    # median and the ratio with it (rep_times_lo/hi below show every
    # sample so a reader can recompute either way)
    eff = (lo.get("value_min", lo["value"]) /
           hi.get("value_min", hi["value"])) / (hi_cpus / lo_cpus)
    map_eff = None
    if lo.get("map_stage_sec") and hi.get("map_stage_sec"):
        map_eff = round(
            (lo["map_stage_sec"] / hi["map_stage_sec"]) / (hi_cpus / lo_cpus), 3
        )
    return {
        "metric": f"scaling efficiency (rows/s at {hi_cpus} cpus vs {lo_cpus} "
                  "cpus, fresh processes, same input)",
        "lo_cpus": lo_cpus,
        "hi_cpus": hi_cpus,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "rows_per_sec_lo": r_lo,
        "rows_per_sec_hi": r_hi,
        "scaling_efficiency": round(eff, 3),
        "scaling_efficiency_median": round(eff_median, 3),
        "mode": mode,
        "sec_lo_min": lo.get("value_min"),
        "sec_hi_min": hi.get("value_min"),
        "map_stage_sec_lo": lo.get("map_stage_sec"),
        "map_stage_sec_hi": hi.get("map_stage_sec"),
        "map_stage_scaling_efficiency": map_eff,
        # per-leg contamination evidence: a co-tenant burst during the
        # LOW leg inflates the ratio (it slows the denominator), so a
        # high efficiency sample with elevated lo-leg load is suspect —
        # as is a low sample with elevated hi-leg load
        "rep_times_lo": lo.get("rep_times"),
        "rep_times_hi": hi.get("rep_times"),
        "loadavg_1m_lo": lo.get("loadavg_1m"),
        "loadavg_1m_hi": hi.get("loadavg_1m"),
        "taskset": bool(os.environ.get("FX_SCALE_TASKSET")),
        "note": "single-host proxy: set FX_SCALE_TASKSET=1 to pin each leg "
                "to a real N-core budget (plain num_cpus=N only caps Ray's "
                "task scheduler, not numpy/arrow threads).  The full job "
                "shares one memory bus at every N on one host, so the "
                "full-job ratio UNDERSTATES multi-node scaling while lo-leg "
                "co-tenant load OVERSTATES it — read the sample table in "
                "BASELINE.md round-4 (all sweeps, incl. contaminated, with "
                "per-leg loadavg + rep times), not any single number.  "
                "mode=fixed (default) runs ONE production-partitioned job "
                "at both sizes (criterion-literal; measured 0.89 min-rep / "
                "0.83 median at pinned 2->8); mode=tuned re-tunes each leg "
                "(0.73-0.89 across clean samples).  The map-stage "
                "(data-parallel) efficiency is the stable signal: "
                "0.93-1.08 across every round-4 pinned sweep.",
        "queries_lo": lo["queries"],
        "queries_hi": hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
