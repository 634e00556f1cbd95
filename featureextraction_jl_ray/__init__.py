"""featureextraction_jl_ray — a Ray-Data-native feature-engineering engine.

A from-scratch engine with the statistical capabilities of
``trthatcher/FeatureExtraction.jl`` (streaming PCA via distributed
Gram/covariance accumulation, PCA/ZCA whitening, kernel centering — see
SURVEY.md §2-A) wrapped in a point-in-time / as-of-join + windowed
feature-engineering dataflow (SURVEY.md §2-B), expressed end-to-end as
``ray.data.Dataset`` streaming pipelines.

Layout
------
- ``state``     — numerical state: moment accumulators, PCA/whitening
                  models, kernel-centering state.  Pure NumPy objects,
                  broadcast via ``ray.put``; never Datasets.
- ``stages``    — Dataset → Dataset operators: window ops, as-of join,
                  dedup, text analysis, similarity search, codecs,
                  transformer actor pools.
- ``sources``   — readers/writers (parquet now, lance behind an
                  import-guard) and the checkpoint-manifest sink.
- ``functions`` — small vectorized helpers (stable hashing, phash,
                  list-column ↔ NumPy bridging).
- ``pipelines`` — composed end-to-end pipelines (the flagship
                  image+caption feature pipeline, fit, resume).

Conventions (SURVEY.md §1.2): rows = observations; covariance divisor is
``n - 1``; feature vectors are Arrow ``list<float>`` / fixed-size-list
columns; models are tiny NumPy artifacts.

NOTE on reference citations: the reference mirror at /root/reference was
EMPTY in every session so far (SURVEY.md §0), so docstrings cite the
driver metadata (BASELINE.json) and SURVEY.md instead of file:line.
"""

__version__ = "0.1.0"


def configure_execution(ctx=None) -> None:
    """Engine-level Ray Data execution tuning (idempotent; applied once
    at package import so every entry point — driver gate, bench, tests,
    user pipelines — runs the same executor configuration).

    ``op_resource_reservation_enabled = False``: Ray 2.49's reservation
    allocator grants each eligible operator ``reservation_ratio/num_ops``
    of the cluster plus an equal share of the rest — on a small CPU
    budget running a 5-operator pipeline (read → fused decode/whiten/tag
    → union → sort → merge) the hot fused stage is capped at ~2
    concurrent tasks regardless of idle CPUs.  Measured on the flagship
    job, pinned 8 cores: 12.1 s → 6.7 s median (2 cores: 34.7 → 12.8 s)
    with reservation off; per-op stats show the fused stage going from
    2-wide to ~7-wide.  The engine's stages bound their own memory
    (adaptive bucket sizing, block-sized batches, byte-budgeted
    broadcasts), so FIFO sharing cannot OOM them; set
    ``FX_OP_RESERVATION=1`` to restore Ray's default allocator.
    """
    import os

    try:
        from ray.data import DataContext
    except ImportError:  # pragma: no cover - ray always present in target env
        return
    ctx = ctx or DataContext.get_current()
    if not os.environ.get("FX_OP_RESERVATION"):
        ctx.op_resource_reservation_enabled = False


configure_execution()
