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
