"""Empty-input behavior across the operator surface.

Ray Data 2.49 elides fully-empty blocks through map plans — even
``from_arrow(typed_empty).to_pandas()`` loses columns — so Dataset-
returning operators can only guarantee ZERO ROWS on empty input (the
framework drops the schema at the boundary; partially-empty datasets
keep schemas via the round-1 as-of empty-bucket fix).  Operators whose
results cross to driver-side pandas (knn top-k, near-dup pair pulls)
MUST pin their contract columns, and these tests assert that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _empty_events(ray_session):
    t = pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
    })
    return ray_session.data.from_arrow(t)


def _empty_docs(ray_session):
    t = pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    })
    return ray_session.data.from_arrow(t)


def test_grouped_aggregate_empty(ray_session):
    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate

    out = grouped_aggregate(
        _empty_events(ray_session), "event_type",
        {"s": ("value", "sum"), "v": ("value", "var")}, num_buckets=4,
    ).to_pandas()
    assert len(out) == 0


def test_exact_dedup_empty(ray_session):
    from featureextraction_jl_ray.stages.dedup import exact_dedup

    out = exact_dedup(_empty_events(ray_session), "event_type",
                      order_cols=["ts", "event_id"], num_salts=4,
                      num_buckets=4).to_pandas()
    assert len(out) == 0


def test_windows_empty(ray_session):
    from featureextraction_jl_ray.stages.window import with_rolling

    out = with_rolling(_empty_events(ray_session), "user_id", "ts", "value",
                       window="1h", aggs=("count", "sum"),
                       num_buckets=4).to_pandas()
    assert len(out) == 0


def test_minhash_pairs_empty(ray_session):
    from featureextraction_jl_ray.stages.minhash import (
        minhash_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    p1 = minhash_near_dup_pairs(_empty_docs(ray_session), text_col="text",
                                id_col="doc_id", num_buckets=4).to_pandas()
    assert len(p1) == 0  # schema elided by Ray on fully-empty data
    p2 = ngram_jaccard_pairs(_empty_docs(ray_session), text_col="text",
                             id_col="doc_id", num_buckets=4).to_pandas()
    assert len(p2) == 0


def test_text_stages_empty(ray_session):
    from featureextraction_jl_ray.stages.text import (
        with_langid,
        with_quality,
        with_token_stats,
    )

    ds = _empty_docs(ray_session)
    out = with_quality(with_token_stats(with_langid(ds))).to_pandas()
    assert len(out) == 0  # schema elided by Ray on fully-empty data


def test_knn_empty_corpus(ray_session):
    from featureextraction_jl_ray.stages.similarity import knn_cosine

    t = pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    })
    out = knn_cosine(ray_session.data.from_arrow(t),
                     np.zeros((2, 8)), vector_col="embedding",
                     id_col="vec_id", k=5)
    # pandas-boundary result: columns MUST be pinned even on empty
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "vec_id", "score"]


def test_new_window_ops_empty(ray_session):
    from featureextraction_jl_ray.stages.window import (
        with_decayed_sum,
        with_forward_rolling,
        with_session_stats,
    )

    ds = _empty_events(ray_session)
    assert with_session_stats(ds, "user_id", "ts", num_buckets=2
                              ).to_pandas().shape[0] == 0
    assert with_forward_rolling(ds, "user_id", "ts", "value", num_buckets=2
                                ).to_pandas().shape[0] == 0
    assert with_decayed_sum(ds, "user_id", "ts", "value", num_buckets=2
                            ).to_pandas().shape[0] == 0


def test_pivot_melt_empty(ray_session):
    from featureextraction_jl_ray.stages.groupagg import pivot_aggregate
    from featureextraction_jl_ray.stages.reshape import melt

    ds = _empty_events(ray_session)
    out = pivot_aggregate(ds, "user_id", "event_type", "value",
                          categories=["click"], num_buckets=2).to_pandas()
    assert len(out) == 0
    out = melt(ds, "event_id", ["value"], var_name="m").to_pandas()
    assert len(out) == 0


def test_bloom_semi_join_empty_keys(ray_session):
    import pytest

    from featureextraction_jl_ray.stages.joins import bloom_semi_join, build_bloom

    big = _empty_events(ray_session)
    keys = pd.DataFrame({"event_id": pd.Series(dtype="int64")})
    # empty big side → zero rows out, whatever the keys
    out = bloom_semi_join(big, pd.DataFrame({"event_id": [1, 2]}),
                          on="event_id").to_pandas()
    assert len(out) == 0
    # empty KEY side: the bloom is all-zeros → prefilter drops everything
    bf = build_bloom(keys, "event_id")
    assert not bf.contains(np.array([1, 2, 3])).any()


def test_profile_empty(ray_session):
    from featureextraction_jl_ray.stages.profile import profile_columns

    out = profile_columns(_empty_events(ray_session),
                          ["event_id", "event_type"])
    assert list(out.column) == ["event_id", "event_type"]
    assert (out.n == 0).all() and (out.n_distinct == 0).all()


def test_loud_guards_fire(ray_session):
    """Every scale guard added this session raises loudly instead of
    OOMing: decay carry-matrix bound, resample grid fan-out, edit1
    blocking-key group bound."""
    import pyarrow as pa
    import pytest

    from featureextraction_jl_ray.stages.asof import resample_entity_grid
    from featureextraction_jl_ray.stages.editdist import edit1_pairs
    from featureextraction_jl_ray.stages.window import with_decayed_sum

    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta([0, 3600 * 24 * 365], unit="s")
    t = pa.table({"eid": pa.array([0, 0], type=pa.int64()),
                  "ts": pa.array(ts, type=pa.timestamp("us")),
                  "v": [1.0, 2.0]})
    ds = ray_session.data.from_arrow(t)
    with pytest.raises(Exception, match="decay chunks|carry-matrix"):
        with_decayed_sum(ds, "eid", "ts", "v", tau="1ms", num_buckets=2
                         ).to_pandas()
    with pytest.raises(Exception, match="grid rows"):
        resample_entity_grid(ds, "eid", "ts", ["v"], freq="1s",
                             max_grid_rows_per_entity=100, num_buckets=2
                             ).to_pandas()
    docs = pa.table({"doc_id": pa.array(range(40), type=pa.int64()),
                     "text": ["identical blocking key"] * 40})
    with pytest.raises(Exception, match="max_group"):
        edit1_pairs(ray_session.data.from_arrow(docs), text_col="text",
                    id_col="doc_id", max_group=10).to_pandas()


def test_span_dedup_empty_and_blank_inputs(ray_session):
    from featureextraction_jl_ray.stages.dedup import span_dedup

    assert span_dedup(_empty_docs(ray_session)).to_pandas().shape[0] == 0
    # null / whitespace-only docs contribute zero spans and disappear
    blank = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([None, "   \t "], type=pa.string())}))
    assert span_dedup(blank).to_pandas().shape[0] == 0


def test_substring_dedup_empty_and_blank_inputs(ray_session):
    from featureextraction_jl_ray.stages.dedup import substring_dedup

    assert substring_dedup(_empty_docs(ray_session)).to_pandas().shape[0] == 0
    # null / zero-token docs keep their row with an empty dedup text
    blank = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array([None, "   \t "], type=pa.string())}))
    out = substring_dedup(blank).to_pandas().sort_values("doc_id")
    assert out.text_dedup.tolist() == ["", ""]
    assert out.n_tokens.tolist() == [0, 0]
    assert out.n_removed.tolist() == [0, 0]


def test_hygiene_ops_empty_inputs(ray_session):
    from featureextraction_jl_ray.stages.split import mixture_sample
    from featureextraction_jl_ray.stages.text import decontaminate, with_pii_redact

    empty = _empty_docs(ray_session)
    # empty train side: zero rows either mode
    bench = ray_session.data.from_arrow(
        pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": ["some benchmark words here live now ok fine"]}))
    assert decontaminate(empty, bench, n=4).to_pandas().shape[0] == 0
    assert decontaminate(empty, bench, n=4, mode="filter"
                         ).to_pandas().shape[0] == 0
    # empty corpus into the mixture: plan is empty, zero rows out
    out = mixture_sample(empty, "text", "doc_id", {"a": 1}).to_pandas()
    assert len(out) == 0
    # redaction of an empty block
    assert with_pii_redact(empty).to_pandas().shape[0] == 0


def test_late_round4_ops_empty(ray_session):
    """Empty-input contract for the continuation's operators: zero rows,
    no crash; driver-side pandas boundaries pin their columns."""
    import ray as _ray

    from featureextraction_jl_ray.stages.codec import (
        pack_images_by_pixels,
        with_aspect_bucket,
    )
    from featureextraction_jl_ray.stages.groupagg import grouped_aggregate
    from featureextraction_jl_ray.stages.minhash import set_jaccard_pairs
    from featureextraction_jl_ray.stages.profile import categorical_association
    from featureextraction_jl_ray.stages.scale import grouped_mad
    from featureextraction_jl_ray.stages.split import sample_global_k
    from featureextraction_jl_ray.stages.similarity import random_projection
    from featureextraction_jl_ray.stages.vectorize import bm25_score

    ev = _empty_events(ray_session)
    assert grouped_aggregate(ev, "user_id",
                             {"sk": ("value", "skew"),
                              "ku": ("value", "kurt")},
                             num_buckets=2).to_pandas().empty
    assert grouped_mad(ev, "user_id", "value", num_buckets=2).empty
    assert sample_global_k(ev, "event_id", k=5).to_pandas().empty
    assert set_jaccard_pairs(ev, key_col="user_id", value_col="event_type",
                             num_buckets=2).to_pandas().empty
    ca = categorical_association(ev, "event_type", "user_id", num_buckets=2)
    assert len(ca) == 1 and ca.dof[0] <= 0  # degenerate grid, no crash

    docs = _empty_docs(ray_session)
    assert bm25_score(docs, ["x"], text_col="text",
                      id_col="doc_id").to_pandas().empty

    imgs = ray_session.data.from_arrow(pa.table({
        "image_id": pa.array([], type=pa.int64()),
        "w": pa.array([], type=pa.int64()),
        "h": pa.array([], type=pa.int64()),
    }))
    bucketed = with_aspect_bucket(imgs)
    assert bucketed.to_pandas().empty
    assert pack_images_by_pixels(bucketed, budget=100).to_pandas().empty

    emb = ray_session.data.from_arrow(pa.table({
        "vec_id": pa.array([], type=pa.int64()),
        "embedding": pa.array([], type=pa.list_(pa.float32())),
    }))
    assert random_projection(emb, vector_col="embedding",
                             out_dim=4).to_pandas().empty


def test_resumption_ops_empty(ray_session):
    """funnel / cohort_retention / weighted_thin / grouped_quantile_bucket
    / grouped_robust_scale / embedding_decontaminate: zero rows on empty
    input, no crash."""
    from featureextraction_jl_ray.stages.groupagg import cohort_retention
    from featureextraction_jl_ray.stages.scale import (
        grouped_quantile_bucket,
        grouped_robust_scale,
    )
    from featureextraction_jl_ray.stages.similarity import (
        embedding_decontaminate,
    )
    from featureextraction_jl_ray.stages.split import weighted_thin
    from featureextraction_jl_ray.stages.window import funnel

    ev = _empty_events(ray_session)
    assert funnel(ev, "user_id", "ts", "event_type",
                  ["view", "click"], num_buckets=2).count() == 0
    assert cohort_retention(ev, "user_id", "ts",
                            num_buckets=2).count() == 0
    withp = ray_session.data.from_arrow(pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "p": pa.array([], type=pa.float64())}))
    assert weighted_thin(withp, "event_id", "p").count() == 0
    assert grouped_quantile_bucket(ev, "user_id", "value",
                                   method="exact").count() == 0
    assert grouped_robust_scale(ev, "user_id", "value",
                                num_buckets=2).count() == 0
    emb = ray_session.data.from_arrow(pa.table({
        "vid": pa.array([], type=pa.int64()),
        "emb": pa.array([], type=pa.list_(pa.float64()))}))
    one = ray_session.data.from_pandas(
        pd.DataFrame({"vid": [1], "emb": [[1.0, 0.0]]}))
    assert embedding_decontaminate(emb, one, vector_col="emb",
                                   id_col="vid").count() == 0
