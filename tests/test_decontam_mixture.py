"""Decontamination, mixture sampling, PII redaction: planted-case
semantics, messy-whitespace tokenizer exactness, plan arithmetic,
broadcast-cap guards.  (SQL parity for all three is gate-covered by
queries `decontaminate_docs` / `mixture_sample_docs` / `pii_redact`.)"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.split import mixture_plan
from featureextraction_jl_ray.stages.text import (
    PiiRedact,
    _word_ngrams,
    benchmark_ngrams,
    decontaminate,
)


def _ref_ngrams(texts, n):
    """naive reference: python split() (== '\\S+' tokens), per-row grams"""
    sh, k = [], []
    for t in texts:
        w = ("" if t is None else t).lower().split()
        grams = [" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 0))]
        sh.extend(grams)
        k.append(len(grams))
    return sh, k


def test_word_ngrams_matches_python_split_on_messy_whitespace():
    texts = [
        "a b c d",
        "  leading and   double  spaces here x",
        "trailing spaces two words a b c   ",
        "   ",          # whitespace-only
        "",             # empty
        None,           # null
        "one two",      # fewer than n words
        "tab\tand\nnewline separated words q r s",
    ]
    for n in (2, 3, 4):
        got_sh, got_k = _word_ngrams(pa.array(texts, type=pa.string()), n)
        want_sh, want_k = _ref_ngrams(texts, n)
        assert list(got_sh) == want_sh, f"n={n}"
        assert got_k.tolist() == want_k, f"n={n}"


def _docs_tables():
    # bench doc 100 carries the marker 4-gram; train doc 2 copies it,
    # train docs 1 and 3 do not
    train = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": ["totally clean words here nothing shared",
                 "prefix alpha beta gamma delta suffix words",
                 "short"],
    })
    bench = pa.table({
        "doc_id": pa.array([100], type=pa.int64()),
        "text": ["the marker is alpha beta gamma delta end"],
    })
    return train, bench


@pytest.mark.parametrize("method", ["exact", "hash"])
def test_decontaminate_planted_overlap(ray_session, method):
    import ray.data as rd

    train, bench = _docs_tables()
    out = (decontaminate(rd.from_arrow(train), rd.from_arrow(bench),
                         n=4, method=method)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["contaminated"].tolist() == [0, 1, 0]
    # doc 2 contains exactly one occurrence of one benchmark 4-gram
    assert out["n_hits"].tolist() == [0, 1, 0]


def test_decontaminate_filter_mode_keeps_schema(ray_session):
    import ray.data as rd

    train, bench = _docs_tables()
    train = train.append_column("extra", pa.array([10, 20, 30]))
    out = (decontaminate(rd.from_arrow(train), rd.from_arrow(bench),
                         n=4, mode="filter")
           .to_pandas().sort_values("doc_id", ignore_index=True))
    # contaminated doc 2 dropped; full original schema preserved
    assert out["doc_id"].tolist() == [1, 3]
    assert out.columns.tolist() == ["doc_id", "text", "extra"]
    assert out["extra"].tolist() == [10, 30]
    with pytest.raises(ValueError, match="mode"):
        decontaminate(rd.from_arrow(train), rd.from_arrow(bench),
                      mode="drop")


def test_decontaminate_empty_benchmark_and_short_docs(ray_session):
    import ray.data as rd

    train, _ = _docs_tables()
    empty_bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    }))
    out = decontaminate(rd.from_arrow(train), empty_bench, n=4).to_pandas()
    assert len(out) == 3 and out["contaminated"].sum() == 0


def test_benchmark_ngrams_cap_is_loud(ray_session):
    import ray.data as rd

    _, bench = _docs_tables()
    with pytest.raises(RuntimeError, match="max_benchmark_ngrams"):
        benchmark_ngrams(rd.from_arrow(bench), n=2, max_benchmark_ngrams=3)


def test_mixture_plan_integer_arithmetic():
    counts = {"a": 100, "b": 100, "c": 50, "zzz": 10}
    parts = {"a": 5, "b": 3, "c": 2, "missing": 1}  # P = 11
    bounds = mixture_plan(counts, parts)
    # 'missing' has no rows and 'zzz' has no part: both ignored
    assert set(bounds) == {"a", "b", "c"}
    T = min((100 * 11) // 5, (100 * 11) // 3, (50 * 11) // 2)  # = 220
    assert bounds["a"] == (T * 5 * 2**32) // (11 * 100)  # binding: == 2**32
    assert bounds["a"] == 2**32
    assert all(0 < b <= 2**32 for b in bounds.values())
    with pytest.raises(ValueError):
        mixture_plan(counts, {"a": 0.5, "b": 0.5})  # float parts rejected


def test_mixture_sample_deterministic_and_drops_unlisted(ray_session):
    import ray.data as rd
    from featureextraction_jl_ray.stages.split import mixture_sample

    rng = np.random.default_rng(7)
    grp = np.array(["a", "b", "c"], dtype=object)[rng.integers(0, 3, 3000)]
    t = pa.table({"id": pa.array(np.arange(3000), type=pa.int64()),
                  "g": pa.array(grp, type=pa.string())})
    parts = {"a": 3, "b": 1}
    one = mixture_sample(rd.from_arrow(t), "g", "id", parts).to_pandas()
    two = mixture_sample(rd.from_arrow(t), "g", "id", parts).to_pandas()
    assert one.sort_values("id", ignore_index=True).equals(
        two.sort_values("id", ignore_index=True))
    by = one.groupby("g").size()
    assert "c" not in by.index          # unlisted group dropped
    # binding group kept whole; realized mixture ≈ 3:1 (Bernoulli ±√n)
    n_a, n_b = int(by.get("a", 0)), int(by.get("b", 0))
    assert n_a > 0 and n_b > 0
    assert abs(n_a / max(n_b, 1) - 3.0) < 0.6


def test_pii_redact_planted_cases():
    t = pa.table({"text": pa.array([
        "mail bob.smith+x@sub.example.org now",
        "server at 10.0.255.7 port",
        "ssn 123-45-6789 ok",
        "call +1 (555) 123-4567 today",
        "clean words only",
        None,
    ])})
    out = PiiRedact()(t).to_pandas()
    assert out["text"].tolist() == [
        "mail <EMAIL> now",
        "server at <IP> port",
        "ssn <ID> ok",
        "call <PHONE> today",
        "clean words only",
        "",
    ]
    assert out["n_redactions"].tolist() == [1, 1, 1, 1, 0, 0]
    # placeholders are stable: a second pass changes nothing
    again = PiiRedact()(pa.table({"text": out["text"].values}))
    assert again.to_pandas()["text"].tolist() == out["text"].tolist()
    assert again.to_pandas()["n_redactions"].sum() == 0


def test_pii_redact_out_col_keeps_original():
    t = pa.table({"text": pa.array(["a@b.co here"])})
    out = PiiRedact(out_col="clean", count=False)(t).to_pandas()
    assert out["text"].tolist() == ["a@b.co here"]
    assert out["clean"].tolist() == ["<EMAIL> here"]
    assert "n_redactions" not in out.columns
