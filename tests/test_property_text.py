"""Hypothesis property tests for the pure text/plan kernels: the
vectorized n-gram builder vs the python-split reference over arbitrary
unicode-ish text (no Ray launch per example), and mixture-plan integer
invariants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import example, given, settings
from hypothesis import strategies as st

from featureextraction_jl_ray.stages.split import mixture_plan
from featureextraction_jl_ray.stages.text import _word_ngrams, _word_spans

# words plus whitespace of every stripe (spaces, tabs, newlines, runs)
_text = st.text(
    alphabet=st.sampled_from(list("ab XYZ\t\n  é.@0-")), max_size=60)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(st.lists(st.one_of(st.none(), _text), min_size=0, max_size=8),
       st.integers(min_value=1, max_value=4))
@example(
    texts=['é  00\nY\t b X\t@é-b.aX  \n\tZZ--Y0a-\t\n0\n\t',
     None,
     None,
     None,
     None,
     'é  00\nY\t b X\t@é-b.aX  \n\tZZ--Y0a-\t\n0\n\t'],
    n=2,
).via('discovered failure')
def test_word_ngrams_property(texts, n):
    got_sh, got_k = _word_ngrams(pa.array(texts, type=pa.string()), n)
    want_sh, want_k = [], []
    for t in texts:
        w = ("" if t is None else t).lower().split()
        grams = [" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 0))]
        want_sh.extend(grams)
        want_k.append(len(grams))
    assert list(got_sh) == want_sh
    assert got_k.tolist() == want_k


@settings(max_examples=120, deadline=None, derandomize=True)
@given(st.lists(st.one_of(st.none(), _text), min_size=0, max_size=8),
       st.integers(min_value=1, max_value=6))
def test_word_spans_property(texts, w):
    got_text, got_row, got_idx = _word_spans(
        pa.array(texts, type=pa.string()), w)
    want_text, want_row, want_idx = [], [], []
    for r, t in enumerate(texts):
        toks = ("" if t is None else t).split()  # NO lowercase — spans
        for j in range(0, -(-len(toks) // w)):   # round-trip the bytes
            want_text.append(" ".join(toks[j * w:(j + 1) * w]))
            want_row.append(r)
            want_idx.append(j)
    assert got_text.to_pylist() == want_text
    assert got_row.tolist() == want_row
    assert got_idx.tolist() == want_idx


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    st.dictionaries(st.sampled_from("abcdef"),
                    st.integers(min_value=0, max_value=10_000),
                    min_size=0, max_size=6),
    st.dictionaries(st.sampled_from("abcdefgh"),
                    st.integers(min_value=0, max_value=9),
                    min_size=1, max_size=8),
)
def test_mixture_plan_invariants(counts, parts):
    if sum(parts.values()) == 0:
        return  # rejected by the P > 0 validation, covered elsewhere
    bounds = mixture_plan(counts, parts)
    P = sum(parts.values())
    eligible = {g for g, p in parts.items() if p > 0 and counts.get(g)}
    # only groups present on both sides get a bound, and every bound is
    # a valid exclusive uint32 threshold
    assert set(bounds) == eligible
    assert all(0 <= b <= 2**32 for b in bounds.values())
    if not eligible:
        return
    T = min((counts[g] * P) // parts[g] for g in eligible)
    # expected kept rows per group = n·bound/2³² ≈ T·p/P and never
    # exceeds the available rows (bound ≤ 2³² ⇔ rate ≤ 1)
    for g in eligible:
        assert bounds[g] == (T * parts[g] * 2**32) // (P * counts[g])
    # at least one group is binding (rate exactly 1) unless integer
    # flooring of T keeps everyone fractionally below capacity
    assert max(bounds.values()) <= 2**32
