"""Hypothesis property tests for the line-level cleaning kernels
(LineFilter / LineDedup offsets-reassembly) and char_entropy vs plain
python references over arbitrary unicode-ish text — no Ray launch per
example, derandomized for reproducible gate runs."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from featureextraction_jl_ray.stages.text import (
    CleanNormalize,
    LineDedup,
    LineFilter,
    char_entropy,
)

# lines of words/punct/whitespace incl. newlines, tabs, accents
_text = st.text(
    alphabet=st.sampled_from(list("ab c.!?\"\n\t Zé0-")), max_size=80)
_texts = st.lists(st.one_of(st.none(), _text), min_size=0, max_size=8)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_texts, st.integers(min_value=1, max_value=4))
def test_line_filter_property(texts, min_words):
    out = LineFilter(out_col="clean", min_words=min_words)(
        pa.table({"text": pa.array(texts, type=pa.string())}))
    got_t = out.column("clean").to_pylist()
    got_k = out.column("n_lines_kept").to_pylist()
    for i, t in enumerate(texts):
        kept = [ln for ln in (t or "").split("\n")
                if ln.rstrip(" \t")[-1:] in '.!?"'
                and len(ln.split()) >= min_words]
        assert got_t[i] == "\n".join(kept), (i, t)
        assert got_k[i] == len(kept), (i, t)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_texts)
def test_line_dedup_property(texts):
    out = LineDedup(out_col="clean")(
        pa.table({"text": pa.array(texts, type=pa.string())}))
    got_t = out.column("clean").to_pylist()
    got_k = out.column("n_lines_kept").to_pylist()
    for i, t in enumerate(texts):
        seen, kept = set(), []
        for ln in (t or "").split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        assert got_t[i] == "\n".join(kept), (i, t)
        assert got_k[i] == len(kept), (i, t)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_texts)
def test_char_entropy_property(texts):
    got = char_entropy(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        t = t or ""
        if not t:
            want = 0.0
        else:
            n = len(t)
            cnt: dict[str, int] = {}
            for c in t:
                cnt[c] = cnt.get(c, 0) + 1
            want = -sum(v / n * math.log2(v / n) for v in cnt.values())
        assert abs(got[i] - want) < 1e-10, (i, t)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(_texts)
def test_clean_normalize_property(texts):
    import unicodedata

    out = CleanNormalize()(
        pa.table({"text": pa.array(texts, type=pa.string())}))
    got = out.column("text").to_pylist()
    for i, t in enumerate(texts):
        want = re.sub(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "", t or "")
        want = unicodedata.normalize("NFC", want)
        want = re.sub(r"\s+", " ", want).strip()
        assert got[i] == want, (i, t)
