"""URL canonicalization (stages/url.py) — rewrite-chain edge cases and
the Dataset stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

from featureextraction_jl_ray.stages.url import (
    UrlNormalize,
    _normalize_arrays,
)

CASES = [
    # (raw, url_norm, host)
    ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&id=5#frag",
     "http://www.example.com/Path?id=5", "www.example.com"),
    ("https://Host.com:443/", "https://host.com", "host.com"),
    ("http://host/?utm_a=1", "http://host", "host"),          # query → empty
    ("http://h.io/a/b/?id=1&utm_b=2&fbclid=9",
     "http://h.io/a/b?id=1", "h.io"),                         # tail params
    ("https://h.io:8080/x?gclid=1&keep=2&utm_c=3",
     "https://h.io:8080/x?keep=2", "h.io:8080"),              # non-default port kept
    ("http://h.io:443/x", "http://h.io:443/x", "h.io:443"),   # 443 NOT http's default
    ("http://a.b/p?utm_a=1&utm_b=2",
     "http://a.b/p", "a.b"),                                  # consecutive tracking
    ("ftp://Mixed.Case/Z/", "ftp://mixed.case/Z", "mixed.case"),
    ("not a url", "not a url", None),                         # passthrough
    (None, None, None),
]


def test_url_normalize_rewrite_chain():
    raw = pa.array([c[0] for c in CASES])
    url_norm, host = _normalize_arrays(raw)
    assert url_norm.to_pylist() == [c[1] for c in CASES]
    assert host.to_pylist() == [c[2] for c in CASES]


def test_url_normalize_stage_replaces_existing_columns():
    t = pa.table({"url": [c[0] for c in CASES[:3]],
                  "url_norm": ["stale"] * 3, "host": ["stale"] * 3})
    out = UrlNormalize()(t)
    assert out.column_names == ["url", "url_norm", "host"]  # no duplicates
    assert out.column("url_norm").to_pylist() == [c[1] for c in CASES[:3]]


def test_url_normalize_dataset_roundtrip(ray_session):
    import ray as _r
    from featureextraction_jl_ray.stages.url import with_url_normalized

    ds = _r.data.from_arrow(pa.table({"url": [c[0] for c in CASES]}))
    got = with_url_normalized(ds, "url").to_pandas()
    assert list(got["url_norm"]) == [c[1] for c in CASES]


def test_url_normalize_empty(ray_session):
    t = pa.table({"url": pa.array([], pa.string())})
    out = UrlNormalize()(t)
    assert out.num_rows == 0
    assert out.column_names == ["url", "url_norm", "host"]
