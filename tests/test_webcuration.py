"""Composed web-curation funnel (pipelines/webcuration.py): planted
stage-order and dedup cases.  (SQL parity is gate-covered end-to-end by
the `web_curation` query.)"""

from __future__ import annotations

import pyarrow as pa

PASS_BODY = ("<p>the quick brown fox jumps over the lazy dog and runs "
             "away with all of that energy to spare today.</p>")
JUNK_BODY = "<p>lorem</p>"  # fails word count + stop hits


def _page(body):
    return f"<html><body><nav><li>Home</li></nav>{body}</body></html>"


def test_web_curation_order_and_dedups(ray_session):
    import ray as _r
    from featureextraction_jl_ray.pipelines.webcuration import (
        run_web_curation)

    rows = [
        # (doc_id, html, url)
        # 1+2: same canonical URL; the SMALLER id fails quality → the
        # passing re-crawl must survive (dedup-before-quality loses it)
        (1, _page(JUNK_BODY), "http://A.com/x?utm_a=1"),
        (2, _page(PASS_BODY), "HTTP://a.com:80/x#frag"),
        # 3+4: different URLs, same body → corpus text dedup keeps 3
        (3, _page(PASS_BODY.replace("fox", "cat")), "http://b.com/y"),
        (4, _page(PASS_BODY.replace("fox", "cat")), "http://c.com/z"),
        # 5: unique passing page
        (5, _page(PASS_BODY.replace("fox", "owl")), "https://d.com/w/"),
        # 6: duplicate canonical URL of 5 — url dedup keeps 5
        (6, _page(PASS_BODY.replace("fox", "owl") + "<p>extra line.</p>"),
         "https://D.com:443/w"),
    ]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "html": [r[1] for r in rows],
                  "url": [r[2] for r in rows]})
    out = run_web_curation(_r.data.from_arrow(t), min_words=5,
                           min_stop_hits=1, num_buckets=2, num_salts=2)
    df = out.to_pandas().sort_values("doc_id", ignore_index=True)
    assert df["doc_id"].tolist() == [2, 3, 5]
    assert (df.loc[df.doc_id == 2, "url_norm"] == "http://a.com/x").all()
    assert (df.loc[df.doc_id == 5, "url_norm"] == "https://d.com/w").all()
    # extracted text is clean prose: no tags, no nav chrome
    txt = df.loc[df.doc_id == 2, "text"].iloc[0]
    assert "<" not in txt and "Home" not in txt and "fox" in txt
