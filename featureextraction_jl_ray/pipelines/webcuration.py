"""Composed WEB-CRAWL curation funnel: raw (html, url) pages → clean,
deduplicated training documents.

    HtmlExtract         boilerplate strip + text-density line classifier
    CleanNormalize      NFC + control strip + whitespace collapse
    GopherQuality       the canonical quality rules → drop non-passing
    UrlNormalize        canonical URL + host
    exact_dedup(url)    one row per canonical URL (re-crawls, tracking-
                        param variants of the same page)
    exact_dedup(text)   one row per cleaned text (mirror sites / shared
                        body content across hosts)

Stage ORDER is load-bearing and the gate query locks it end-to-end:
quality runs on EXTRACTED+NORMALIZED text (raw HTML word counts would
gate on markup, not content), URL dedup keeps the smallest doc_id per
canonical URL *among quality survivors* (a quality-failing re-crawl
must not shadow a passing one), and the corpus text dedup runs LAST so
cross-host mirrors collapse after per-URL dedup.  Every stage up to the
two dedups is block-local (zero exchange); the dedups are the salted
two-stage reduce, the only all-to-alls in the funnel.
"""

from __future__ import annotations

from ..stages.dedup import exact_dedup
from ..stages.text import CleanNormalize, GopherQuality, HtmlExtract
from ..stages.url import UrlNormalize

__all__ = ["run_web_curation"]


def run_web_curation(
    ds,
    *,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
    num_buckets: int = 32,
    num_salts: int = 4,
    **gopher_thresholds,
):
    """Run the web-curation funnel (module docstring).  Returns the
    surviving rows with ``text`` (extracted + normalized), ``url_norm``,
    ``host`` and the Gopher signal columns."""
    import pyarrow.compute as pc

    out = ds.map_batches(HtmlExtract(html_col=html_col, out_col="text"),
                         batch_format="pyarrow", zero_copy_batch=True)
    out = out.map_batches(CleanNormalize(text_col="text"),
                          batch_format="pyarrow", zero_copy_batch=True)
    out = out.map_batches(GopherQuality("text", **gopher_thresholds),
                          batch_format="pyarrow", zero_copy_batch=True)
    out = out.map_batches(
        lambda t: t.filter(pc.fill_null(t.column("gopher_pass"), False)),
        batch_format="pyarrow", zero_copy_batch=True)
    out = out.map_batches(UrlNormalize(url_col=url_col),
                          batch_format="pyarrow", zero_copy_batch=True)
    out = exact_dedup(out, "url_norm", order_cols=[id_col],
                      num_salts=num_salts, num_buckets=num_buckets)
    out = exact_dedup(out, "text", order_cols=[id_col],
                      num_salts=num_salts, num_buckets=num_buckets)
    return out
