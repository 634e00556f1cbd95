"""URL canonicalization for web-crawl corpora (the CCNet/RefinedWeb
"url dedup key" preprocessing class).

A crawl's URL column arrives with mixed-case schemes/hosts, default
ports, tracking query parameters, fragments and trailing slashes — all
of which split one logical page across many keys and defeat exact URL
dedup / per-host quotas.  :class:`UrlNormalize` applies a FIXED,
documented chain of RE2 rewrites (pyarrow compute kernels, block-local,
zero exchange) so the same chain can be mirrored step-for-step in a SQL
oracle:

  1. fragment dropped (``#...``)
  2. scheme and host lowercased (path/query case preserved)
  3. default port stripped (``:80`` for http, ``:443`` for https)
  4. tracking params removed (``utm_*``, ``gclid``, ``fbclid``), the
     lone/leading ``?`` cleaned up
  5. trailing path slashes dropped (including the root slash — the
     canonical bare-host form)

Rows that don't look like a URL (no ``scheme://host`` prefix) pass
through unchanged.  Everything is RE2 (no lookaheads/backrefs in the
patterns themselves), so DuckDB's regexp_* mirror it exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["UrlNormalize", "with_url_normalized", "TRACKING_PARAMS_RE"]

# one alternation shared by the mid-query and tail rewrites (and the SQL
# oracle) — extend here, not inline
TRACKING_PARAMS_RE = "(utm_[A-Za-z0-9_]*|gclid|fbclid)"

_SPLIT_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]*)(?P<rest>[\s\S]*)$"


def _normalize_arrays(u: pa.ChunkedArray | pa.Array):
    """Return (url_norm, host) arrays for a string array of raw URLs."""
    if isinstance(u, pa.ChunkedArray):
        u = pc.cast(u, pa.string())
    # 1. fragment
    u1 = pc.replace_substring_regex(u, "#.*$", "")
    parts = pc.extract_regex(u1, _SPLIT_RE)
    matched = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    rest = pc.struct_field(parts, "rest")
    # 3. default ports (conditional on the scheme)
    host = pc.if_else(
        pc.equal(scheme, pa.scalar("http")),
        pc.replace_substring_regex(host, ":80$", ""),
        host,
    )
    host = pc.if_else(
        pc.equal(scheme, pa.scalar("https")),
        pc.replace_substring_regex(host, ":443$", ""),
        host,
    )
    # 4. tracking params: mid-query ("p=v&"), then tail ("?p=v" / "&p=v"),
    # then a dangling "?"
    rest = pc.replace_substring_regex(
        rest, TRACKING_PARAMS_RE + "=[^&#]*&", "")
    rest = pc.replace_substring_regex(
        rest, "[?&]" + TRACKING_PARAMS_RE + "=[^&#]*$", "")
    rest = pc.replace_substring_regex(rest, r"\?$", "")
    # 5. trailing path slashes (before the query, and at end-of-url)
    rest = pc.replace_substring_regex(rest, r"/+\?", "?")
    rest = pc.replace_substring_regex(rest, "/+$", "")
    rebuilt = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    url_norm = pc.if_else(matched, rebuilt, u1)
    host_out = pc.if_else(matched, host, pa.scalar(None, pa.string()))
    return url_norm, host_out


class UrlNormalize:
    """Stateless map_batches stage: adds ``out_col`` (canonical URL) and
    ``host_col`` (lowercased host, default port stripped; null for
    non-URL rows) next to ``url_col``."""

    def __init__(self, url_col: str = "url", out_col: str = "url_norm",
                 host_col: str = "host"):
        self.url_col = url_col
        self.out_col = out_col
        self.host_col = host_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        url_norm, host = _normalize_arrays(batch.column(self.url_col))
        for name, arr in ((self.out_col, url_norm), (self.host_col, host)):
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, arr)
            else:
                batch = batch.append_column(name, arr)
        return batch


def with_url_normalized(ds, url_col: str = "url", *,
                        out_col: str = "url_norm", host_col: str = "host"):
    """Canonicalize a URL column (see module docstring for the exact
    rewrite chain).  Block-local, zero exchange — feed ``out_col`` to
    :func:`..stages.dedup.exact_dedup` for URL-level dedup or group on
    ``host_col`` for per-host quotas."""
    return ds.map_batches(
        UrlNormalize(url_col, out_col, host_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
