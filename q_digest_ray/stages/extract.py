"""Extraction + projection stage for cc_pages (SURVEY.md §3.4 step 2).

All kernels are pyarrow.compute (vectorized, zero-copy from the object
store); the stage is a plain function for ``map_batches(batch_format=
"pyarrow")``.  The heavy ``html`` binary column is projected away
immediately after extraction so downstream stages only carry small columns.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# the fixed synthesis template (sources/cc_pages.py); RE2 syntax, anchored
_TEXT_RE = r"<body><p>(?P<t>[\s\S]*)</p></body></html>$"
_HOST_RE = r"^https?://(?P<h>[^/]+)"


def extract_text(html: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Recover the page text from html — byte-identical per url (the
    input_hint invariant; tested in tests/test_cc_pages.py)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    as_str = html.cast(pa.string())
    return pc.struct_field(pc.extract_regex(as_str, _TEXT_RE), "t")


def url_host(url: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    return pc.struct_field(pc.extract_regex(url, _HOST_RE), "h")


def extract_and_project(batch: pa.Table) -> pa.Table:
    """html:binary → text + derived metric columns; drops html.

    Output: url, url_host, lang, text_len (chars), html_size (bytes).
    """
    text = (
        extract_text(batch["html"])
        if "html" in batch.column_names
        else batch["text"]
    )
    out = {
        "url": batch["url"],
        "url_host": url_host(batch["url"]),
        "lang": batch["lang"],
        "text_len": pc.utf8_length(text).cast(pa.int64()),
    }
    if "html" in batch.column_names:
        out["html_size"] = pc.binary_length(batch["html"]).cast(pa.int64())
    return pa.table(out)
