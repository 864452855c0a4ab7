"""HTML metadata harvest — the CC-index-style projection.

Web pipelines build a metadata index (page title, link/paragraph/heading
counts) long before they run full extraction: it drives crawl triage,
host statistics and corpus audits. The reference's metadata probe
(`SURVEY.md` S4) sniffs payloads without decoding them; this operator is
the harvest that follows the sniff on the html route.

Gate rule (mirrored byte-for-byte in the DuckDB oracle): a payload is
harvested iff its first 14 bytes are ``<!DOCTYPE html`` — an exact
binary-prefix test, so both sides agree without a content-type model.
Gated rows are valid UTF-8 by construction of the html route.

Fully vectorized, zero shuffles at any scale: one ``binary_slice``
prefix compare over the payload column, one cast, one RE2
``extract_regex`` for the title and one count kernel per counter. No
per-row Python at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

HTML_PREFIX = b"<!DOCTYPE html"
TITLE_RE = r"<title>(?P<t>[^<]*)</title>"
HEADING_RE = r"<h[1-6]>"


def html_meta_batch(batch: pa.Table, payload_col: str = "html",
                    key_col: str = "url") -> pa.Table:
    """(url, payload) → (url, title, n_anchors, n_paragraphs, n_headings)
    for rows passing the html byte-prefix gate."""
    payload = batch.column(payload_col).combine_chunks()
    if isinstance(payload, pa.ChunkedArray):
        payload = (payload.chunk(0) if payload.num_chunks
                   else pa.array([], pa.binary()))
    gate = pc.equal(pc.binary_slice(payload, 0, len(HTML_PREFIX)), HTML_PREFIX)
    gate = pc.fill_null(gate, False)
    html = pc.cast(payload.filter(gate), pa.string())

    titles = pc.struct_field(
        pc.extract_regex(html, pattern=TITLE_RE), "t")
    return pa.table({
        key_col: batch.column(key_col).filter(gate),
        "title": pc.fill_null(titles, ""),
        "n_anchors": pc.cast(
            pc.count_substring(html, pattern="<a "), pa.int64()),
        "n_paragraphs": pc.cast(
            pc.count_substring(html, pattern="<p>"), pa.int64()),
        "n_headings": pc.cast(
            pc.count_substring_regex(html, pattern=HEADING_RE), pa.int64()),
    })
