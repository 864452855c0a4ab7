"""Outlink extraction from raw HTML bytes — the web-graph front-end.

Collects every absolute ``http(s)`` anchor (``<a ... href="...">text</a>``)
from the raw byte stream with a compiled regex — link harvesting does not
need the block/boilerplate state machine (`functions/htmltext.py`), and it
must ALSO see links inside dropped subtrees (nav / footer "related" blocks
are exactly where cross-host links live). One vectorizable pass per doc;
runs as a ``map_batches`` body.

Reference parity: the reference keeps per-document source pointers and
url metadata but has no web-graph stage (single-doc OCR engine); these
ops are part of the "operations a large-scale training-data pipeline
needs" surface (host link graph → PageRank is the classic example).

Anchor text is normalized the same way block text is
(``" ".join(x.split())`` after entity unescape); hosts are lowercased
netlocs without port/userinfo.
"""

from __future__ import annotations

import re
from html import unescape

import numpy as np
import pyarrow as pa

#: <a ...href="ABSOLUTE"...>INNER</a> — double- or single-quoted href,
#: absolute http(s) only. INNER is non-greedy up to the first </a>;
#: nested tags inside the anchor are stripped afterwards.
_A_RE = re.compile(
    rb'<a\s[^>]*?href\s*=\s*(?:"(https?://[^"]+)"|\'(https?://[^\']+)\')'
    rb"[^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)

_TAG_RE = re.compile(r"<[^>]*>")

_HOST_RE = re.compile(r"^https?://(?:[^@/]*@)?([^/:?#]+)", re.IGNORECASE)


def host_of(url: str) -> str:
    """Lowercased host of an absolute url ('' if unparseable)."""
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m else ""


def extract_outlinks(html: bytes | None) -> list[tuple[str, str]]:
    """All absolute http(s) anchors in document order → [(href, anchor)].

    href is entity-unescaped verbatim; anchor is tag-stripped,
    entity-unescaped, whitespace-collapsed inner text.
    """
    if not html:
        return []
    out: list[tuple[str, str]] = []
    for m in _A_RE.finditer(html):
        href_b = m.group(1) or m.group(2)
        try:
            href = unescape(href_b.decode("utf-8"))
            inner = m.group(3).decode("utf-8")
        except UnicodeDecodeError:
            continue
        anchor = " ".join(unescape(_TAG_RE.sub(" ", inner)).split())
        out.append((href, anchor))
    return out


def outlinks_batch(batch: pa.Table) -> pa.Table:
    """(url, html) batch → exploded (url, src_host, href, anchor,
    dst_host) link rows; pages without absolute links emit nothing."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out_url: list[str] = []
    out_href: list[str] = []
    out_anchor: list[str] = []
    for url, html in zip(urls, htmls):
        for href, anchor in extract_outlinks(html):
            out_url.append(url)
            out_href.append(href)
            out_anchor.append(anchor)
    return pa.Table.from_arrays(
        [
            pa.array(out_url, pa.string()),
            pa.array([host_of(u) for u in out_url], pa.string()),
            pa.array(out_href, pa.string()),
            pa.array(out_anchor, pa.string()),
            pa.array([host_of(h) for h in out_href], pa.string()),
        ],
        names=["url", "src_host", "href", "anchor", "dst_host"],
    )
