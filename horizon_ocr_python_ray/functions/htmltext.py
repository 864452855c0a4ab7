"""Fast-path main-content extraction from HTML bytes.

A trafilatura/readability-style boilerplate stripper implemented on the
stdlib ``html.parser`` (no lxml in the sandbox): parse the byte stream,
drop structural boilerplate subtrees (nav/header/footer/aside/...), split
the remainder into text blocks at block-tag boundaries, and retain blocks
by text length and link density. Deterministic, stateless, pure Python —
it runs as a vectorized-ish ``map_batches`` body (one parser per row, but
the parser is cheap; the batch function is the unit of scheduling).

The output is the extracted main text (blocks joined with ``"\\n"``,
mirroring the reference's line join ``pipeline/orchestrator.py:780``) plus
half-open ``[start, end)`` span offsets per retained block — the span
machinery is modeled on the reference's character-offset range join
(``/root/reference/docvision/azure/doc_intelligence.py:430-462``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html.parser import HTMLParser

from ..config import TEXT_JOIN_SEPARATOR, HtmlConfig

_WS_RE = re.compile(r"\s+")

# Inline tags never flush the current block buffer.
_INLINE_TAGS = frozenset(
    "a abbr b bdi bdo br cite code data dfn em i kbd mark q rp rt ruby s samp "
    "small span strong sub sup time u var wbr img picture source".split()
)

_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())


@dataclass
class Block:
    text: str
    kind: str          # title | heading | paragraph
    link_chars: int
    total_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


class _BlockParser(HTMLParser):
    """Streams character data into blocks delimited by block-tag boundaries.

    Text inside any :attr:`HtmlConfig.drop_tags` subtree is discarded
    entirely. Characters emitted while inside an ``<a>`` count toward the
    block's link-char tally (link-density boilerplate signal).
    """

    def __init__(self, cfg: HtmlConfig) -> None:
        super().__init__(convert_charrefs=True)
        self.cfg = cfg
        self._drop_set = frozenset(cfg.drop_tags)
        self._block_set = frozenset(cfg.block_tags)
        self._heading_set = frozenset(cfg.heading_tags)
        self._drop_depth = 0
        self._a_depth = 0
        self._chunks: list[tuple[str, bool]] = []  # (text, inside_link)
        self._kind = "block"
        self.blocks: list[Block] = []

    # -- buffer management ---------------------------------------------------
    def _flush(self) -> None:
        if not self._chunks:
            return
        raw = "".join(c for c, _ in self._chunks)
        text = _WS_RE.sub(" ", raw).strip()
        link_chars = sum(len(_WS_RE.sub(" ", c).strip()) for c, in_a in self._chunks if in_a)
        self._chunks = []
        if not text:
            return
        tag = self._kind
        if tag == "h1":
            kind = "title"
        elif tag in self._heading_set:
            kind = "heading"
        else:
            kind = "paragraph"
        self.blocks.append(Block(text=text, kind=kind, link_chars=link_chars, total_chars=len(text)))

    # -- parser events -------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in self._drop_set:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "a":
            self._a_depth += 1
        if tag in self._block_set:
            self._flush()
            self._kind = tag

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> and friends: no block boundary, no drop-depth change.
        pass

    def handle_endtag(self, tag: str) -> None:
        if tag in self._drop_set:
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag == "a" and self._a_depth:
            self._a_depth -= 1
        if tag in self._block_set:
            self._flush()
            self._kind = "block"

    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data:
            return
        self._chunks.append((data, self._a_depth > 0))

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


def extract_blocks(html_bytes: bytes, cfg: HtmlConfig) -> list[Block]:
    """Parse and return the retained main-content blocks in document order."""
    text = html_bytes.decode("utf-8", errors="replace")
    parser = _BlockParser(cfg)
    parser.feed(text)
    parser.close()
    kept: list[Block] = []
    for b in parser.blocks:
        if b.kind in ("title", "heading"):
            kept.append(b)
        elif b.total_chars >= cfg.min_block_chars and b.link_density <= cfg.max_link_density:
            kept.append(b)
    return kept


def extract_html(html_bytes: bytes, cfg: HtmlConfig) -> tuple[str, list[dict]]:
    """HTML bytes → (extracted_text, spans).

    spans: ``[{"start": int, "end": int, "kind": str}, ...]`` — half-open
    offsets into the extracted text, one per retained block.
    """
    blocks = extract_blocks(html_bytes, cfg)
    sep = TEXT_JOIN_SEPARATOR
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for b in blocks:
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        spans.append({"start": start, "end": pos, "kind": b.kind})
        pos += len(sep)
    return sep.join(parts), spans
