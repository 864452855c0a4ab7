"""Fast-path main-content extraction from HTML bytes.

A trafilatura/readability-style boilerplate stripper (no lxml in the
sandbox): tokenize the byte stream, drop structural boilerplate subtrees
(nav/header/footer/aside/...), split the remainder into text blocks at
block-tag boundaries, and retain blocks by text length and link density.
Deterministic, stateless, pure Python — it runs as a ``map_batches`` body.

Two tokenizer front-ends drive one block state machine (``_BlockSink``):

- :func:`_parse_fast` — a compiled-regex tag tokenizer (~8× stdlib
  ``html.parser``, which spends its time in ``goahead``/``parse_starttag``
  per profiling). Handles comments, CDATA, doctype/PI, quoted ``>`` in
  attributes, self-closing tags, and rawtext elements (script/style/...)
  whose bodies may contain ``<``.
- :class:`_BlockParser` — the stdlib ``html.parser`` front-end, kept as
  the parity oracle (``tests/test_htmltext.py`` drives both and asserts
  identical blocks).

The output is the extracted main text (blocks joined with ``"\\n"``,
mirroring the reference's line join ``pipeline/orchestrator.py:780``) plus
half-open ``[start, end)`` span offsets per retained block — the span
machinery is modeled on the reference's character-offset range join
(``/root/reference/docvision/azure/doc_intelligence.py:430-462``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser

from ..config import TEXT_JOIN_SEPARATOR, HtmlConfig

#: Elements whose raw bodies may contain ``<`` without opening a tag.
_RAWTEXT_TAGS = frozenset("script style textarea title".split())


@dataclass
class Block:
    text: str
    kind: str          # title | heading | paragraph
    link_chars: int
    total_chars: int

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0


class _BlockSink:
    """Block state machine fed by either tokenizer front-end.

    Text inside any :attr:`HtmlConfig.drop_tags` subtree is discarded
    entirely. Characters emitted while inside an ``<a>`` count toward the
    block's link-char tally (link-density boilerplate signal).
    """

    def __init__(self, cfg: HtmlConfig) -> None:
        self.cfg = cfg
        self._drop_set = frozenset(cfg.drop_tags)
        self._block_set = frozenset(cfg.block_tags)
        self._heading_set = frozenset(cfg.heading_tags)
        #: Tags for which start()/end() are anything but a no-op — the
        #: tokenizer skips the sink call for everything else (span/b/em/…).
        self.interesting = self._drop_set | self._block_set | {"a"}
        self._drop_depth = 0
        self._a_depth = 0
        self._parts: list[str] = []
        self._link_parts: list[str] = []  # subset of _parts emitted inside <a>
        self._kind = "block"
        self.blocks: list[Block] = []

    def _flush(self) -> None:
        if not self._parts:
            return
        raw = "".join(self._parts)
        # " ".join(x.split()) ≡ regex \s+ → " " then strip, at C speed.
        text = " ".join(raw.split())
        if self._link_parts:
            link_chars = sum(len(" ".join(c.split())) for c in self._link_parts)
            self._link_parts = []
        else:
            link_chars = 0
        self._parts = []
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

    def start(self, tag: str) -> None:
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

    def end(self, tag: str) -> None:
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

    def data(self, text: str) -> None:
        if self._drop_depth or not text:
            return
        self._parts.append(text)
        if self._a_depth:
            self._link_parts.append(text)

    def close(self) -> None:
        self._flush()


class _BlockParser(HTMLParser):
    """stdlib front-end — the parity oracle for the fast tokenizer."""

    def __init__(self, cfg: HtmlConfig) -> None:
        super().__init__(convert_charrefs=True)
        self.sink = _BlockSink(cfg)

    def handle_starttag(self, tag: str, attrs) -> None:
        self.sink.start(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> and friends: no block boundary, no drop-depth change.
        pass

    def handle_endtag(self, tag: str) -> None:
        self.sink.end(tag)

    def handle_data(self, data: str) -> None:
        self.sink.data(data)

    def close(self) -> None:
        super().close()
        self.sink.close()


# ---------------------------------------------------------------------------
# Fast tokenizer
# ---------------------------------------------------------------------------

# The tokenizer dispatches on the character after '<' (the tag classes
# have mutually exclusive first characters: '!'=comment/CDATA/decl,
# '?'=PI, '/'=end, letter=start), so each position tries exactly ONE
# anchored regex instead of walking a big alternation — ~1.6× on the
# start-tag-dominated common case.
_START_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.DOTALL,
)
_END_RE = re.compile(r"</([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>")
_DECL_RE = re.compile(r"<![^>]*>")
_PI_RE = re.compile(r"<\?[^>]*>")

_RAW_END_RES = {t: re.compile(f"</{t}[^>]*>", re.IGNORECASE) for t in _RAWTEXT_TAGS}

# stdlib's tolerant start-tag scanner (html.parser.locatestarttagend_tolerant)
# — the fallback for malformed attribute soup (doubled quotes, bare junk)
# that the strict _TAG_RE rejects; using the same regex keeps the fast
# tokenizer byte-for-byte consistent with the stdlib oracle on such input.
from html.parser import locatestarttagend_tolerant as _TOLERANT_START  # noqa: E402

_TAG_NAME_RE = re.compile(r"<([a-zA-Z][^\t\n\r\f />\x00]*)")


def _parse_fast(text: str, sink: _BlockSink) -> None:
    pos = 0
    n = len(text)
    find = text.find
    data = sink.data
    interesting = sink.interesting
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            chunk = text[pos:]
            data(unescape(chunk) if "&" in chunk else chunk)
            break
        if lt > pos:
            chunk = text[pos:lt]
            data(unescape(chunk) if "&" in chunk else chunk)
        nxt = text[lt + 1:lt + 2]
        if nxt == "/":
            m = _END_RE.match(text, lt)
            if m is None:
                data("<")  # stray '<' — treat as text, resync
                pos = lt + 1
                continue
            tag = m[1].lower()
            if tag in interesting:
                sink.end(tag)
            pos = m.end()
            continue
        start_tag = None
        m = _START_RE.match(text, lt) if nxt and (nxt.isascii() and nxt.isalpha()) else None
        if (m is not None and ">" in m[2]):
            # A quoted attribute value crossed a '>'. Legit quoted '>'
            # (title="a>b") parses identically either way, but an
            # UNBALANCED quote makes the strict scanner swallow the tag's
            # real '>' plus following markup (e.g. <h1 a='''>), where the
            # stdlib scanner stops earlier — defer to the tolerant
            # stdlib-parity branch for this rare shape.
            m = None
        if m is not None:
            pos = m.end()
            start_tag = m[1].lower()
            if m[2].rstrip().endswith("/"):
                # parity with HTMLParser.handle_startendtag: ignored
                continue
        elif nxt == "!":
            if text.startswith("!--", lt + 1):          # comment
                idx = find("-->", lt + 4)
                pos = n if idx < 0 else idx + 3
                continue
            if text.startswith("![CDATA[", lt + 1):     # CDATA
                idx = find("]]>", lt + 9)
                pos = n if idx < 0 else idx + 3
                continue
            m3 = _DECL_RE.match(text, lt)               # doctype/decl
            if m3 is None:
                data("<")
                pos = lt + 1
            else:
                pos = m3.end()
            continue
        elif nxt == "?":
            m3 = _PI_RE.match(text, lt)                 # processing instr
            if m3 is None:
                data("<")
                pos = lt + 1
            else:
                pos = m3.end()
            continue
        else:
            # Tolerant fallback (stdlib check_for_whole_start_tag shape)
            m2 = _TOLERANT_START.match(text, lt) if nxt.isalpha() else None
            if m2 is not None and text[m2.end():m2.end() + 1] == ">":
                start_tag = _TAG_NAME_RE.match(text, lt).group(1).lower()
                pos = m2.end() + 1
            elif m2 is not None and text[m2.end():m2.end() + 2] == "/>":
                pos = m2.end() + 2  # startendtag: ignored (parity)
                continue
            else:
                data("<")  # stray '<' — treat as text, resync
                pos = lt + 1
                continue
        if start_tag in interesting:
            sink.start(start_tag)
        if start_tag in _RAWTEXT_TAGS:
            # Raw body: scan to the real close tag; content may hold '<'.
            em = _RAW_END_RES[start_tag].search(text, pos)
            if em is None:
                body = text[pos:]
                pos = n
            else:
                body = text[pos:em.start()]
                pos = em.end()
            if start_tag in ("title", "textarea") and "&" in body:
                body = unescape(body)  # RCDATA: charrefs convert
            sink.data(body)
            sink.end(start_tag)


def extract_blocks(html_bytes: bytes, cfg: HtmlConfig, engine: str = "fast") -> list[Block]:
    """Parse and return the retained main-content blocks in document order."""
    text = html_bytes.decode("utf-8", errors="replace")
    if engine == "fast":
        sink = _BlockSink(cfg)
        _parse_fast(text, sink)
        sink.close()
        blocks = sink.blocks
    else:  # stdlib oracle
        parser = _BlockParser(cfg)
        parser.feed(text)
        parser.close()
        blocks = parser.sink.blocks
    kept: list[Block] = []
    for b in blocks:
        if b.kind in ("title", "heading"):
            kept.append(b)
        elif b.total_chars >= cfg.min_block_chars and b.link_density <= cfg.max_link_density:
            kept.append(b)
    return kept


def extract_html(html_bytes: bytes, cfg: HtmlConfig, engine: str = "fast") -> tuple[str, list[dict]]:
    """HTML bytes → (extracted_text, spans).

    spans: ``[{"start": int, "end": int, "kind": str}, ...]`` — half-open
    offsets into the extracted text, one per retained block.
    """
    blocks = extract_blocks(html_bytes, cfg, engine)
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
