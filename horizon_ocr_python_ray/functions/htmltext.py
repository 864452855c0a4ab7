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

#: stdlib ``HTMLParser.CDATA_CONTENT_ELEMENTS`` — elements whose raw bodies
#: may contain ``<`` without opening a tag. Parity note: HTML5 also treats
#: title/textarea as raw/RCDATA, but the stdlib oracle does not, so neither
#: do we.
_RAWTEXT_TAGS = frozenset(("script", "style"))


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
# start-tag-dominated common case. Each branch mirrors the matching
# stdlib ``HTMLParser.goahead``/``parse_*`` path exactly (the parity
# oracle); the strict ``_START_RE`` is a fast path that defers rare
# shapes (quoted '>', possible self-close) to the literal stdlib mirror.
_START_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>",
    re.DOTALL,
)

# stdlib html.parser's own tolerant scanners — importing them (rather than
# re-typing the patterns) keeps the fast tokenizer byte-for-byte consistent
# with the stdlib oracle on malformed markup.
from html.parser import (  # noqa: E402
    attrfind_tolerant as _ATTRFIND_TOLERANT,
    endtagfind as _ENDTAG_FIND,
    locatestarttagend_tolerant as _TOLERANT_START,
    tagfind_tolerant as _TAGFIND_TOLERANT,
)

_COMMENTCLOSE = re.compile(r"--\s*>")          # _markupbase._commentclose
_MARKEDCLOSE = re.compile(r"]\s*]\s*>")        # _markupbase._markedsectionclose
_MSMARKEDCLOSE = re.compile(r"]\s*>")          # _markupbase._msmarkedsectionclose
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")  # _markupbase._declname

# set_cdata_mode's close scanner: '</' + ws + name + ws + '>' only; an
# end tag with attributes does NOT leave cdata mode (stdlib parity).
_RAW_END_RES = {t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in _RAWTEXT_TAGS}


def _whole_start_tag_end(text: str, i: int) -> int:
    """Mirror of ``HTMLParser.check_for_whole_start_tag`` (-1 = incomplete)."""
    m = _TOLERANT_START.match(text, i)
    j = m.end()
    nxt = text[j:j + 1]
    if nxt == ">":
        return j + 1
    if nxt == "/":
        return j + 2 if text.startswith("/>", j) else -1
    if nxt == "":
        return -1  # end of input
    if nxt in "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ":
        return -1  # end of input in or before attribute value
    return j if j > i else i + 1  # bogus input: emit prefix as data


def _parse_fast(text: str, sink: _BlockSink) -> None:
    pos = 0
    n = len(text)
    find = text.find
    data = sink.data
    interesting = sink.interesting

    def recover(lt: int) -> int:
        # goahead's end-of-input recovery for an unterminated construct:
        # emit raw bytes through the next '>' (or up to the next '<') as
        # literal data, charref-converted like any other data run.
        k = find(">", lt + 1)
        if k >= 0:
            k += 1
        else:
            k = find("<", lt + 1)
            if k < 0:
                k = lt + 1
        chunk = text[lt:k]
        data(unescape(chunk) if "&" in chunk else chunk)
        return k

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
        if nxt and nxt.isascii() and nxt.isalpha():
            # ---- start tag (parse_starttag) ----
            start_tag = None
            m = _START_RE.match(text, lt)
            if m is not None and (">" in m[2] or m[2].rstrip().endswith("/")):
                # Rare shapes the strict scanner can misjudge: a quoted or
                # unbalanced-quote '>' inside attributes (<h1 a='''>), or a
                # trailing '/' that may or may not be a self-close (stdlib
                # parses <a href=x/> as a START tag with value "x/", but
                # <a href='x'/> as a self-close) — defer to the mirror.
                m = None
            if m is not None:
                pos = m.end()
                start_tag = m[1].lower()
            else:
                endpos = _whole_start_tag_end(text, lt)
                if endpos < 0:
                    pos = recover(lt)
                    continue
                nm = _TAGFIND_TOLERANT.match(text, lt + 1)
                k = nm.end()
                while k < endpos:
                    am = _ATTRFIND_TOLERANT.match(text, k)
                    if am is None:
                        break
                    k = am.end()
                endbit = text[k:endpos].strip()
                if endbit == ">":
                    pos = endpos
                    start_tag = nm[1].lower()
                elif endbit == "/>":
                    # parity with HTMLParser.handle_startendtag: ignored
                    pos = endpos
                    continue
                else:
                    data(text[lt:endpos])  # bogus start tag → raw data
                    pos = endpos
                    continue
            if start_tag in interesting:
                sink.start(start_tag)
            if start_tag in _RAWTEXT_TAGS:
                # cdata mode: raw body up to a bare close tag; charrefs do
                # NOT convert. An unterminated body is DISCARDED with no
                # end event (stdlib goahead breaks without the final flush
                # when cdata_elem is set).
                em = _RAW_END_RES[start_tag].search(text, pos)
                if em is None:
                    pos = n
                else:
                    sink.data(text[pos:em.start()])
                    sink.end(start_tag)
                    pos = em.end()
            continue
        if nxt == "/":
            # ---- end tag (parse_endtag) ----
            gt = find(">", lt + 1)
            if gt < 0:
                pos = recover(lt)
                continue
            m = _ENDTAG_FIND.match(text, lt)
            if m is not None:
                tag = m[1].lower()
            else:
                nm = _TAGFIND_TOLERANT.match(text, lt + 2)
                # no name: '</>' is skipped, anything else is a bogus
                # comment — both consume to the first '>' with no event.
                tag = nm[1].lower() if nm is not None else None
            if tag is not None and tag in interesting:
                sink.end(tag)
            pos = gt + 1
            continue
        if nxt == "!":
            if text.startswith("!--", lt + 1):
                # ---- comment (parse_comment): closes on --\s*> ----
                cm = _COMMENTCLOSE.search(text, lt + 4)
                pos = recover(lt) if cm is None else cm.end()
                continue
            if text.startswith("![", lt + 1):
                # ---- marked section (parse_marked_section) ----
                nm = _DECLNAME.match(text, lt + 3)
                if nm is not None and nm.end() < n:
                    name = nm.group().strip().lower()
                    if name in ("temp", "cdata", "ignore", "include", "rcdata"):
                        cm = _MARKEDCLOSE.search(text, lt + 3)
                    elif name in ("if", "else", "endif"):
                        cm = _MSMARKEDCLOSE.search(text, lt + 3)
                    else:
                        # stdlib raises AssertionError here; the production
                        # path must not — consume as a bogus comment.
                        gt = find(">", lt + 2)
                        pos = recover(lt) if gt < 0 else gt + 1
                        continue
                    pos = recover(lt) if cm is None else cm.end()
                    continue
                if nm is not None:
                    pos = recover(lt)  # name runs to end of buffer
                    continue
                # no name token: stdlib raises; consume as bogus comment
                gt = find(">", lt + 2)
                pos = recover(lt) if gt < 0 else gt + 1
                continue
            if text[lt:lt + 9].lower() == "<!doctype":
                gt = find(">", lt + 9)
                pos = recover(lt) if gt < 0 else gt + 1
                continue
            # ---- bogus comment (parse_bogus_comment) ----
            gt = find(">", lt + 2)
            pos = recover(lt) if gt < 0 else gt + 1
            continue
        if nxt == "?":
            # ---- processing instruction (parse_pi): first '>' ends it ----
            gt = find(">", lt + 2)
            pos = recover(lt) if gt < 0 else gt + 1
            continue
        # stray '<' (incl. '<' + non-ASCII/digit/EOF) — literal data
        data("<")
        pos = lt + 1


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
