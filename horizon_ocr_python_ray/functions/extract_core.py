"""Route-dispatched payload extraction — the per-record core.

One pure function ``extract_payload(route, payload, text, cfg)`` shared by
the single-stage combined pipeline and the fully staged (page fan-out →
actor pool → reassembly) pipeline, so both produce byte-identical output.

Reference lifecycle mirrored (``/root/reference/docvision/pipeline/
orchestrator.py:447-816``): load/decode → per-page detect+recognize →
reading-order ``raw_text`` assembly (``orchestrator.py:780``), with routes
replacing the reference's extension probe and mode switches.
"""

from __future__ import annotations

import re

from ..config import TEXT_JOIN_SEPARATOR, ExtractConfig
from . import sniff as sniff_mod
from .docformat import decode_doc_payload, decode_image_payload
from .htmltext import extract_html
from .layout import recognize_page

_LINE_SPLIT_RE = re.compile(r"\r\n|\r|\n")


def normalize_plain_text(raw: str) -> tuple[str, list[dict]]:
    """Passthrough route: normalize the ``text`` column — split lines,
    strip each, drop empties, join with the canonical separator."""
    lines = [ln.strip() for ln in _LINE_SPLIT_RE.split(raw or "")]
    lines = [ln for ln in lines if ln]
    parts, spans, pos = [], [], 0
    for ln in lines:
        spans.append({"start": pos, "end": pos + len(ln), "kind": "line"})
        parts.append(ln)
        pos += len(ln) + len(TEXT_JOIN_SEPARATOR)
    return TEXT_JOIN_SEPARATOR.join(parts), spans


def lines_to_text_spans(
    line_texts: list[str], kinds: list[str] | None = None
) -> tuple[str, list[dict]]:
    """Reading-ordered line texts → (joined text, per-line spans). Span
    kind is the line's layout-region role when provided (J5 region→line
    role map, ``pipeline/orchestrator.py:1067-1092``), else ``line``."""
    parts, spans, pos = [], [], 0
    for idx, ln in enumerate(line_texts):
        kind = kinds[idx] if kinds else "line"
        spans.append({"start": pos, "end": pos + len(ln), "kind": kind})
        parts.append(ln)
        pos += len(ln) + len(TEXT_JOIN_SEPARATOR)
    return TEXT_JOIN_SEPARATOR.join(parts), spans


def native_page_lines(page: dict) -> tuple[list[str], list[str]]:
    """A digital page's native text spans in document order — the cheap
    path that skips recognition entirely (reference digital-PDF routing,
    ``extract/pdf_style_extractor.py:67-94``)."""
    from .regions import classify_line_role

    w, h = page.get("w"), page.get("h")
    texts, kinds = [], []
    for span in page.get("native") or []:
        texts.append(span["t"])
        kinds.append(classify_line_role(span["t"], span["bbox"], w, h)
                     if w and h else "line")
    return texts, kinds


def recognize_doc_pages(payload: bytes, cfg: ExtractConfig) -> tuple[list[str], list[str]]:
    """Doc payload → reading-ordered (line texts, region kinds) across
    pages (page order preserved — the one ordering requirement,
    SURVEY.md §2.7).

    Digital documents (substantial native text layer) take the native
    path — no glyph recognition, no targeted re-pass; scanned documents
    go through detect/recognize. The two paths are byte-identical for
    the same content (tested)."""
    from .style import is_scanned_doc

    pages = decode_doc_payload(payload)
    pages.sort(key=lambda p: p["page"])
    texts: list[str] = []
    kinds: list[str] = []
    if not is_scanned_doc(pages):
        for page in pages:
            t, k = native_page_lines(page)
            texts.extend(t)
            kinds.extend(k)
        return texts, kinds
    for page in pages:
        for li in recognize_page(page["lines"], cfg.doc,
                                 page.get("w"), page.get("h")):
            texts.append(li["text"])
            kinds.append(li["kind"])
    return texts, kinds


def recognize_image(payload: bytes, cfg: ExtractConfig) -> tuple[list[str], list[str]]:
    page = decode_image_payload(payload)
    recognized = recognize_page(page["lines"], cfg.doc, page.get("w"), page.get("h"))
    return [li["text"] for li in recognized], [li["kind"] for li in recognized]


def extract_payload(
    route: str,
    payload: bytes | None,
    text: str | None,
    cfg: ExtractConfig,
) -> tuple[str, list[dict], str | None]:
    """Returns (extracted_text, spans, error)."""
    try:
        if route == sniff_mod.ROUTE_HTML:
            extracted, spans = extract_html(payload or b"", cfg.html)
            return extracted, spans, None
        if route == sniff_mod.ROUTE_DOC:
            return (*lines_to_text_spans(*recognize_doc_pages(payload or b"", cfg)), None)
        if route == sniff_mod.ROUTE_IMAGE:
            return (*lines_to_text_spans(*recognize_image(payload or b"", cfg)), None)
        if route == sniff_mod.ROUTE_TEXT:
            return (*normalize_plain_text(text or ""), None)
        return "", [], f"unsupported_route:{route}"
    except Exception as exc:  # per-row error column — rows never throw
        return "", [], f"{type(exc).__name__}: {exc}"
