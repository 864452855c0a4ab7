"""Text-style extraction: bbox-estimated styles, native style spans, and
the scanned-vs-digital probe.

Re-expresses ``/root/reference/docvision/extract/pdf_style_extractor.py``:

- ``is_scanned_doc`` — a payload with > 100 chars of native text is
  DIGITAL (``:67-94``, threshold ``:89``); digital documents take the
  cheap native path (no recognition) — the routing consequence the
  reference wires through its orchestrator;
- ``estimate_style`` — font size ≈ bbox height × 0.75 clamped to 6–72 pt,
  bold from ALL-CAPS or a heading-ish role, role-dependent font
  suggestion, and the additive confidence ladder capped at 0.8
  (``:191-258``);
- native spans carry their own font/size/bold (the PyMuPDF span-walk
  analog, ``:99-189``) with confidence 1.0.
"""

from __future__ import annotations

from typing import Any

#: Digital/scanned routing threshold (reference ``:89``).
NATIVE_TEXT_MIN_CHARS = 100

FONT_SIZE_BBOX_RATIO = 0.75
FONT_SIZE_MIN, FONT_SIZE_MAX = 6.0, 72.0

_HEADING_ROLES = ("title", "sectionheading", "header", "heading")


def native_text_chars(pages: list[dict[str, Any]]) -> int:
    """Total stripped native-text characters across pages."""
    total = 0
    for p in pages:
        for span in p.get("native") or []:
            total += len((span.get("t") or "").strip())
    return total


def is_scanned_doc(pages: list[dict[str, Any]]) -> bool:
    """True when no substantial native text layer exists (> 100 chars ⇒
    digital, reference ``is_scanned_pdf``)."""
    return native_text_chars(pages) <= NATIVE_TEXT_MIN_CHARS


def estimate_style(text: str, bbox: list[float], role: str | None = None) -> dict[str, Any]:
    """Bbox/heuristic style estimate (reference ``estimate_style_from_bbox``)."""
    height = max(bbox[3] - bbox[1], 0.0)
    size = max(FONT_SIZE_MIN, min(FONT_SIZE_MAX, height * FONT_SIZE_BBOX_RATIO))
    bold = bool(text) and (
        text.isupper() or (role is not None and role.lower() in _HEADING_ROLES)
    )
    likely_role = (role or "").lower() or ("title" if size > 14 else "paragraph")
    font = "Arial" if likely_role in _HEADING_ROLES else "Times New Roman"
    confidence = 0.5
    if role:
        confidence += 0.15
    if text and text.isupper():
        confidence += 0.1
    return {
        "font_name": font,
        "font_size": round(size, 1),
        "bold": bold,
        "italic": False,  # not inferable from a bbox
        "source": "estimated",
        "confidence": min(0.8, confidence),
    }


def native_style(span: dict[str, Any]) -> dict[str, Any]:
    """Style of a native span record (payload carries the truth)."""
    return {
        "font_name": span.get("font", "unknown"),
        "font_size": float(span.get("size", 0.0)),
        "bold": bool(span.get("bold", False)),
        "italic": bool(span.get("italic", False)),
        "source": "native",
        "confidence": 1.0,
    }
