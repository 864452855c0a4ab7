"""Document reconstruction: flat reading-ordered element list + table
grids + fields summary.

Re-expresses the reference's reconstruction-prompt builder
(``/root/reference/docvision/io/reconstruction.py:136-501``):

- elements are ordered by the reference's ``(page, y // 50 band, x)``
  key (``:121-133``) with a total tie-break;
- repeated text in the same y-band of a page is dropped via a seen-set
  on ``(text, y_band)`` (``:176-199`` — the D4 dedup);
- tables render as markdown grids; fused fields append as a summary.

Pure functions; the pipeline stage lives in ``stages`` consumers.
"""

from __future__ import annotations

from typing import Any

#: The reference's y-band quantum for ordering and dedup (``:121-133``).
Y_BAND = 50.0


def reading_order_key(page: int, bbox: list[float], idx: int = 0) -> tuple:
    """(page, y-band, x, idx) — the reference's sort key made total."""
    return (page, int(bbox[1] // Y_BAND), bbox[0], idx)


def dedup_y_band(elements: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """Drop elements repeating the same text inside one (page, y-band)
    (reference seen-set, ``:176-199``). Order-preserving."""
    seen: set[tuple[int, int, str]] = set()
    out = []
    for el in elements:
        key = (el["page"], int(el["bbox"][1] // Y_BAND), el["text"])
        if key in seen:
            continue
        seen.add(key)
        out.append(el)
    return out


def order_elements(elements: list[dict[str, Any]]) -> list[dict[str, Any]]:
    return sorted(
        (el for el in elements),
        key=lambda el: reading_order_key(el["page"], el["bbox"], el.get("idx", 0)),
    )


def build_reconstruction(
    elements: list[dict[str, Any]],
    tables_by_page: dict[int, list[dict]] | None = None,
    fields: list[Any] | None = None,
) -> str:
    """Deterministic markdown-ish reconstruction of one document.

    ``elements``: dicts with page/bbox/text/kind (+optional idx).
    ``tables_by_page``: page → detected table dicts (``functions/tables``).
    ``fields``: FusedField-like objects with name/value/status.
    """
    from .tables import table_to_markdown

    ordered = dedup_y_band(order_elements(elements))
    lines: list[str] = ["# Document reconstruction", ""]
    cur_page: int | None = None
    for el in ordered:
        if el["page"] != cur_page:
            cur_page = el["page"]
            lines.append(f"## Page {cur_page}")
            lines.append("")
        kind = el.get("kind", "text")
        lines.append(f"[{kind}] {el['text']}")
    for page in sorted(tables_by_page or {}):
        tables = (tables_by_page or {})[page]
        if not tables:
            continue
        lines.append("")
        lines.append(f"### Tables (page {page})")
        for t in tables:
            lines.append("")
            lines.append(table_to_markdown(t))
    if fields:
        lines.append("")
        lines.append("## Fields")
        for f in fields:
            lines.append(f"- {f.name}: {f.value} ({f.status})")
    return "\n".join(lines).rstrip() + "\n"
