"""Table structure extraction: grid assembly from aligned text lines,
over-detection filters, cell accessors, markdown rendering.

Re-expresses the reference's table subsystem as pure kernels:

- grid build from text alignment — the TATR fallback clusters line boxes
  by x-position and stacks consecutive rows with the same column anchors
  (``/root/reference/docvision/detect/table_tatr.py:334-453``; row/col
  ordering ``:468-469``);
- over-detection filters — drop "tables" covering >80% of the page, or
  >100 cells at >50% coverage (``table_tatr.py:107-133``);
- cell accessors ``get_cell`` / ``get_row_texts`` / ``get_col_texts``
  (``types.py:185-198``);
- markdown table rendering (``io/markdown.py:120-230``).

A detected table is a plain dict::

    {"table_idx", "n_rows", "n_cols", "bbox": [x1,y1,x2,y2],
     "cells": [{"row", "col", "text", "bbox", "confidence"}, ...]}  # row-major

Everything is deterministic: rows order top→bottom, columns left→right,
cells row-major.
"""

from __future__ import annotations

import hashlib
from typing import Any

from ..config import READING_ORDER_VERTICAL_OVERLAP, TableConfig


def _band_rows(lines: list[dict[str, Any]], vertical_overlap: float) -> list[list[int]]:
    """Group line indices into reading-order rows (same ≥50%-vertical-
    overlap banding as ``layout.reading_order_indices``), each row's
    indices sorted left→right."""
    n = len(lines)
    order = sorted(
        range(n),
        key=lambda i: ((lines[i]["bbox"][1] + lines[i]["bbox"][3]) / 2.0,
                       lines[i]["bbox"][0], i),
    )
    rows: list[dict[str, Any]] = []
    for i in order:
        x1, y1, x2, y2 = lines[i]["bbox"]
        h = max(y2 - y1, 1e-9)
        placed = False
        if rows:
            row = rows[-1]
            ov = min(y2, row["y2"]) - max(y1, row["y1"])
            row_h = max(row["y2"] - row["y1"], 1e-9)
            if ov >= vertical_overlap * min(h, row_h):
                row["items"].append(i)
                row["y1"] = min(row["y1"], y1)
                row["y2"] = max(row["y2"], y2)
                placed = True
        if not placed:
            rows.append({"y1": y1, "y2": y2, "items": [i]})
    return [sorted(r["items"], key=lambda i: (lines[i]["bbox"][0], i)) for r in rows]


def _column_signature(lines: list[dict], row: list[int], tol: float) -> tuple[int, ...]:
    """Quantized x-anchors of a row's cells — two rows with the same
    signature stack into a grid."""
    return tuple(int(round(lines[i]["bbox"][0] / max(tol, 1e-9))) for i in row)


def detect_tables(
    lines: list[dict[str, Any]],
    page_w: float,
    page_h: float,
    cfg: TableConfig | None = None,
) -> list[dict[str, Any]]:
    """Detect grid-aligned tables among a page's text lines.

    A table is a maximal run of ≥ ``min_rows`` consecutive reading-order
    rows whose cells share the same ≥ ``min_cols`` quantized column
    anchors. Cell text is the line's recognized text. Over-detected grids
    are dropped per the reference filters.
    """
    cfg = cfg or TableConfig()
    rows = _band_rows(lines, READING_ORDER_VERTICAL_OVERLAP)
    sigs = [_column_signature(lines, r, cfg.x_tolerance) for r in rows]
    tables: list[dict[str, Any]] = []
    i = 0
    while i < len(rows):
        sig = sigs[i]
        if len(sig) < cfg.min_cols or len(set(sig)) != len(sig):
            i += 1
            continue
        j = i + 1
        while j < len(rows) and sigs[j] == sig:
            j += 1
        if j - i >= cfg.min_rows:
            tables.append(_assemble_table(lines, rows[i:j]))
        i = j if j > i + 1 else i + 1
    tables = [t for t in tables if _passes_filters(t, page_w, page_h, cfg)]
    for idx, t in enumerate(tables):
        t["table_idx"] = idx
    return tables


def _assemble_table(lines: list[dict], grid_rows: list[list[int]]) -> dict[str, Any]:
    cells = []
    x1 = y1 = float("inf")
    x2 = y2 = float("-inf")
    for r, row in enumerate(grid_rows):
        for c, li in enumerate(row):
            b = lines[li]["bbox"]
            cells.append({
                "row": r, "col": c,
                "text": lines[li]["text"],
                "bbox": list(b),
                "confidence": lines[li].get("confidence", 1.0),
            })
            x1, y1 = min(x1, b[0]), min(y1, b[1])
            x2, y2 = max(x2, b[2]), max(y2, b[3])
    return {
        "table_idx": 0,
        "n_rows": len(grid_rows),
        "n_cols": len(grid_rows[0]),
        "bbox": [x1, y1, x2, y2],
        "cells": cells,
    }


def _passes_filters(table: dict, page_w: float, page_h: float, cfg: TableConfig) -> bool:
    """Over-detection filters (reference ``table_tatr.py:107-133``)."""
    x1, y1, x2, y2 = table["bbox"]
    page_area = max(page_w * page_h, 1e-9)
    coverage = max(0.0, (x2 - x1)) * max(0.0, (y2 - y1)) / page_area
    if coverage > cfg.max_page_coverage:
        return False
    n_cells = len(table["cells"])
    if n_cells > cfg.max_cells and coverage > cfg.max_cells_coverage:
        return False
    return True


# -- accessors (reference types.py:185-198) ----------------------------------

def get_cell(table: dict, row: int, col: int) -> dict | None:
    for cell in table["cells"]:
        if cell["row"] == row and cell["col"] == col:
            return cell
    return None


def get_row_texts(table: dict, row: int) -> list[str]:
    return [c["text"] for c in sorted(
        (c for c in table["cells"] if c["row"] == row), key=lambda c: c["col"])]


def get_col_texts(table: dict, col: int) -> list[str]:
    return [c["text"] for c in sorted(
        (c for c in table["cells"] if c["col"] == col), key=lambda c: c["row"])]


# -- rendering (reference io/markdown.py:120-230) ----------------------------

def table_to_markdown(table: dict) -> str:
    """GitHub-style markdown table; first grid row is the header."""

    def esc(s: str) -> str:
        return (s or "").replace("|", "\\|")

    out = []
    header = get_row_texts(table, 0)
    out.append("| " + " | ".join(esc(t) for t in header) + " |")
    out.append("|" + "|".join(" --- " for _ in header) + "|")
    for r in range(1, table["n_rows"]):
        out.append("| " + " | ".join(esc(t) for t in get_row_texts(table, r)) + " |")
    return "\n".join(out)


def cells_fingerprint(table: dict) -> str:
    """md5 over the row-major cell texts — the cheap grid identity used
    by the driver query / DuckDB oracle."""
    texts = [c["text"] for c in sorted(table["cells"], key=lambda c: (c["row"], c["col"]))]
    return hashlib.md5("|".join(texts).encode("utf-8")).hexdigest()
