"""Style-extraction pipeline: pages → per-line style rows (long format).

The A15/M27–M28 analog (``/root/reference/docvision/extract/
pdf_style_extractor.py``): digital documents report their NATIVE span
styles (font/size/bold from the text layer, confidence 1.0); scanned
documents get bbox-estimated styles (size ≈ height × 0.75, ALL-CAPS /
role bold heuristic, confidence ladder ≤ 0.8). One row per line, in the
same order the extraction pipeline emits text (native order for digital,
reading order for scanned).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions import sniff as sniff_mod
from ..functions.docformat import decode_doc_payload, decode_image_payload
from ..functions.layout import recognize_page
from ..functions.regions import classify_line_role
from ..functions.style import estimate_style, is_scanned_doc, native_style
from .route import add_sniff_stage

STYLES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("page", pa.int64()),
    ("line_idx", pa.int64()),
    ("kind", pa.string()),
    ("text_len", pa.int64()),
    ("font_name", pa.string()),
    ("font_size", pa.float64()),
    ("bold", pa.bool_()),
    ("italic", pa.bool_()),
    ("style_source", pa.string()),
    ("style_confidence", pa.float64()),
])


def doc_styles(payload: bytes, route: str, cfg: ExtractConfig) -> list[dict]:
    if route == sniff_mod.ROUTE_DOC:
        pages = sorted(decode_doc_payload(payload), key=lambda p: p["page"])
    elif route == sniff_mod.ROUTE_IMAGE:
        pages = [{"page": 0, **decode_image_payload(payload)}]
    else:
        return []
    digital = not is_scanned_doc(pages)
    rows: list[dict] = []
    for p in pages:
        w, h = p.get("w"), p.get("h")
        if digital:
            for idx, span in enumerate(p.get("native") or []):
                st = native_style(span)
                kind = (classify_line_role(span["t"], span["bbox"], w, h)
                        if w and h else "line")
                rows.append({"page": int(p["page"]), "line_idx": idx, "kind": kind,
                             "text_len": len(span["t"]), **st})
        else:
            for idx, li in enumerate(recognize_page(p["lines"], cfg.doc, w, h)):
                st = estimate_style(li["text"], li["bbox"], role=li["kind"])
                rows.append({"page": int(p["page"]), "line_idx": idx,
                             "kind": li["kind"], "text_len": len(li["text"]), **st})
    return rows


def styles_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in STYLES_SCHEMA.names}
    for url, route, payload in zip(batch.column("url").to_pylist(),
                                   batch.column("route").to_pylist(),
                                   batch.column("html").to_pylist()):
        try:
            rows = doc_styles(payload or b"", route, cfg)
        except Exception:
            continue
        for r in rows:
            cols["url"].append(url)
            cols["page"].append(r["page"])
            cols["line_idx"].append(r["line_idx"])
            cols["kind"].append(r["kind"])
            cols["text_len"].append(r["text_len"])
            cols["font_name"].append(r["font_name"])
            cols["font_size"].append(r["font_size"])
            cols["bold"].append(r["bold"])
            cols["italic"].append(r["italic"])
            cols["style_source"].append(r["source"])
            cols["style_confidence"].append(r["confidence"])
    return pa.Table.from_arrays(
        [pa.array(cols[n], STYLES_SCHEMA.field(n).type) for n in STYLES_SCHEMA.names],
        schema=STYLES_SCHEMA,
    )


def build_styles_pipeline(pages_ds, cfg: ExtractConfig | None = None):
    """pages dataset → long-format per-line style table."""
    import pyarrow.compute as pc

    cfg = cfg or DEFAULT_CONFIG
    ds = add_sniff_stage(pages_ds, cfg.runtime.sniff_batch_size)
    heavy = ds.map_batches(
        lambda t: t.filter(pc.is_in(
            t.column("route"),
            value_set=pa.array([sniff_mod.ROUTE_DOC, sniff_mod.ROUTE_IMAGE]))),
        batch_format="pyarrow",
    )
    return heavy.map_batches(
        styles_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow", batch_size=256,
    )


def worst_styles_topk(styles_ds, k: int = 50):
    """Global worst-``k`` lines by style confidence — the corpus-wide
    variant of the reference's worst-first re-processing queue
    (``ocr/targeted_reocr.py:150-178`` sorts ascending and takes the
    worst K per page; K3's global form per SURVEY.md §2.6).

    Never a full sort: each batch forwards its own k worst rows
    (min-k is distributive), the tiny partial set merges on the driver.
    Total tie-break (confidence, url, page, line_idx) keeps the result
    deterministic under any sharding. Returns a pandas DataFrame with a
    1-based ``rank``.
    """
    import numpy as np
    import pandas as pd

    order_cols = ["style_confidence", "url", "page", "line_idx"]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(["url", "page", "line_idx", "kind",
                       "style_confidence"]).to_pandas()
        return pa.Table.from_pandas(df.sort_values(order_cols).head(k),
                                    preserve_index=False)

    partials = styles_ds.map_batches(partial, batch_format="pyarrow")
    merged = partials.to_pandas().sort_values(order_cols).head(k)
    merged = merged.reset_index(drop=True)
    merged["rank"] = np.arange(1, len(merged) + 1, dtype=np.int64)
    return merged
