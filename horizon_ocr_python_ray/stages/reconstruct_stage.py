"""Reconstruction pipeline: pages → one reconstruction document per
heavy-route row (elements in reading order + table grids + fused
fields), the S9 "reconstruction prompt" output analog
(``/root/reference/docvision/pipeline/orchestrator.py:1374-1412`` +
``io/reconstruction.py``)."""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions import sniff as sniff_mod
from ..functions.docformat import decode_doc_payload, decode_image_payload
from ..functions.extract_core import lines_to_text_spans
from ..functions.fuse import fuse_fields
from ..functions.layout import recognize_page
from ..functions.reconstruct import build_reconstruction
from ..functions.tables import detect_tables
from .fields_stage import candidates_from_text
from .route import add_sniff_stage

RECONSTRUCTION_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("n_elements", pa.int64()),
    ("n_tables", pa.int64()),
    ("n_fields", pa.int64()),
    ("reconstruction", pa.string()),
])


def reconstruct_payload(payload: bytes, route: str, cfg: ExtractConfig) -> dict | None:
    if route == sniff_mod.ROUTE_DOC:
        pages = sorted(decode_doc_payload(payload), key=lambda p: p["page"])
    elif route == sniff_mod.ROUTE_IMAGE:
        pages = [{"page": 0, **decode_image_payload(payload)}]
    else:
        return None
    elements, texts, kinds = [], [], []
    tables_by_page: dict[int, list[dict]] = {}
    for p in pages:
        recognized = recognize_page(p["lines"], cfg.doc, p.get("w"), p.get("h"))
        for idx, li in enumerate(recognized):
            elements.append({"page": int(p["page"]), "bbox": li["bbox"],
                             "text": li["text"], "kind": li["kind"], "idx": idx})
            texts.append(li["text"])
            kinds.append(li["kind"])
        tables_by_page[int(p["page"])] = detect_tables(
            recognized, float(p.get("w") or 0), float(p.get("h") or 0), cfg.tables)
    text, _spans = lines_to_text_spans(texts, kinds)
    fields = fuse_fields(candidates_from_text(text), cfg.fuse)
    md = build_reconstruction(elements, tables_by_page, fields)
    return {
        "n_elements": len(elements),
        "n_tables": sum(len(v) for v in tables_by_page.values()),
        "n_fields": len(fields),
        "reconstruction": md,
    }


def reconstruct_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in RECONSTRUCTION_SCHEMA.names}
    for url, route, payload in zip(batch.column("url").to_pylist(),
                                   batch.column("route").to_pylist(),
                                   batch.column("html").to_pylist()):
        try:
            rec = reconstruct_payload(payload or b"", route, cfg)
        except Exception:
            continue
        if rec is None:
            continue
        cols["url"].append(url)
        for k in ("n_elements", "n_tables", "n_fields", "reconstruction"):
            cols[k].append(rec[k])
    return pa.Table.from_arrays(
        [pa.array(cols[n], RECONSTRUCTION_SCHEMA.field(n).type)
         for n in RECONSTRUCTION_SCHEMA.names],
        schema=RECONSTRUCTION_SCHEMA,
    )


def build_reconstruction_pipeline(pages_ds, cfg: ExtractConfig | None = None):
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
        reconstruct_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow",
        batch_size=256,
    )
