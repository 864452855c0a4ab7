"""Table extraction pipeline: pages → per-page detected tables (long
format, one row per table).

The heavy-route analog of the reference's third detector (A3,
``/root/reference/docvision/detect/table_tatr.py``): binary doc/image
payloads are decoded and recognized (same kernels as the extraction
pipeline — reading order, targeted re-pass), then grid-aligned line
groups become table structures with cells, accessors and markdown
rendering (``functions/tables.py``).

Runs as a task-based ``map_batches`` with a worker-process-global warm
stage (Ray reuses task workers — same amortization as an actor pool
without the spawn cost, see ``stages/extract_stage.py``). Payload column
is consumed here and never travels further.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions import sniff as sniff_mod
from ..functions.docformat import decode_doc_payload, decode_image_payload
from ..functions.layout import recognize_page
from ..functions.tables import cells_fingerprint, detect_tables, table_to_markdown
from .route import add_sniff_stage

CELL_TYPE = pa.list_(pa.struct([
    ("row", pa.int32()), ("col", pa.int32()), ("text", pa.string()),
]))

TABLES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("page", pa.int64()),
    ("table_idx", pa.int64()),
    ("n_rows", pa.int64()),
    ("n_cols", pa.int64()),
    ("n_cells", pa.int64()),
    ("cells_md5", pa.string()),
    ("cells", CELL_TYPE),
    ("markdown", pa.string()),
])


def page_tables(payload: bytes, route: str, cfg: ExtractConfig) -> list[tuple[int, list[dict]]]:
    """Decode + recognize a binary payload's pages, detect tables per
    page. Returns [(page_no, tables)] — page-local, so the staged and
    combined pipelines agree by construction."""
    if route == sniff_mod.ROUTE_DOC:
        pages = sorted(decode_doc_payload(payload), key=lambda p: p["page"])
    elif route == sniff_mod.ROUTE_IMAGE:
        p = decode_image_payload(payload)
        pages = [{"page": 0, **p}]
    else:
        return []
    out = []
    for p in pages:
        recognized = recognize_page(p["lines"], cfg.doc)
        out.append((int(p["page"]),
                    detect_tables(recognized, float(p["w"]), float(p["h"]), cfg.tables)))
    return out


def tables_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    cols: dict[str, list] = {n: [] for n in TABLES_SCHEMA.names}
    urls = batch.column("url").to_pylist()
    routes = batch.column("route").to_pylist()
    payloads = batch.column("html").to_pylist()
    for url, route, payload in zip(urls, routes, payloads):
        try:
            per_page = page_tables(payload or b"", route, cfg)
        except Exception:
            continue  # poison payload → no table rows (error surfaced by extract)
        for page_no, tables in per_page:
            for t in tables:
                cols["url"].append(url)
                cols["page"].append(page_no)
                cols["table_idx"].append(t["table_idx"])
                cols["n_rows"].append(t["n_rows"])
                cols["n_cols"].append(t["n_cols"])
                cols["n_cells"].append(len(t["cells"]))
                cols["cells_md5"].append(cells_fingerprint(t))
                cols["cells"].append([
                    {"row": c["row"], "col": c["col"], "text": c["text"]}
                    for c in t["cells"]
                ])
                cols["markdown"].append(table_to_markdown(t))
    return pa.Table.from_arrays(
        [pa.array(cols[n], TABLES_SCHEMA.field(n).type) for n in TABLES_SCHEMA.names],
        schema=TABLES_SCHEMA,
    )


def build_tables_pipeline(pages_ds, cfg: ExtractConfig | None = None):
    """pages dataset → long-format tables table (TABLES_SCHEMA)."""
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
        tables_batch, fn_kwargs={"cfg": cfg}, batch_format="pyarrow", batch_size=256,
    )
