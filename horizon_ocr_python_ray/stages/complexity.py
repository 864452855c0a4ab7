"""Complexity-scored model routing — the local analog of the reference's
classify-and-route step (``/root/reference/docvision/azure/classifier.py:
61-92``: a cheap nano-model classifies (doc_type, complexity) and a static
routing table picks the extraction model tier).

The north rule replaces cloud model calls, so the cheap classifier here is
a HEADER-ONLY probe (no payload decode — the same byte-scan machinery as
:func:`..functions.docformat.probe_page_count`) and the "model tiers" are
the engine's two real extraction variants:

- ``combined`` — the single route-dispatched stage (cheap tier: document
  work inline in one batch function, zero extra shuffles);
- ``staged``  — page fan-out → recognize actor pool → fan-in groupby
  (expensive tier: unbounded page counts, per-page parallelism).

Complexity bands from three costless signals (reference guidelines
analog: page volume, density/quality, raw size):

- ``complex``: ≥ :data:`COMPLEX_MIN_PAGES` pages OR ≥
  :data:`COMPLEX_MIN_ALT_MARKERS` low-confidence ``alt`` re-OCR records
  (the poor-scan-quality proxy) — routed ``staged``;
- ``simple``: ≤ 1 page AND zero alt records — routed ``combined``;
- ``medium``: everything else — routed ``combined`` (the reference's
  medium band also stays on the cheap deployment for most types).

Both variants produce byte-identical extraction output (tested), so the
router changes COST SHAPE, never results — exactly the property the
reference's routing table relies on when it moves a document between
GPT deployments.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.docformat import DOC_MAGIC, IMG_MAGIC

#: Band thresholds (header-only signals).
COMPLEX_MIN_PAGES = 4
COMPLEX_MIN_ALT_MARKERS = 6

#: complexity band → extraction variant (the A11 routing table analog).
VARIANT_ROUTING = {
    "simple": "combined",
    "medium": "combined",
    "complex": "staged",
}


def classify_payload(payload: bytes | None) -> tuple[int, int, str] | None:
    """One payload → (page_count, alt_markers, complexity), or ``None``
    for payloads with no page structure (html/text/other — they always
    take the cheap path). Byte scans only — never decodes JSON or
    glyphs (the nano-classifier cost analog). The page count IS
    :func:`..functions.docformat.probe_page_count` — one shared gate so
    ``pages_doc_meta`` and ``pages_complexity_route`` can never
    diverge."""
    from ..functions.docformat import probe_page_count

    if payload is None or not (payload.startswith(DOC_MAGIC)
                               or payload.startswith(IMG_MAGIC)):
        return None
    pages = probe_page_count(payload)
    alts = payload.count(b'"alt":')
    if pages >= COMPLEX_MIN_PAGES or alts >= COMPLEX_MIN_ALT_MARKERS:
        return pages, alts, "complex"
    if pages <= 1 and alts == 0:
        return pages, alts, "simple"
    return pages, alts, "medium"


def complexity_batch(batch: pa.Table) -> pa.Table:
    """(url, html) rows → (url, page_count, alt_markers, complexity,
    extract_variant) for binary doc/image payloads (html/text rows have
    no complexity surface and are dropped — they always take the cheap
    DOM/passthrough path)."""
    urls, pages, alts, bands, variants = [], [], [], [], []
    for url, payload in zip(batch.column("url").to_pylist(),
                            batch.column("html").to_pylist()):
        got = classify_payload(payload)
        if got is None:
            continue
        p, a, band = got
        urls.append(url)
        pages.append(p)
        alts.append(a)
        bands.append(band)
        variants.append(VARIANT_ROUTING[band])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "page_count": pa.array(pages, pa.int64()),
        "alt_markers": pa.array(alts, pa.int64()),
        "complexity": pa.array(bands, pa.string()),
        "extract_variant": pa.array(variants, pa.string()),
    })


def build_complexity_routed_pipeline(pages_ds, cfg=None):
    """Read pages → sniff → split binary docs by complexity band →
    ``combined`` stage for simple/medium, ``staged`` pipeline for
    complex → union. Html/text rows ride the combined stage (their path
    is identical in both variants). Output schema and bytes match the
    plain combined pipeline exactly (tested); only the execution shape
    of the heavy slice changes.

    Cost note: Ray Data streams each branch from its own lineage, so
    the source read + sniff + classify byte-scan run once PER BRANCH
    (2× scan; classify is header-only and ~100× cheaper than extract).
    That is the honest price of giving the complex slice a different
    execution shape under streaming execution — the same price the
    reference pays when its classifier routes a document to a separate
    deployment. When the split itself must be single-scan, the answer
    is the plain combined variant (per-row dispatch inside one stage),
    not this router."""
    from .extract_stage import add_extract_stage
    from .route import add_sniff_stage
    from .staged import build_staged_pipeline

    sniffed = add_sniff_stage(pages_ds)

    def _band(p) -> str:
        got = classify_payload(p)
        return got[2] if got is not None else "simple"

    def _is_complex(t: pa.Table) -> pa.Table:
        mask = [_band(p) == "complex" for p in t.column("html").to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    def _not_complex(t: pa.Table) -> pa.Table:
        mask = [_band(p) != "complex" for p in t.column("html").to_pylist()]
        return t.filter(pa.array(mask, pa.bool_()))

    cheap = add_extract_stage(
        sniffed.map_batches(_not_complex, batch_format="pyarrow"), cfg)
    heavy = build_staged_pipeline(
        sniffed.map_batches(_is_complex, batch_format="pyarrow"), cfg)
    return cheap.union(heavy)
