"""Combined extraction stage: one actor-pool ``map_batches`` that
dispatches per row on the ``route`` column.

This is the zero-extra-shuffle path: a document's pages all live in its
payload row, so per-document work (decode → detect → recognize →
reading-order assembly) happens inside the batch function and only the
dedup ``groupby(content_hash)`` shuffles. The fully staged variant with
page fan-out + ``groupby(url)`` fan-in — for corpora with unbounded
page-count documents — lives in ``doc_stage.py``; both produce
byte-identical output (tested).

The class is a callable ACTOR (warm state in ``__init__``, work in
``__call__``) mirroring the reference's lazily-constructed model
singletons (``/root/reference/docvision/pipeline/orchestrator.py:150-199``).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions.extract_core import extract_payload
from ..schema import SPAN_TYPE


class ExtractActor:
    """Stateful per-worker extractor. In a real deployment ``__init__``
    loads model weights once per actor (the reference loads ~3 GB of
    weights per process); here the warm state is the config and the
    compiled kernels imported at construction."""

    def __init__(self, cfg: ExtractConfig | None = None) -> None:
        self.cfg = cfg or DEFAULT_CONFIG

    def __call__(self, batch: pa.Table) -> pa.Table:
        routes = batch.column("route").to_pylist()
        payloads = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        out_text, out_spans, out_err = [], [], []
        for route, payload, text in zip(routes, payloads, texts):
            extracted, spans, err = extract_payload(route, payload, text, self.cfg)
            out_text.append(extracted)
            out_spans.append(spans)
            out_err.append(err)
        # Drop the wide binary column as soon as it is consumed
        # (SURVEY.md §7.4 "wide binary rows").
        keep = [c for c in batch.column_names if c not in ("html", "text")]
        result = batch.select(keep)
        result = result.append_column("extracted_text", pa.array(out_text, pa.string()))
        result = result.append_column("spans", pa.array(out_spans, SPAN_TYPE))
        result = result.append_column("error", pa.array(out_err, pa.string()))
        return result


def add_extract_stage(ds, cfg: ExtractConfig | None = None, concurrency: int | None = None,
                      batch_size: int = 128):
    cfg = cfg or DEFAULT_CONFIG
    return ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=batch_size,
        # Autoscaling pool (min 1): never reserves the whole node up front,
        # so read/sniff/write stages aren't starved on small sessions.
        concurrency=(1, concurrency or cfg.doc.recognize_concurrency),
    )
