"""Classify-and-route stage: content sniffing + content hash.

A stateless ``map_batches`` body (pure bytes inspection — SURVEY.md §7.2).
Adds ``route`` and ``content_hash`` columns; never drops or reorders rows.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.sniff import content_hash, sniff_route


def sniff_batch(batch: pa.Table) -> pa.Table:
    payloads = batch.column("html").to_pylist()
    texts = batch.column("text").to_pylist()
    routes = [sniff_route(p) for p in payloads]
    hashes = [content_hash(p, t) for p, t in zip(payloads, texts)]
    return batch.append_column("route", pa.array(routes, pa.string())).append_column(
        "content_hash", pa.array(hashes, pa.string())
    )


def add_sniff_stage(ds, batch_size: int = 1024):
    return ds.map_batches(sniff_batch, batch_format="pyarrow", batch_size=batch_size)
