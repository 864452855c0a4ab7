"""Flagship pipeline: Common-Crawl-style pages → extracted main content.

Ray-native lifecycle (SURVEY.md §3, "Ray-native restatement"):

    read_parquet(pages)                       # url, warc_ts, html, text, lang
      → map_batches(sniff_and_route)          # route + content_hash columns
      → groupby(content_hash).map_groups      # exact dedup collapse
        (the ONE shuffle — uniform hash keys also break host-level skew)
      → map_batches(ExtractActor)             # route-dispatched extraction
      → map_batches(explode_members)          # fan results back to every url
      → write_parquet / downstream stages

``variant="staged"`` swaps the combined extractor for the page-fan-out
actor pipeline (``stages/staged.py``); output is byte-identical.
"""

from __future__ import annotations

import os

import ray.data

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..stages.dedup import dedup_collapse, explode_members
from ..stages.extract_stage import add_extract_stage
from ..stages.route import add_sniff_stage
from ..stages.staged import build_staged_pipeline


def read_pages(source: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a pages table. ``source`` is a parquet file/dir (the synthetic
    corpus keeps its pages under ``<dir>/pages``)."""
    path = source
    sub = os.path.join(source, "pages")
    if os.path.isdir(sub):
        path = sub
    return ray.data.read_parquet(path, columns=columns)


def build_extract_pipeline(
    pages: ray.data.Dataset,
    cfg: ExtractConfig | None = None,
    dedup: bool | None = None,
    variant: str = "combined",
) -> ray.data.Dataset:
    """pages dataset → extraction results
    (url, warc_ts, lang, route, content_hash, extracted_text, spans, error).
    """
    cfg = cfg or DEFAULT_CONFIG
    use_dedup = cfg.dedup.enabled if dedup is None else dedup
    ds = add_sniff_stage(pages, cfg.runtime.sniff_batch_size)
    if variant == "staged":
        # Staged variant extracts every row independently (identical bytes
        # → identical output), demonstrating page fan-out/fan-in.
        return build_staged_pipeline(ds, cfg)
    if use_dedup:
        ds = dedup_collapse(ds)
        ds = add_extract_stage(ds, cfg)
        ds = ds.map_batches(explode_members, batch_format="pyarrow")
    else:
        ds = add_extract_stage(ds, cfg)
        ds = ds.select_columns(
            ["url", "warc_ts", "lang", "route", "content_hash", "extracted_text", "spans", "error"]
        )
    return ds
