"""horizon_ocr_python_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the extraction capabilities of the
reference repo (ankitan-ai/horizon-OCR-python, surveyed in SURVEY.md) as
streaming ``ray.data.Dataset`` pipelines over Common-Crawl-style Parquet
page tables: content-sniffing router, DOM-heuristic fast path for HTML,
actor-pool heavy path for binary document payloads, exact dedup by content
hash, field fuse + validate, and checkpointed resumable output.

Public API::

    from horizon_ocr_python_ray import build_extract_pipeline, ExtractConfig, read_pages
    out = build_extract_pipeline(read_pages(path), ExtractConfig())
    out.write_parquet(...)

This package never calls ``ray.init`` — the caller owns the session.
"""

from .config import DEFAULT_CONFIG, DocConfig, ExtractConfig, FuseConfig, HtmlConfig
from .pipelines.extract import build_extract_pipeline, read_pages
from .sources.synth import ensure_corpus, gen_corpus, sf_from_dir, sf_to_rows

__all__ = [
    "DEFAULT_CONFIG",
    "DocConfig",
    "ExtractConfig",
    "FuseConfig",
    "HtmlConfig",
    "build_extract_pipeline",
    "ensure_corpus",
    "gen_corpus",
    "read_pages",
    "sf_from_dir",
    "sf_to_rows",
]
