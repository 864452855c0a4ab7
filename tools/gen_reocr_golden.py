#!/usr/bin/env python
"""Regenerate the golden re-OCR ladder fixture ``data/golden/pages_reocr.parquet``.

The ``pages_reocr`` driver query rasterizes payload pages and runs the
real preprocess kernels — values DuckDB cannot recompute. Its oracle is
therefore a pinned golden table: this tool runs the exact pipeline the
query runs for each driver-compare corpus tier and writes one parquet
with an ``n_rows`` discriminator column (= corpus pages rows, sf·500k);
``__ray_entry__.oracle_sql`` selects the slice matching the driver's sf
via ``count(events) // 2``.

Correctness of the VALUES rests on tests/test_reocr.py (strategy
semantics, accept margins, routing) and tests/test_imageproc.py
(kernels); the golden pins end-to-end byte-stability. RERUN THIS TOOL
(and commit the parquet) whenever functions/raster.py,
functions/imageproc.py, stages/reocr.py, or the corpus generator
changes intentionally.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Driver-compare corpus tiers: sf0.001 → 500 pages rows, sf0.01 → 5000.
SFS = (0.001, 0.01)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from horizon_ocr_python_ray import ensure_corpus, read_pages, sf_to_rows
    from horizon_ocr_python_ray.stages.reocr import build_reocr_pipeline

    parts = []
    for sf in SFS:
        corpus = ensure_corpus(sf)
        # build_reocr_pipeline returns the folded 4-row pa.Table directly
        t = build_reocr_pipeline(
            read_pages(corpus, columns=["url", "html"])).combine_chunks()
        t = t.append_column(
            "n_rows", pa.array([sf_to_rows(sf)] * t.num_rows, pa.int64()))
        parts.append(t)
        print(f"sf={sf}: {t.num_rows} strategy rows "
              f"(n_rows={sf_to_rows(sf)})")
    path = os.path.join(REPO, "data", "golden", "pages_reocr.parquet")
    pq.write_table(pa.concat_tables(parts), path)
    print(f"wrote {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
