#!/usr/bin/env python
"""Regenerate the golden media-feature fixtures under ``data/golden/``.

The ``media_features`` / ``media_preprocess`` driver queries decode real
PNG rasters and run numpy preprocess kernels — values DuckDB cannot
recompute from the sf tables. Their oracle is therefore a pinned golden
table: this tool runs the exact pipelines the queries run (shared
builders in ``stages/multimodal.py``) for each fixture size the driver
can request and writes one parquet per query with an ``n_rows``
discriminator column; ``__ray_entry__.oracle_sql`` selects the slice
whose ``n_rows`` matches the sf the driver is running
(``greatest(30, count(documents)·3/5)`` — the documents table is
sf·50000 rows and the media fixture is sf·30000).

Correctness of the VALUES rests on the codec/kernel unit suites
(tests/test_png.py, tests/test_imageproc.py, tests/test_multimodal.py);
the golden pins end-to-end byte-stability so any unintended change to
the codec, the raster generator, or the kernels fails the driver
compare. RERUN THIS TOOL (and commit the parquet) whenever
functions/png.py, functions/imageproc.py, or stages/multimodal.py
changes intentionally.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Fixture sizes: sf0.001 → 30, sf0.01 → 300 (the driver-compare tiers).
#: sf0.1 bench runs are timed, never oracle-compared (documented in
#: BASELINE.md), so no 3000-row golden is pinned.
N_ROWS = (30, 300)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from horizon_ocr_python_ray.stages.multimodal import (
        media_features_for_n,
        media_motion_for_n,
        media_preprocess_for_n,
    )

    out_dir = os.path.join(REPO, "data", "golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, builder in (("media_features", media_features_for_n),
                          ("media_preprocess", media_preprocess_for_n),
                          ("media_motion", media_motion_for_n)):
        parts = []
        for n in N_ROWS:
            # collect as ARROW so the golden parquet carries the exact
            # column types the pipeline emits (the driver's value compare
            # is dtype-sensitive through pandas repr)
            tabs = [t for t in ray.get(builder(n).to_arrow_refs())
                    if t.num_rows]
            t = pa.concat_tables(tabs).combine_chunks()
            t = t.append_column("n_rows", pa.array([n] * t.num_rows, pa.int64()))
            parts.append(t)
            print(f"{name} n={n}: {t.num_rows} rows")
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.concat_tables(parts), path)
        print(f"wrote {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
