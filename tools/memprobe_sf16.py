#!/usr/bin/env python
"""Memory-pressure evidence run: the flagship extract pipeline over the
sf16 corpus (8M pages, ~11 GB parquet) with object-store spill counters
and ``ds.stats()`` recorded — the BASELINE.md datum showing streaming
backpressure holds (no OOM, bounded object store) at 160× the bench
scale. Usage: ``python tools/memprobe_sf16.py [sf]``."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from horizon_ocr_python_ray import build_extract_pipeline, ensure_corpus, read_pages

    corpus = ensure_corpus(sf)
    out_dir = f"/tmp/hopr_memprobe_sf{sf}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    ds = build_extract_pipeline(read_pages(corpus))
    ds.write_parquet(out_dir)
    wall = time.monotonic() - t0
    stats = ds.stats()

    # object-store / spill counters from the Ray memory summary
    from ray._private.internal_api import memory_summary

    msum = memory_summary(stats_only=True)
    import pyarrow.parquet as pq

    total = 0
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(out_dir, f)).num_rows
    print(json.dumps({
        "sf": sf, "wall_s": round(wall, 1), "rows": total,
        "docs_per_sec": round(total / wall, 1),
    }))
    print("---- memory_summary ----")
    print(msum)
    print("---- ds.stats() tail ----")
    print("\n".join(stats.splitlines()[-30:]))
    shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
