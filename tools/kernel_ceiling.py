#!/usr/bin/env python
"""Pure-kernel DVFS-ceiling control for the scaling measurement.

Ray-free: a multiprocessing pool runs the html extraction kernel over a
CACHE-RESIDENT payload set at 8 and at 30 worker processes (30, not 32,
leaves the parent + OS threads a core, same as the round-2 ad-hoc
control). There is no object store, no scheduling, no I/O — any
efficiency lost between the two levels is the BOX (all-core clock
domain / shared memory bandwidth), not the engine. The reported ratio
is therefore the ceiling a PERFECT engine could score on the raw
8→32 `bench.py --scaling` number in the same window.

Usage: python tools/kernel_ceiling.py [reps_per_proc]
Prints one JSON line {lo_rate, hi_rate, ceiling, ...}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAYLOADS = 64
REPS_DEFAULT = 40


def _payloads() -> list[bytes]:
    # Deterministic html payloads, ~the bench corpus page mix, built once
    # in the parent and inherited by fork (cache-resident in every child).
    import glob

    import pyarrow.parquet as pq

    from horizon_ocr_python_ray import ensure_corpus

    corpus = ensure_corpus(0.01)
    files = sorted(glob.glob(corpus + "/pages/*.parquet"))
    t = pq.read_table(files[0], columns=["html"])
    rows = [v for v in t.column("html").to_pylist()
            if v and v.startswith(b"<!DOCTYPE html")]
    return rows[:N_PAYLOADS]


_PAYLOADS: list[bytes] = []


def _work(reps: int) -> int:
    from horizon_ocr_python_ray.config import HtmlConfig
    from horizon_ocr_python_ray.functions.htmltext import extract_html

    cfg = HtmlConfig()
    n = 0
    for _ in range(reps):
        for p in _PAYLOADS:
            extract_html(p, cfg)
            n += 1
    return n


def measure(nproc: int, reps: int) -> float:
    t0 = time.monotonic()
    with mp.Pool(nproc) as pool:
        counts = pool.map(_work, [reps] * nproc)
    dt = time.monotonic() - t0
    return sum(counts) / dt


def main() -> None:
    global _PAYLOADS
    # _PAYLOADS is populated in the parent and inherited via fork; under
    # a spawn start method workers would see the empty module list and
    # report zero rates. Fail loudly instead of measuring garbage.
    assert mp.get_start_method() == "fork", (
        "kernel_ceiling requires the fork start method (workers inherit "
        "the parent's in-memory payload corpus)")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else REPS_DEFAULT
    _PAYLOADS = _payloads()
    lo, hi = 8, 30
    # interleave and keep best per level, like bench.py --scaling
    best_lo = best_hi = 0.0
    for _ in range(2):
        best_lo = max(best_lo, measure(lo, reps))
        best_hi = max(best_hi, measure(hi, reps))
    ceiling = (best_hi / best_lo) / (hi / lo)
    print(json.dumps({
        "metric": "kernel_dvfs_ceiling",
        "lo_procs": lo, "hi_procs": hi,
        "lo_rows_per_sec": round(best_lo, 1),
        "hi_rows_per_sec": round(best_hi, 1),
        "ceiling": round(ceiling, 3),
    }))


if __name__ == "__main__":
    main()
