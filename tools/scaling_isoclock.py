#!/usr/bin/env python
"""Iso-clock scaling experiment (single-box analog of N vs 4N NODES).

On one machine, an 8-CPU Ray job leaves 24 cores idle, so DVFS boosts the
busy cores' clocks; the 32-CPU job runs every core at the lower all-core
clock. That frequency differential — not the engine — caps the naive
8-vs-32 efficiency (measured kernel-only ceiling: see BASELINE.md). On a
real cluster, N and 4N *nodes* each run at identical per-node clocks, so
the honest single-box analog pins the frequency state: during the 8-CPU
measurement, the other 24 cores run busy-spinner processes, putting both
measurements in the same all-core clock domain.

Usage: python tools/scaling_isoclock.py  → one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time


def _spin(stop_name: str) -> None:
    x = 0
    while not os.path.exists(stop_name):
        for _ in range(100000):
            x += 1
    _ = x


def run_level(ncpu: int, total_cores: int, scaling_sf: str) -> dict:
    stop = f"/tmp/isoclock_stop_{os.getpid()}"
    if os.path.exists(stop):
        os.remove(stop)
    burners = []
    n_burn = max(0, total_cores - ncpu)
    ctx = mp.get_context("fork")
    for _ in range(n_burn):
        p = ctx.Process(target=_spin, args=(stop,), daemon=True)
        p.start()
        burners.append(p)
    try:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_SF=scaling_sf)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    finally:
        with open(stop, "w") as f:
            f.write("stop")
        for p in burners:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()
        os.remove(stop)


def main() -> None:
    scaling_sf = os.environ.get("GRAFT_SCALING_SF", "2")
    total = os.cpu_count() or 32
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from horizon_ocr_python_ray import ensure_corpus

    ensure_corpus(float(scaling_sf))
    lo, hi = 8, 32
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    r_lo = r_hi = None
    for _ in range(trials):
        r = run_level(lo, total, scaling_sf)
        if r_lo is None or r["value"] < r_lo["value"]:
            r_lo = r
        r = run_level(hi, total, scaling_sf)
        if r_hi is None or r["value"] < r_hi["value"]:
            r_hi = r
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "metric": "scaling_efficiency_isoclock",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8_isoclock": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": r_lo.get("docs_per_sec"),
        "docs_per_sec_32": r_hi.get("docs_per_sec"),
        "sf": r_lo.get("sf"),
    }))


if __name__ == "__main__":
    main()
