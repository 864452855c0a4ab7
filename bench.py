#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line with the headline metric.

Headline: wall seconds for the flagship extraction pipeline (sniff →
dedup-collapse → route-dispatched extract → fan-out) over the synthetic
Common-Crawl-style pages corpus at the scale factor implied by
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1 → 50k pages), consumed by
``write_parquet`` (a real sink, not a driver materialization).

``--scaling``: runs the same job in two fresh processes at
``num_cpus=8`` and ``num_cpus=32`` on the same (pre-generated, page-cache
-warm) input and reports throughputs + scaling efficiency
= (t_lo/t_hi)/(hi/lo); 1.0 = linear.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scaling_sf = os.environ.get("GRAFT_SCALING_SF")  # set by --scaling child runs
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from horizon_ocr_python_ray import build_extract_pipeline, ensure_corpus, read_pages, sf_from_dir

    sf = float(scaling_sf) if scaling_sf else sf_from_dir(sf_dir)
    corpus = ensure_corpus(sf)  # untimed: corpus generation + page-cache warm
    n_docs = None

    queries: dict[str, float] = {}

    # ---- untimed warmup: force worker-process imports + executor spin-up
    # (the 100 TB regime runs with warm workers; a cold 32-process import
    # storm would otherwise dominate a short benchmark run)
    warm = ensure_corpus(0.01)
    build_extract_pipeline(read_pages(warm)).write_parquet("/tmp/hopr_bench_warmup")
    shutil.rmtree("/tmp/hopr_bench_warmup", ignore_errors=True)

    # ---- headline: extraction throughput --------------------------------
    out_dir = "/tmp/hopr_bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    out = build_extract_pipeline(read_pages(corpus))
    out.write_parquet(out_dir)
    extract_s = time.monotonic() - t0
    queries["extract"] = round(extract_s, 3)
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    n_docs = pads.dataset(out_dir).count_rows()

    # ---- secondary operator pipelines over the driver tables ------------
    if scaling_sf:  # scaling runs time ONLY the headline pipeline
        ray.shutdown()
        return {
            "metric": "extraction_pipeline_sec", "value": round(extract_s, 3),
            "unit": "sec", "queries": queries, "sf": sf, "num_cpus": num_cpus,
            "n_docs": n_docs,
            "docs_per_sec": round(n_docs / extract_s, 2) if extract_s else None,
        }
    import importlib

    entry = importlib.import_module("__ray_entry__")
    q = entry.queries()
    for name in ("lineitem_pricing_summary", "doc_exact_dedup", "events_hourly",
                 "events_sessions", "emb_near_dup", "emb_near_dup_lsh", "ann_topk",
                 "ann_topk_lsh", "ann_topk_ivf", "minhash_near_dup", "pages_tables",
                 "pages_url_dedup", "doc_top_terms", "pages_host_quota",
                 "corpus_top_terms", "doc_stratified_sample", "pages_overlays",
                 "doc_simhash_near_dup", "pages_redact", "pages_line_dedup",
                 "doc_decontam", "doc_chunks", "doc_packing", "doc_normalize",
                 "doc_incremental_dedup", "events_approx_users", "pages_bloom_probe",
                 "doc_repeated_ngrams", "doc_quality_gate", "cust_order_dist",
                 "pages_outlinks", "host_pagerank", "emb_semdedup",
                 "doc_dsir", "waiting_supplier", "corpus_tfidf_topk",
                 "events_cumsum", "events_gapfill", "events_anomaly",
                 "doc_lang_drift", "pages_host_join", "corpus_and_search",
                 "doc_mix_rebalance", "doc_safe_split", "important_parts",
                 "nation_profit", "market_share", "doc_lm_score",
                 "pages_c4_filter", "doc_shuffle_shards", "pages_html_meta",
                 "pages_blocklist", "events_cms_counts"):
        t0 = time.monotonic()
        res = q[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        queries[name] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {
        "metric": "extraction_pipeline_sec",
        "value": round(extract_s, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / extract_s, 2) if extract_s else None,
    }


def run_scaling() -> dict:
    """Same input, two fresh processes at num_cpus=8 and 32.

    Uses a larger synthetic corpus (GRAFT_SCALING_SF, default 1 → 500k
    pages) than the per-round bench so compute dominates the fixed Ray
    job-startup overheads — the regime the N→4N cluster criterion is
    about — and takes best-of-2 per level to cut scheduler noise."""
    scaling_sf = os.environ.get("GRAFT_SCALING_SF", "1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from horizon_ocr_python_ray import ensure_corpus

    ensure_corpus(float(scaling_sf))  # untimed one-time generation

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_SF=scaling_sf)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # Interleave trials (lo, hi, lo, hi, ...) and keep the best per level:
    # the sandbox VM's wall-clock noise is ±50%, slow system states drift
    # over tens of seconds, and best-of-interleaved controls for both.
    trials = int(os.environ.get("GRAFT_SCALING_TRIALS", "3"))
    r_lo = r_hi = None
    for _ in range(trials):
        r = one(lo)
        if r_lo is None or r["value"] < r_lo["value"]:
            r_lo = r
        r = one(hi)
        if r_hi is None or r["value"] < r_hi["value"]:
            r_hi = r
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": r_lo.get("docs_per_sec"),
        "docs_per_sec_32": r_hi.get("docs_per_sec"),
        "sf": r_lo.get("sf"),
        "queries": {"extract_8": t_lo, "extract_32": t_hi},
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
