"""Domain-blocklist URL filter (functions/blocklist.py)."""

from __future__ import annotations

import pyarrow as pa

from horizon_ocr_python_ray.functions.blocklist import (
    BLOCKLIST,
    blocklist_filter_batch,
)


def run(urls):
    return blocklist_filter_batch(pa.table({"url": pa.array(urls, pa.string())}))


def test_exact_and_subdomain_match():
    out = run([
        "https://host007.example.org/p/1",          # exact host
        "https://a.b.host007.example.org/p/2",      # subdomain
        "https://nothost007.example.org/p/3",       # suffix WITHOUT dot: allowed
        "https://host999.example.org/p/4",          # allowed
        "https://sub.tracker.example.net/p/5",      # suffix-only entry
    ])
    assert out.column("blocked_by").to_pylist() == [
        "host007.example.org", "host007.example.org", "", "",
        "tracker.example.net"]


def test_first_match_priority_and_case():
    # Host matching is lowercase; priority is list order.
    out = run(["https://HOST013.EXAMPLE.ORG/x"])
    assert out.column("host").to_pylist() == ["host013.example.org"]
    assert out.column("blocked_by").to_pylist() == ["host013.example.org"]


def test_all_entries_reachable():
    urls = [f"https://{d}/p" for d in BLOCKLIST]
    out = run(urls)
    assert out.column("blocked_by").to_pylist() == list(BLOCKLIST)
