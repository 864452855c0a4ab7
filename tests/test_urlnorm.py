"""URL canonicalization + canonical dedup."""

from __future__ import annotations

import pyarrow as pa

from horizon_ocr_python_ray.functions.urlnorm import canonicalize_url, canonicalize_urls


def test_tracking_params_dropped():
    assert canonicalize_url("https://Ex.com/p/1?utm_source=feed&utm_medium=rss") == \
        "https://ex.com/p/1"
    assert canonicalize_url("https://ex.com/p/1?sessionid=s000123") == "https://ex.com/p/1"
    assert canonicalize_url("https://ex.com/p/1?ref=social") == "https://ex.com/p/1"


def test_fragment_dropped():
    assert canonicalize_url("https://ex.com/p/1#section-2") == "https://ex.com/p/1"
    assert canonicalize_url("https://ex.com/p/1?utm_campaign=x#top") == "https://ex.com/p/1"


def test_real_params_survive_in_order():
    assert canonicalize_url("https://ex.com/p/1?utm_x=1&page=2") == \
        "https://ex.com/p/1?page=2"
    assert canonicalize_url("https://ex.com/p/1?page=2&utm_x=1") == \
        "https://ex.com/p/1?page=2"
    assert canonicalize_url("https://ex.com/p/1?a=1&ref=x&b=2") == \
        "https://ex.com/p/1?a=1&b=2"
    # order preserved — reordered params stay distinct (conservative key)
    assert canonicalize_url("https://ex.com/p/1?b=2&a=1") == "https://ex.com/p/1?b=2&a=1"


def test_vectorized_matches_scalar():
    urls = ["https://A.com/x?utm_a=1", "https://b.com/y#f", "https://c.com/z?a=1"]
    vec = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert vec == [canonicalize_url(u) for u in urls]


def test_corpus_dup_rows_collapse_to_source(ray_session):
    from horizon_ocr_python_ray import ensure_corpus, read_pages
    from horizon_ocr_python_ray.stages.urldedup import canonical_url_dedup

    corpus = ensure_corpus(0.001)
    out = canonical_url_dedup(read_pages(corpus, columns=["url", "warc_ts"])).to_pandas()
    assert (out["n_pages"] >= 1).all()
    # the corpus plants dup rows as tracking-variant re-crawls — some
    # canonical group must have >1 page, and totals must be preserved
    assert (out["n_pages"] > 1).any()
    assert out["n_pages"].sum() == 500


def test_dedup_losers_complement_of_representatives(ray_session):
    from horizon_ocr_python_ray import ensure_corpus, read_pages
    from horizon_ocr_python_ray.stages.urldedup import (
        canonical_representatives,
        dedup_losers,
    )

    corpus = ensure_corpus(0.001)
    pages = read_pages(corpus, columns=["url", "warc_ts"])
    all_urls = set(pages.to_pandas()["url"])
    keep = set(canonical_representatives(pages).to_pandas()["url"])
    drop = set(dedup_losers(pages, num_partitions=4).to_pandas()["url"])
    # exact partition: keep ∪ drop = all, keep ∩ drop = ∅
    assert keep | drop == all_urls
    assert not (keep & drop)
    assert drop  # corpus plants tracking-variant re-crawls


def test_windowed_dedup_splits_recrawl_groups(ray_session):
    import pyarrow as pa
    import ray.data

    from horizon_ocr_python_ray.stages.urldedup import (
        canonical_url_dedup,
        canonical_url_dedup_windowed,
    )

    base = 1_704_067_200_000_000
    rows = [
        ("https://h.example/a", base),
        ("https://h.example/a?utm_source=x", base + 50_000_000),      # same window
        ("https://h.example/a?utm_source=y", base + 700_000_000),     # next window
        ("https://h.example/b", base + 10_000_000),
    ]
    t = pa.Table.from_arrays(
        [pa.array([r[0] for r in rows], pa.string()),
         pa.array([r[1] for r in rows], pa.int64()).cast(pa.timestamp("us"))],
        names=["url", "warc_ts"],
    )
    ds = ray.data.from_arrow(t)
    flat = canonical_url_dedup(ds).to_pandas()
    win = canonical_url_dedup_windowed(ds, window_s=600).to_pandas()
    assert len(flat) == 2           # two canonical urls
    assert len(win) == 3            # url a splits across two windows
    a = win[win["canonical_url"].str.endswith("/a")].sort_values("window_start")
    assert list(a["n_pages"]) == [2, 1]
