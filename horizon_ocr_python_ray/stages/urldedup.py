"""Canonical-URL dedup over the pages corpus.

Pipeline shape (100-TB-safe): project (url, warc_ts) at the read, add
the canonical key with the vectorized RE2 kernel, then ONE narrow hash
aggregation on the key — no payload bytes ever cross the network, and
the shuffled table is two columns wide. The grouped output (canonical
url, variant count, earliest crawl ts) is both the dedup decision table
(keep first crawl) and the re-crawl-rate metric.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.urlnorm import canonicalize_urls


def add_canonical_url(batch: pa.Table) -> pa.Table:
    return batch.append_column("canonical_url", canonicalize_urls(batch.column("url")))


def canonical_url_dedup(pages_ds):
    """pages (url, warc_ts) → (canonical_url, n_pages, first_ts)."""
    from ray.data.aggregate import Count, Min

    keyed = pages_ds.map_batches(add_canonical_url, batch_format="pyarrow")
    keyed = keyed.select_columns(["canonical_url", "warc_ts"])
    agg = keyed.groupby("canonical_url").aggregate(
        Count(alias_name="n_pages"),
        Min("warc_ts", alias_name="first_ts"),
    )
    return agg


def canonical_representatives(pages_ds):
    """pages → one row per canonical url: the EARLIEST crawl (url,
    warc_ts), i.e. the keep-set of the dedup. Implemented as the same
    narrow aggregation joined back by (canonical_url, first_ts) — the
    broadcast-free formulation: per-group min-ts selection inside
    ``map_groups`` keeps everything in one shuffle."""
    keyed = pages_ds.map_batches(add_canonical_url, batch_format="pyarrow")
    keyed = keyed.select_columns(["canonical_url", "url", "warc_ts"])

    def first_crawl(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.index(
            pc.equal(group.column("warc_ts"), pc.min(group.column("warc_ts"))), True
        ).as_py()
        return group.slice(idx, 1)

    return keyed.groupby("canonical_url").map_groups(first_crawl, batch_format="pyarrow")
