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
    """pages (url, warc_ts) → (canonical_url, n_pages, first_ts).

    One group per distinct URL means group count ~ corpus size, so the
    reduce goes through ``stages/hashagg.py`` (combiner + coarse bucket
    shuffle + Arrow C++ merge), not ``Dataset.aggregate``'s per-group
    Python path."""
    from .hashagg import grouped_aggregate

    keyed = pages_ds.map_batches(add_canonical_url, batch_format="pyarrow")
    keyed = keyed.select_columns(["canonical_url", "warc_ts"])
    return grouped_aggregate(
        keyed, "canonical_url",
        [("canonical_url", "count", "n_pages"), ("warc_ts", "min", "first_ts")])


def canonical_representatives(pages_ds):
    """pages → one row per canonical url: the EARLIEST crawl (url,
    warc_ts), i.e. the keep-set of the dedup. The rep row is argmin by
    (warc_ts, url), selected as ``min(packed)`` — zero-padded
    epoch-micros ++ NUL ++ url packs lexicographically in that order —
    through the bucketed hash aggregate (no per-group Python)."""
    import pyarrow.compute as pc

    from .hashagg import grouped_aggregate

    keyed = pages_ds.map_batches(add_canonical_url, batch_format="pyarrow")

    def pack(batch: pa.Table) -> pa.Table:
        ts = pc.utf8_lpad(
            pc.cast(pc.cast(batch.column("warc_ts"), pa.int64()), pa.string()),
            20, padding="0")
        packed = pc.binary_join_element_wise(ts, batch.column("url"), "\x00")
        return pa.table({"canonical_url": batch.column("canonical_url"),
                         "packed": packed})

    agg = grouped_aggregate(keyed.map_batches(pack, batch_format="pyarrow"),
                            "canonical_url", [("packed", "min", "rep")])

    def unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("rep"), "\x00")
        ts = pc.cast(pc.cast(pc.list_element(parts, 0), pa.int64()),
                     pa.timestamp("us"))
        return pa.table({"canonical_url": batch.column("canonical_url"),
                         "url": pc.list_element(parts, 1),
                         "warc_ts": ts})

    return agg.map_batches(unpack, batch_format="pyarrow")


def dedup_losers(pages_ds, num_partitions: int = 32):
    """pages → the DROP-set of the canonical-URL dedup: every crawl row
    whose (warc_ts, url) is not its canonical group's representative —
    re-crawls and tracking-variant refetches.

    Distributed ANTI-JOIN: pages ⟕̸ representatives on url via the native
    hash-partitioned ``Dataset.join(join_type="left_anti")`` — both sides
    are projected to the join key plus the canonical key first, so the
    exchange carries two narrow string columns, never payloads. (The
    complementary keep-set is :func:`canonical_representatives`; losers =
    pages ∖ reps by construction, asserted by the oracle's EXCEPT.)
    """
    keyed = (pages_ds.map_batches(add_canonical_url, batch_format="pyarrow")
             .select_columns(["url", "canonical_url"]))
    reps = canonical_representatives(pages_ds).select_columns(["url"])
    # Partition count scales with the input (parquet-metadata count, no
    # scan): each join partition costs an aggregator actor, so a small
    # input must not pay for 32 of them (measured 5.2 s → 1.6 s at
    # sf0.01/8 cpus). ``num_partitions`` is the CAP, sized for the
    # cluster; ~250k rows per partition below it.
    n = pages_ds.count()
    parts = max(2, min(num_partitions, -(-n // 250_000)))
    return keyed.join(reps, join_type="left_anti", on=("url",),
                      num_partitions=parts)


def canonical_url_dedup_windowed(pages_ds, window_s: int = 7 * 86400):
    """Time-windowed crawl dedup: keep-first per (canonical_url, tumbling
    re-crawl window) — the freshness-aware variant of
    :func:`canonical_url_dedup` (a page re-crawled in a LATER window is a
    legitimate refresh, not a duplicate). Same narrow two-column shuffle,
    the window id simply joins the key."""
    import pyarrow.compute as pc

    from .hashagg import grouped_aggregate

    def keyed(batch: pa.Table) -> pa.Table:
        b = add_canonical_url(batch)
        epoch = b.column("warc_ts").cast(pa.int64())
        win = pc.multiply(
            pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                               float(window_s) * 1e6)).cast(pa.int64()),
            window_s * 1_000_000,
        )
        return pa.table({"canonical_url": b.column("canonical_url"),
                         "window_start_us": win,
                         "warc_ts": b.column("warc_ts")})

    agg = grouped_aggregate(
        pages_ds.map_batches(keyed, batch_format="pyarrow"),
        ["canonical_url", "window_start_us"],
        [("canonical_url", "count", "n_pages"), ("warc_ts", "min", "first_ts")],
        bucket_on="canonical_url",
    )
    return agg.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("canonical_url"),
             t.column("window_start_us").cast(pa.timestamp("us")),
             t.column("n_pages").cast(pa.int64()), t.column("first_ts")],
            names=["canonical_url", "window_start", "n_pages", "first_ts"]),
        batch_format="pyarrow",
    )
