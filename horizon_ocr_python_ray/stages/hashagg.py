"""Vectorized high-cardinality grouped aggregation.

``Dataset.groupby(key).aggregate(...)`` / ``map_groups`` pay a Python
call per GROUP — fine for a handful of routes or event types, ruinous
when the key is a URL or content hash and every row is its own group
(~200 µs × 50 M groups). This module keeps the per-group work inside
Arrow's C++ hash aggregation (``pa.Table.group_by``) and uses the
distributed exchange only to co-locate KEYS, never to enumerate them:

1. **combiner** — each input batch is pre-aggregated with
   ``pa.Table.group_by`` (one vectorized call per batch), so the shuffle
   carries at most one row per (batch, distinct key);
2. **coarse bucket shuffle** — a deterministic ``hash64(key) % B``
   bucket column is the ONLY distributed group key: B stays small
   (default 64; at cluster scale set ~4× total cores), so the per-group
   Python overhead is B calls, not N;
3. **per-bucket merge** — every key lands in exactly one bucket, so one
   more ``pa.Table.group_by`` per bucket yields the exact global result.

The same trick the engine's combiner-before-shuffle aggregates use,
generalized: the reference's per-document dict reduces
(`/root/reference/docvision/kie/fuse.py:73-108`) never face this
because they group WITHIN a document; a trillion-row corpus groups
ACROSS documents, where group count ~ row count.

Supported aggregate kernels (with their partial/merge decomposition):
``min``/``max`` (self-merging), ``sum`` (self-merging), ``count``
(partial count, merged by sum). ``min``/``max`` work on strings, so
argmin-by-packed-key selects representative ROWS (see
``pipelines/curation.py`` for the packing idiom).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.fasthash import bucket_column

#: Default bucket count — the only distributed group cardinality.
NUM_BUCKETS_DEFAULT = 64

BUCKET_COL = "__bucket"

#: agg fn → (partial arrow fn, merge arrow fn, partial col suffix)
_DECOMP = {
    "min": ("min", "min"),
    "max": ("max", "max"),
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
}


def crc_bucket_array(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Deterministic bucket of a key column — vectorized numpy hash over
    the raw Arrow buffers (``functions/fasthash.py``), no per-row Python.
    Name kept from the original crc32 implementation for callers."""
    return bucket_column(col, num_buckets)


def _agg_spec(aggs):
    """[(col, fn, alias)] → (partial group_by spec, merge spec, renames)."""
    partial, merge, out_names = [], [], []
    for col, fn, alias in aggs:
        pfn, mfn = _DECOMP[fn]
        partial.append((col, pfn))
        pname = f"{col}_{pfn}"
        merge.append((pname, mfn))
        out_names.append((f"{pname}_{mfn}", alias))
    return partial, merge, out_names


def grouped_aggregate(ds, keys, aggs, num_buckets: int = NUM_BUCKETS_DEFAULT,
                      bucket_on: str | None = None):
    """Exact ``groupby(keys).aggregate(aggs)`` for high-cardinality keys.

    ``keys``: str or list[str] — grouping columns.
    ``aggs``: list of ``(col, fn, alias)`` with fn in {min,max,sum,count}.
    ``bucket_on``: which key column feeds the coarse bucket hash —
    pick the HIGH-cardinality one (default: first key).
    Returns a Dataset with columns ``keys + [alias...]``.
    """
    if isinstance(keys, str):
        keys = [keys]
    partial_spec, merge_spec, out_names = _agg_spec(aggs)
    bucket_key = bucket_on or keys[0]
    assert bucket_key in keys, "bucket_on must be one of the group keys"

    def combine_batch(batch: pa.Table) -> pa.Table:
        part = batch.group_by(keys).aggregate(partial_spec)
        return part.append_column(
            BUCKET_COL, crc_bucket_array(part.column(bucket_key), num_buckets))

    def merge_bucket(group: pa.Table) -> pa.Table:
        merged = group.drop_columns([BUCKET_COL]).group_by(keys).aggregate(merge_spec)
        cols = {k: merged.column(k) for k in keys}
        for pname, alias in out_names:
            cols[alias] = merged.column(pname)
        return pa.table(cols)

    return (ds.map_batches(combine_batch, batch_format="pyarrow")
              .groupby(BUCKET_COL)
              .map_groups(merge_bucket, batch_format="pyarrow"))


def grouped_reduce(ds, key: str, per_bucket_fn,
                   num_buckets: int = NUM_BUCKETS_DEFAULT,
                   batch_format: str = "pyarrow"):  # key: bucket column source
    """Custom grouped reduce at bucket granularity.

    Co-locates all rows of each ``key`` into one bucket, then calls
    ``per_bucket_fn(table_or_df)`` ONCE per bucket. The callback sees
    MANY complete key-groups per call and must reduce them itself
    (e.g. ``table.group_by(key)`` or ``df.groupby(key)`` — both C-speed)
    — that contract is what removes the per-group Python call. The
    bucket column is dropped before the callback.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            BUCKET_COL, crc_bucket_array(batch.column(key), num_buckets))

    def run(group):
        if isinstance(group, pa.Table):
            group = group.drop_columns([BUCKET_COL])
        else:  # pandas
            group = group.drop(columns=[BUCKET_COL])
        return per_bucket_fn(group)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby(BUCKET_COL)
              .map_groups(run, batch_format=batch_format))
