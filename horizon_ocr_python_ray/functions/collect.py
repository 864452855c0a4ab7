"""Driver-side block collection without the hidden schema re-execution.

``Dataset.to_arrow_refs()`` (ray 2.49) calls ``self.schema(
fetch_if_missing=True)`` AFTER consuming the ref bundles; on a
non-materialized dataset the consumed plan has no cached schema, so Ray
re-runs a ``limit=1`` plan of the WHOLE upstream pipeline just to
re-derive a schema the caller never needed. Every partial-aggregate fold
in this repo (sketch folds, top-k merges, pair discovery) collects small
narrow tables to the driver, so that tax was paid dozens of times per
query session.

:func:`collect_tables` pulls the blocks through
``iter_internal_ref_bundles()`` (one execution, streaming) and converts
each block via ``BlockAccessor.to_arrow()`` (zero-copy identity for the
pyarrow blocks all our stages emit).

These helpers are for PROVABLY-SMALL results only (partial-aggregate
tables, pair lists, hot-key sets, top-k candidates) — the same driver
bound the old ``to_arrow_refs`` call sites already asserted.
"""
from __future__ import annotations

from typing import Iterator, List

import pyarrow as pa


def iter_tables(ds) -> Iterator[pa.Table]:
    """Yield every non-empty block of ``ds`` as a pyarrow Table — ONE
    streaming execution, no schema re-fetch. Blocks are fetched bundle
    by bundle so the driver never holds refs it has not consumed."""
    import ray
    from ray.data.block import BlockAccessor

    for bundle in ds.iter_internal_ref_bundles():
        for block in ray.get(list(bundle.block_refs)):
            tbl = BlockAccessor.for_block(block).to_arrow()
            if tbl.num_rows:
                yield tbl


def collect_block_refs(ds) -> list:
    """Object refs of every block of ``ds`` (arrow blocks stay in the
    object store; the driver holds only refs) — the ref-shipping
    counterpart of :func:`collect_tables`, again minus
    ``to_arrow_refs``'s limit-1 schema re-execution.

    Contract: blocks ship AS STORED (zero-copy); unlike
    ``to_arrow_refs`` there is no driver-side pandas→arrow conversion
    step. Consumers that ``ray.get`` these refs must normalize with
    :func:`as_arrow_table` (identity for the pyarrow blocks every stage
    in this repo emits)."""
    return [br for bundle in ds.iter_internal_ref_bundles()
            for br in bundle.block_refs]


def as_arrow_table(block) -> pa.Table:
    """Normalize one fetched block to a pyarrow Table (zero-copy
    identity for arrow blocks, converts pandas blocks)."""
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


def collect_tables(ds) -> List[pa.Table]:
    """All non-empty blocks of ``ds`` as pyarrow Tables (driver-side).
    Drop-in replacement for ``[t for t in ray.get(ds.to_arrow_refs())
    if t.num_rows]`` minus the limit-1 upstream re-execution."""
    return list(iter_tables(ds))


def collect_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Concatenate every block of ``ds`` into one driver-side Table.
    ``schema`` supplies the result layout when the dataset is empty."""
    tables = collect_tables(ds)
    if not tables:
        if schema is None:
            raise ValueError("collect_table on an empty dataset needs an explicit schema")
        return schema.empty_table()
    return pa.concat_tables(tables).combine_chunks()
