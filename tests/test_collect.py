"""functions/collect.py: driver folds must execute the upstream plan
exactly ONCE. Ray 2.49's ``Dataset.to_arrow_refs`` re-runs a limit-1
plan of the whole pipeline after consumption (schema re-fetch) — the
bug class these helpers exist to kill — so the guard here counts actual
UDF invocations through a Ray counter actor."""
from __future__ import annotations

import pyarrow as pa
import pytest

import ray
import ray.data


@ray.remote
class _Counter:
    def __init__(self) -> None:
        self.n = 0

    def bump(self) -> None:
        self.n += 1

    def get(self) -> int:
        return self.n


def _counted_ds(counter):
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(range(64), pa.int64())})
    ).repartition(4)

    def fn(t: pa.Table) -> pa.Table:
        ray.get(counter.bump.remote())
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def test_collect_tables_single_execution():
    from horizon_ocr_python_ray.functions.collect import collect_tables

    counter = _Counter.remote()
    tables = collect_tables(_counted_ds(counter))
    assert sum(t.num_rows for t in tables) == 64
    assert ray.get(counter.get.remote()) == 4  # one call per block, once


def test_collect_block_refs_single_execution_and_arrow_blocks():
    from horizon_ocr_python_ray.functions.collect import collect_block_refs

    counter = _Counter.remote()
    refs = collect_block_refs(_counted_ds(counter))
    blocks = ray.get(refs)
    assert all(isinstance(b, pa.Table) for b in blocks)
    assert sum(b.num_rows for b in blocks) == 64
    assert ray.get(counter.get.remote()) == 4


def test_collect_table_empty_needs_schema():
    from horizon_ocr_python_ray.functions.collect import collect_table

    empty = ray.data.from_arrow(
        pa.table({"x": pa.array([], pa.int64())}))
    schema = pa.schema([("x", pa.int64())])
    out = collect_table(empty, schema=schema)
    assert out.num_rows == 0 and out.schema == schema
    with pytest.raises(ValueError):
        collect_table(empty)
