"""Range-partitioned sorted Parquet sink — the distributed sort as an
OUTPUT property (the TeraSort shape).

A 10^12-row global ``ds.sort`` materializes the whole corpus through an
all-to-all exchange; but a *sorted output* only needs (1) cut points
that split the key space into balanced ranges and (2) a local sort per
range. This sink does exactly that:

1. **Sample** — each batch contributes its ``SAMPLE_PER_BATCH``
   smallest-md5 keys (a deterministic uniform sample: the md5 order is
   independent of the key order), folded to one small sample on the
   driver.
2. **Cut points** — P−1 equally-spaced sample quantiles → broadcast.
3. **Assign** — ``searchsorted`` per batch tags each row's range id —
   a vectorized map, no skew beyond the sample's accuracy.
4. **Write** — one ``groupby(range_id)`` co-locates each range;
   the per-group fn sorts ITS range and writes ``part={pid:05d}.parquet``
   directly from the worker (never through the driver), returning one
   manifest row (pid, rows, key_min, key_max, path, sha of the key
   column) — the lineage/verification surface.

Reading the files in pid order yields a globally sorted corpus:
ranges are disjoint by construction and each file is internally
sorted. ``tests/test_sortsink.py`` asserts both plus balance.

Reference parity: the reference's output writer is a per-document
single-process save (``docvision/io/writers.py``); a corpus-ordered
multi-file sink only exists at the engine level."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from ..functions.collect import collect_tables

SAMPLE_PER_BATCH = 64


def _md5_low64_arr(vals: list) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
         for v in vals], dtype=np.uint64)


def write_sorted_parquet(ds, key: str, out_dir: str,
                         num_partitions: int = 8) -> pd.DataFrame:
    """Write ``ds`` as ``num_partitions`` range-partitioned, internally
    sorted Parquet files under ``out_dir``; returns the manifest
    DataFrame (pid, rows, key_min, key_max, path) sorted by pid."""
    os.makedirs(out_dir, exist_ok=True)

    def sample_partial(t: pa.Table) -> pa.Table:
        keys = t.column(key).to_pylist()
        if not keys:
            return pa.table({key: pa.array([], t.column(key).type)})
        h = _md5_low64_arr(keys)
        keep = np.argsort(h, kind="stable")[:SAMPLE_PER_BATCH]
        return t.select([key]).take(pa.array(np.sort(keep)))

    parts = collect_tables(
        ds.map_batches(sample_partial, batch_format="pyarrow"))
    if not parts:
        return pd.DataFrame(columns=["pid", "rows", "key_min", "key_max", "path"])
    sample = np.sort(pa.concat_tables(parts).column(key).to_numpy(
        zero_copy_only=False))
    qs = [int(len(sample) * i / num_partitions) for i in range(1, num_partitions)]
    cuts = sample[qs]
    cuts_ref = ray.put(cuts)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cuts_ref)
        pid = np.searchsorted(c, t.column(key).to_numpy(zero_copy_only=False),
                              side="right")
        return t.append_column("__pid", pa.array(pid, pa.int64()))

    def write_range(g: pd.DataFrame) -> pd.DataFrame:
        pid = int(g["__pid"].iloc[0])
        g = g.drop(columns=["__pid"]).sort_values(key).reset_index(drop=True)
        path = os.path.join(out_dir, f"part={pid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, path)  # atomic publish
        return pd.DataFrame({
            "pid": [pid], "rows": [len(g)],
            "key_min": [g[key].iloc[0]], "key_max": [g[key].iloc[-1]],
            "path": [path],
        })

    manifest = (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("__pid")
                .map_groups(write_range, batch_format="pandas")
                .to_pandas())
    return manifest.sort_values("pid").reset_index(drop=True)
