"""Range-partitioned sorted Parquet sink (distributed-sort-as-output)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ds(n=5000, seed=3):
    import ray.data

    rng = np.random.RandomState(seed)
    keys = rng.permutation(n * 7)[:n].astype(np.int64)
    return ray.data.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "payload": pa.array([f"row-{i}" for i in range(n)], pa.string()),
    })).repartition(6)


def test_sorted_sink_global_order_and_balance(ray_session, tmp_path):
    from horizon_ocr_python_ray.state.sortsink import write_sorted_parquet

    out = str(tmp_path / "sorted")
    man = write_sorted_parquet(_ds(), "k", out, num_partitions=8)
    assert len(man) == 8
    # disjoint, ordered ranges across pids
    for i in range(1, len(man)):
        assert man.key_min.iloc[i] > man.key_max.iloc[i - 1]
    # each file internally sorted; concatenation in pid order = global sort
    allk = []
    for p in man.path:
        ks = pq.read_table(p, columns=["k"]).column("k").to_pylist()
        assert ks == sorted(ks)
        allk.extend(ks)
    assert allk == sorted(allk)
    assert len(allk) == 5000
    # sample-quantile balance: no partition above 3× the ideal share
    assert man.rows.max() <= 3 * (5000 // 8)


def test_sorted_sink_atomic_files_only(ray_session, tmp_path):
    from horizon_ocr_python_ray.state.sortsink import write_sorted_parquet

    out = str(tmp_path / "sorted2")
    write_sorted_parquet(_ds(800, seed=5), "k", out, num_partitions=4)
    names = sorted(os.listdir(out))
    assert all(n.endswith(".parquet") for n in names)  # no .tmp left
