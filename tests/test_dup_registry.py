"""Dup-registry discovery (stages/dedup.py build_dup_registry): the
driver single-pass and distributed-groupby paths must produce the same
registry, and the distributed path's driver folds must refuse loudly —
naming variant="grouped" — instead of collecting an unbounded duplicate
set."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages import dedup as dmod


def _sniffed(n_groups=5, members_per_group=3):
    ts0 = datetime.datetime(2024, 1, 1)
    rows = []
    for g in range(n_groups):
        for m in range(members_per_group):
            rows.append((f"hash{g:03d}",
                         f"https://ex.com/{g}/{m}",
                         ts0 + datetime.timedelta(minutes=g * 10 + m),
                         "en"))
    # plus unique singletons that must never enter the registry
    for s in range(7):
        rows.append((f"solo{s:03d}", f"https://solo.com/{s}", ts0, "de"))
    return ray.data.from_arrow(pa.table({
        "content_hash": pa.array([r[0] for r in rows], pa.string()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "warc_ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "lang": pa.array([r[3] for r in rows], pa.string()),
    })).repartition(4)


def test_distributed_path_matches_driver_path():
    ds = _sniffed()
    # approx_rows below the threshold → driver single-pass
    drop_a, fan_a = dmod.build_dup_registry(ds, approx_rows=10)
    # approx_rows=None → distributed groupby path
    drop_b, fan_b = dmod.build_dup_registry(ds, approx_rows=None)
    assert drop_a == drop_b
    assert fan_a == fan_b
    # 5 groups × (3-1) dropped members
    assert len(drop_a) == 10
    assert all(rep not in drop_a for rep in fan_a)


def test_distributed_path_refuses_past_member_cap(monkeypatch):
    monkeypatch.setattr(dmod, "REGISTRY_MEMBER_MAX_ROWS", 3)
    with pytest.raises(dmod.RegistryTooLargeError, match="grouped"):
        dmod.build_dup_registry(_sniffed(), approx_rows=None)
