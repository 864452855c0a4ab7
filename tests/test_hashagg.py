"""Bucketed hash aggregation: equality with Dataset.groupby aggregates."""

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages.hashagg import (
    crc_bucket_array, grouped_aggregate, grouped_reduce)


def _ds(n=500, nkeys=173):
    t = pa.table({
        "k": [f"key-{i % nkeys:05d}" for i in range(n)],
        "v": [i * 7 % 101 for i in range(n)],
        "s": [f"s{i % 13:02d}" for i in range(n)],
    })
    return ray.data.from_arrow(t).repartition(7)


def _sorted(rows):
    return sorted(rows, key=lambda r: tuple(str(v) for v in r.values()))


def test_grouped_aggregate_matches_ray_groupby(ray_session):
    from ray.data.aggregate import Count, Max, Min, Sum

    got = grouped_aggregate(
        _ds(), "k",
        [("v", "sum", "v_sum"), ("v", "min", "v_min"),
         ("s", "max", "s_max"), ("k", "count", "n")],
        num_buckets=8).take_all()
    want = _ds().groupby("k").aggregate(
        Sum("v", alias_name="v_sum"), Min("v", alias_name="v_min"),
        Max("s", alias_name="s_max"), Count(alias_name="n")).take_all()
    assert _sorted(got) == _sorted(want)


def test_grouped_aggregate_multi_key(ray_session):
    from ray.data.aggregate import Sum

    got = grouped_aggregate(
        _ds(), ["k", "s"], [("v", "sum", "v_sum")], num_buckets=8).take_all()
    want = _ds().groupby(["k", "s"]).aggregate(
        Sum("v", alias_name="v_sum")).take_all()
    assert _sorted(got) == _sorted(want)


def test_grouped_reduce_sees_complete_groups(ray_session):
    def per_bucket(t: pa.Table) -> pa.Table:
        r = t.group_by("k").aggregate([("v", "sum")])
        return r.rename_columns(["k", "v_sum"])

    got = grouped_reduce(_ds(), "k", per_bucket, num_buckets=8).take_all()
    from ray.data.aggregate import Sum

    want = _ds().groupby("k").aggregate(Sum("v", alias_name="v_sum")).take_all()
    assert _sorted(got) == _sorted(want)


def test_bucket_determinism_and_types():
    s = pa.chunked_array([pa.array(["a", "b"]), pa.array(["a"])])
    b = crc_bucket_array(s, 16).to_pylist()
    assert b[0] == b[2]
    ints = crc_bucket_array(pa.array([1, 2, 1], pa.int64()), 16).to_pylist()
    assert ints[0] == ints[2]
    assert all(0 <= x < 16 for x in b + ints)


def test_unknown_agg_fn_raises():
    with pytest.raises(KeyError):
        grouped_aggregate(None, "k", [("v", "median", "m")])
