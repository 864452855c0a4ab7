"""Vectorized exchange-key hash: value-determinism under every Arrow
layout (chunking, slicing, large types, dictionary), null handling, and
bucket balance — the properties the coarse shuffles rely on."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horizon_ocr_python_ray.functions.fasthash import (
    bucket_column,
    hash64_bytes_column,
    hash64_column,
)
from horizon_ocr_python_ray.stages.skew import host_of, host_of_array, salt_array


def _vals(n=500):
    return [f"gram-{i % 97:04d}-{'x' * (i % 23)}" for i in range(n)]


def test_hash_is_pure_function_of_value_bytes():
    vals = _vals()
    flat = hash64_bytes_column(pa.array(vals))
    chunked = hash64_bytes_column(
        pa.chunked_array([pa.array(vals[:100]), pa.array(vals[100:])]))
    sliced = hash64_bytes_column(pa.array(["pad"] + vals).slice(1))
    large = hash64_bytes_column(pa.array(vals, pa.large_string()))
    binary = hash64_bytes_column(pa.array([v.encode() for v in vals], pa.binary()))
    assert (flat == chunked).all()
    assert (flat == sliced).all()
    assert (flat == large).all()
    assert (flat == binary).all()


def test_equal_values_equal_hash_distinct_values_spread():
    vals = _vals()
    h = hash64_bytes_column(pa.array(vals))
    by_val = {}
    for v, hv in zip(vals, h):
        assert by_val.setdefault(v, hv) == hv
    # 97 distinct values → 97 distinct hashes (any collision here would
    # be a catastrophically weak mix for 64 bits)
    assert len(set(by_val.values())) == len(by_val)


def test_not_order_or_concat_confusable():
    # position salts: permutations and boundary shifts hash differently
    h = hash64_bytes_column(pa.array(["ab", "ba", "a", "b", "abc", "acb"]))
    assert len(set(h.tolist())) == 6


def test_nulls_and_empties():
    h = hash64_bytes_column(pa.array(["", None, "x", None]))
    assert h[1] == 0 and h[3] == 0
    assert h[0] != h[2]
    assert len(hash64_bytes_column(pa.array([], pa.string()))) == 0


def test_int_column_and_dispatch():
    ints = pa.array([1, 2, 1, None], pa.int64())
    h = hash64_column(ints)
    assert h[0] == h[2] and h[0] != h[1] and h[3] == 0
    hs = hash64_column(pa.array(["a", "b"]))
    assert hs[0] != hs[1]


def test_bucket_balance_and_range():
    vals = [f"k{i}" for i in range(20_000)]
    b = bucket_column(pa.array(vals), 64).to_numpy()
    counts = np.bincount(b, minlength=64)
    assert b.min() >= 0 and b.max() < 64
    # uniform-ish: no bucket more than 2x the mean
    assert counts.max() < 2 * counts.mean()
    assert (counts > 0).all()


def test_host_of_array_matches_scalar():
    urls = ["https://Host001.Example.org/p/1", "http://a.b/c/d",
            "no-scheme.example/x", "https://h/", "https://h",
            "a.b/x://y", "", "ftp://UPPER.Host/Path?q=://z"]
    got = host_of_array(pa.array(urls)).to_pylist()
    assert got == [host_of(u) for u in urls]


def test_salt_array_deterministic_in_range():
    urls = pa.array([f"https://host{i % 7}.org/p/{i}" for i in range(300)])
    s1 = salt_array(urls, 8)
    s2 = salt_array(urls, 8)
    assert (s1 == s2).all()
    assert s1.min() >= 0 and s1.max() < 8
    assert len(np.unique(s1)) == 8
