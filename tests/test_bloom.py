"""Bloom-filter membership (stages/bloom.py)."""

from __future__ import annotations

import pyarrow as pa
import ray

from horizon_ocr_python_ray.stages.bloom import (
    bloom_positions,
    bloom_probe,
)


def _ds(urls):
    return ray.data.from_arrow(pa.table({"url": urls}))


def test_positions_deterministic_and_in_range():
    p = bloom_positions("http://x.test/a", k=4, m=1 << 18)
    assert p == bloom_positions("http://x.test/a", k=4, m=1 << 18)
    assert len(p) == 4 and all(0 <= x < (1 << 18) for x in p)


def test_no_false_negatives():
    base = [f"http://h{i}.test/p" for i in range(200)]
    out = bloom_probe(_ds(base), _ds(base[:50])).to_pandas()
    assert out.hit.all()  # every member answers yes


def test_misses_on_disjoint_probe_with_big_m():
    base = [f"http://h{i}.test/p" for i in range(100)]
    probe = [f"http://other{i}.test/q" for i in range(100)]
    out = bloom_probe(_ds(base), _ds(probe), m=1 << 22).to_pandas()
    # FP rate ~(1-e^(-400/4M))^4 ≈ 1e-16: all misses
    assert not out.hit.any()


def test_false_positives_appear_when_saturated():
    base = [f"http://h{i}.test/p" for i in range(500)]
    probe = [f"http://other{i}.test/q" for i in range(200)]
    out = bloom_probe(_ds(base), _ds(probe), m=256, k=4).to_pandas()
    # load kn/m ≈ 7.8 → the filter is saturated; false positives certain
    assert out.hit.any()
    # and they are deterministic
    out2 = bloom_probe(_ds(base), _ds(probe), m=256, k=4).to_pandas()
    assert out.sort_values("url").hit.tolist() == \
        out2.sort_values("url").hit.tolist()
