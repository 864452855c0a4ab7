"""Adaptive percentile gate (stages/gate.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages import gate
from horizon_ocr_python_ray.stages.gate import (
    exact_quantile_threshold,
    percentile_gate,
)


def _ds(vals):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(vals))), "n_chars": vals})).repartition(3)


def test_threshold_type1_rule():
    # 10 values 1..10: P10 needs cum >= ceil(0.1*10)=1 → smallest value 1;
    # P50 needs cum >= 5 → value 5; P100 → 10
    ds = _ds(list(range(1, 11)))
    assert exact_quantile_threshold(ds, "n_chars", 0.1) == 1
    assert exact_quantile_threshold(ds, "n_chars", 0.5) == 5
    assert exact_quantile_threshold(ds, "n_chars", 1.0) == 10


def test_threshold_with_duplicates():
    ds = _ds([3, 3, 3, 7, 7, 9])  # cum: 3→3, 7→5, 9→6
    assert exact_quantile_threshold(ds, "n_chars", 0.5) == 3  # ceil(3)=3 ≤ 3
    assert exact_quantile_threshold(ds, "n_chars", 0.75) == 7  # need 5


def test_gate_flags():
    out = (percentile_gate(_ds([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]),
                           "n_chars", q=0.3).to_pandas()
           .sort_values("doc_id"))
    # threshold = 3 (cum>=3) → values 1, 2 dropped
    assert out.kept.tolist() == [False, False] + [True] * 8


def test_exact_count_semantics():
    # a gate at q keeps at least (1-q)·N rows and the threshold value rows
    vals = [5] * 50 + list(range(100, 150))
    out = percentile_gate(_ds(vals), "n_chars", q=0.5).to_pandas()
    assert out.kept.sum() == 100  # threshold lands on 5 → everything kept
    out2 = percentile_gate(_ds(vals), "n_chars", q=0.51).to_pandas()
    assert out2.kept.sum() == 50  # threshold moves past the 5-block


def test_bad_q_and_domain_guard(monkeypatch):
    with pytest.raises(ValueError):
        exact_quantile_threshold(_ds([1]), "n_chars", 0.0)
    monkeypatch.setattr(gate, "HISTOGRAM_DOMAIN_MAX", 2)
    with pytest.raises(ValueError, match="metric domain"):
        exact_quantile_threshold(_ds([1, 2, 3, 4, 5]), "n_chars", 0.5)
