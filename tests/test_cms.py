"""Count-Min sketch (stages/cms.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horizon_ocr_python_ray.stages.cms import (
    DEPTH,
    WIDTH,
    _partial_matrix,
    cms_probe_counts,
    key_cells,
)


def test_key_cells_deterministic_and_in_range():
    a = key_cells("42")
    assert a == key_cells("42")
    assert len(a) == DEPTH
    assert all(0 <= c < WIDTH for c in a)
    assert key_cells("42") != key_cells("43")


def test_key_cells_match_duckdb():
    import duckdb

    for key in ("7", "12345", "abc"):
        rows = duckdb.sql(
            f"SELECT CAST(md5_number_lower('{key}:' || CAST(r AS VARCHAR))"
            f" % {WIDTH} AS BIGINT) FROM (SELECT unnest([0,1,2,3]) AS r)"
        ).fetchall()
        assert tuple(v for (v,) in rows) == key_cells(key)


def test_partial_matrix_counts():
    t = pa.table({"user_id": pa.array([1, 1, 2], pa.int64())})
    p = _partial_matrix(t, "user_id")
    m = np.zeros((DEPTH, WIDTH), dtype=np.int64)
    m[p.column("r").to_numpy(), p.column("cell").to_numpy()] = (
        p.column("v").to_numpy())
    for r, c in enumerate(key_cells("1")):
        assert m[r, c] >= 2
    assert m.sum() == 3 * DEPTH  # every occurrence lands once per row


def test_estimates_upper_bound_truth(ray_session):
    import collections

    import ray.data

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 50, size=5000)
    truth = collections.Counter(keys.tolist())
    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array(keys, pa.int64())})).repartition(5)
    out = cms_probe_counts(ds, k=20)
    assert list(out["user_id"]) == sorted(set(keys))[:20]
    for k, est in zip(out["user_id"], out["est_count"]):
        assert est >= truth[k]                      # one-sided CMS bound
        assert est <= truth[k] + 5000 * DEPTH / WIDTH * 4  # loose eps slack
