"""Group-wise embedding centroid sums (stages/vecagg.py): integer-exact
fixed-point semantics + reduceat segment-sum correctness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horizon_ocr_python_ray.stages.vecagg import (
    _partial_centroid,
    _round_half_away,
    emb_centroids,
)


def test_round_half_away_matches_sql_round():
    x = np.array([0.5, 1.5, -0.5, -1.5, 2.4, -2.4])
    assert list(_round_half_away(x)) == [1.0, 2.0, -1.0, -2.0, 2.0, -2.0]


def _tbl(labels, vecs):
    return pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def test_partial_centroid_segment_sums():
    t = _tbl([1, 0, 1], [[0.5, 1.0], [2.0, 3.0], [1.5, -1.0]])
    out = _partial_centroid(t, "label", "embedding").to_pylist()
    by = {(r["label"], r["dim"]): r for r in out}
    assert by[(0, 0)]["partial_sum"] == 2_000_000
    assert by[(0, 1)]["partial_sum"] == 3_000_000
    assert by[(1, 0)]["partial_sum"] == 2_000_000  # 0.5 + 1.5
    assert by[(1, 1)]["partial_sum"] == 0  # 1.0 + (-1.0)
    assert all(r["partial_n"] == (1 if r["label"] == 0 else 2) for r in out)


def test_emb_centroids_matches_numpy_exact(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    labels = rng.integers(0, 4, size=200)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    ds = ray.data.from_arrow(_tbl(labels, vecs)).repartition(8)
    out = emb_centroids(ds).take_all()
    scaled = _round_half_away(vecs.astype(np.float64) * 1e6).astype(np.int64)
    assert len(out) == 4 * 16
    for r in out:
        mask = labels == r["label"]
        assert r["sum_e6"] == int(scaled[mask, r["dim"]].sum())
        assert r["n_vecs"] == int(mask.sum())


def test_variable_dim_rejected():
    t = pa.table({
        "label": pa.array([0, 1], pa.int32()),
        "embedding": pa.array([[1.0], [1.0, 2.0]], pa.list_(pa.float32())),
    })
    import pytest

    with pytest.raises(ValueError):
        _partial_centroid(t, "label", "embedding")


def test_emb_gram_matches_numpy_bruteforce():
    import ray.data

    from horizon_ocr_python_ray.stages.vecagg import GRAM_SCALE, emb_gram

    rng = np.random.RandomState(11)
    mat = rng.uniform(-0.6, 0.6, size=(37, 5)).astype(np.float32)
    t = pa.table({"embedding": pa.array([list(map(float, r)) for r in mat],
                                        pa.list_(pa.float32()))})
    # multiple blocks → exercises the driver fold across partials
    ds = ray.data.from_arrow(t).repartition(4)
    got = emb_gram(ds).to_pandas().set_index(["dim_i", "dim_j"])["gram"]

    q = np.where(mat.astype(np.float64) * GRAM_SCALE >= 0,
                 np.floor(mat.astype(np.float64) * GRAM_SCALE + 0.5),
                 np.ceil(mat.astype(np.float64) * GRAM_SCALE - 0.5)).astype(np.int64)
    want = q.T @ q
    assert len(got) == 5 * 6 // 2
    for i in range(5):
        for j in range(i, 5):
            assert got[(i, j)] == want[i, j]


def test_emb_gram_empty():
    import ray.data

    from horizon_ocr_python_ray.stages.vecagg import emb_gram

    t = pa.table({"embedding": pa.array([], pa.list_(pa.float32()))})
    assert emb_gram(ray.data.from_arrow(t)).num_rows == 0
