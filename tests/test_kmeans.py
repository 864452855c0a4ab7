"""Integer-exact Lloyd k-means (stages/kmeans.py): re-shard stability,
the empty-cluster keep-seed rule, and agreement with a straight numpy
replay of the pinned algorithm."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from horizon_ocr_python_ray.stages.kmeans import emb_kmeans
from horizon_ocr_python_ray.stages.vecagg import EMB_SCALE, _round_half_away

SF = "/root/testdata/sf0.001"


def _ds_from(ids, mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def _numpy_replay(ids, mat, k):
    x = _round_half_away(np.asarray(mat, np.float64) * EMB_SCALE).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    x = x[order]
    ids = np.asarray(ids)[order]
    seeds = x[:k].copy()
    d2 = ((x[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    cl1 = d2.argmin(axis=1)
    cents = seeds.copy()
    for c in range(k):
        m = cl1 == c
        if m.any():
            cents[c] = x[m].sum(axis=0) // int(m.sum())
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cl2 = d2.argmin(axis=1)
    return dict(zip(ids.tolist(), cl2.tolist()))


def test_matches_numpy_replay(ray_session):
    rng = np.random.default_rng(7)
    ids = list(range(40))
    mat = rng.normal(size=(40, 8)) * 0.3
    out = {r["vec_id"]: r["cluster"]
           for r in emb_kmeans(_ds_from(ids, mat), k=4).take_all()}
    assert out == _numpy_replay(ids, mat, 4)


def test_reshard_stable(ray_session):
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    a = {r["vec_id"]: (r["cluster"], r["dist"])
         for r in emb_kmeans(emb, k=8).take_all()}
    b = {r["vec_id"]: (r["cluster"], r["dist"])
         for r in emb_kmeans(emb.repartition(7), k=8).take_all()}
    assert a == b
    assert len(a) == emb.count()


def test_empty_cluster_keeps_seed(ray_session):
    # Seeds 0 and 1 are identical points: in iteration 1 every vector
    # ties to sid 0, so cluster 1 is EMPTY at the update and must keep
    # its seed centroid (0,0) — no crash/NaN. Cluster 0's centroid then
    # drifts toward the (0.01, 0) member, so the final pass re-assigns
    # the origin points to the kept seed (dist 0 beats the drifted
    # centroid): the empty-cluster rule is observable in the output.
    mat = np.array([
        [0.0, 0.0], [0.0, 0.0], [0.5, 0.5],   # seeds 0, 1, 2
        [0.01, 0.0], [0.49, 0.5],
    ])
    out = {r["vec_id"]: r["cluster"]
           for r in emb_kmeans(_ds_from(range(5), mat), k=3).take_all()}
    assert out[0] == out[1] == 1   # kept seed wins the final pass
    assert out == _numpy_replay(list(range(5)), mat, 3)
