"""Two-stream as-of join (stages/window.py:events_attribution) and the
exact 1-NN self-join (stages/ann.py:emb_nn_join)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from horizon_ocr_python_ray.stages.ann import emb_nn_join
from horizon_ocr_python_ray.stages.window import events_attribution


def _events(rows):
    """rows: (event_id, user_id, ts_us, event_type)."""
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))


def test_attribution_picks_latest_strictly_earlier(ray_session):
    ds = _events([
        (1, 7, 100, "view"), (2, 7, 200, "view"),
        (3, 7, 200, "purchase"),          # equal ts: view 2 NOT eligible
        (4, 7, 300, "purchase"),          # latest earlier = view 2
        (5, 8, 50, "purchase"),           # no prior view → dropped
        (6, 7, 150, "click"),             # other types ignored
    ])
    out = {r["purchase_id"]: r["view_id"]
           for r in events_attribution(ds).take_all()}
    assert out == {3: 1, 4: 2}


def test_attribution_equal_ts_tie_to_max_view_id(ray_session):
    ds = _events([
        (10, 1, 100, "view"), (11, 1, 100, "view"),   # equal-ts views
        (12, 1, 200, "purchase"),
    ])
    out = {r["purchase_id"]: r["view_id"]
           for r in events_attribution(ds).take_all()}
    assert out == {12: 11}


def _emb(mat):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    }))


def test_nn_join_hand_case(ray_session):
    mat = np.array([[0.0, 0.0], [0.1, 0.0], [0.5, 0.5], [0.45, 0.5]])
    out = {r["vec_id"]: r["nn_id"] for r in emb_nn_join(_emb(mat)).take_all()}
    assert out == {0: 1, 1: 0, 2: 3, 3: 2}


def test_nn_join_tie_breaks_to_smaller_id(ray_session):
    # vecs 1 and 2 are both at distance d from 0; the smaller id wins.
    mat = np.array([[0.0, 0.0], [0.2, 0.0], [-0.2, 0.0]])
    out = {r["vec_id"]: (r["nn_id"], r["dist"])
           for r in emb_nn_join(_emb(mat)).take_all()}
    assert out[0] == (1, 200000 ** 2)
    assert out[1][0] == 0 and out[2][0] == 0


def test_nn_join_reshard_stable(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(60, 6)) * 0.3
    a = sorted(tuple(r.values()) for r in emb_nn_join(_emb(mat)).take_all())
    b = sorted(tuple(r.values()) for r in emb_nn_join(
        _emb(mat).repartition(7)).take_all())
    assert a == b
