"""Cohort retention + pivot (stages/window.py): hand-built cases and
re-shard stability."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from horizon_ocr_python_ray.stages.window import events_pivot, events_retention

_DAY = 86_400_000_000  # us


def _events(rows):
    """rows: (user_id, day, event_type)."""
    return ray.data.from_arrow(pa.table({
        "ts": pa.array([d * _DAY + 5 for _, d, _ in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([e for _, _, e in rows], pa.string()),
    }))


def test_retention_hand_case(ray_session):
    # u1: days 0,1,3; u2: days 1,1,2 (dup same-day event counts once)
    ds = _events([(1, 0, "view"), (1, 1, "view"), (1, 3, "view"),
                  (2, 1, "view"), (2, 1, "click"), (2, 2, "view")])
    out = {(r["cohort_day"], r["day_offset"]): r["n_users"]
           for r in events_retention(ds).take_all()}
    assert out == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (1, 0): 1, (1, 1): 1}


def test_retention_reshard_stable(ray_session):
    rows = [(u, (u * 7 + i) % 5, "view") for u in range(20) for i in range(4)]
    a = sorted(tuple(r.values()) for r in events_retention(_events(rows)).take_all())
    b = sorted(tuple(r.values()) for r in events_retention(
        _events(rows).repartition(6)).take_all())
    assert a == b


def test_pivot_counts(ray_session):
    ds = _events([(1, 0, "view"), (1, 0, "view"), (1, 0, "click"),
                  (2, 0, "click")])
    out = {r["user_id"]: r for r in events_pivot(ds).take_all()}
    assert out[1]["n_view"] == 2 and out[1]["n_click"] == 1
    assert out[2]["n_click"] == 1 and out[2]["n_view"] == 0
    # deterministic sorted column order
    assert list(out[1].keys()) == ["user_id", "n_click", "n_view"]
