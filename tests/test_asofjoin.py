"""Backward as-of join (stages/asofjoin.py)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import ray

from horizon_ocr_python_ray.stages.asofjoin import event_asof_join

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    """rows: (event_id, minutes-after-T0, user_id, event_type, value)."""
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": [r[3] for r in rows],
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    })).repartition(2)


def _run(rows):
    return (event_asof_join(_events(rows))
            .to_pandas().set_index("left_id").sort_index())


def test_most_recent_prior_click_wins():
    out = _run([
        (1, 0, 7, "click", 1.0),
        (2, 30, 7, "click", 2.5),
        (3, 59, 7, "purchase", 10.0),
        (4, 200, 7, "purchase", 5.0),   # most recent is still click 2
    ])
    assert out.loc[3, "match_id"] == 2
    assert out.loc[3, "match_value_e2"] == 250
    assert out.loc[3, "gap_us"] == 29 * 60 * 1_000_000
    assert out.loc[4, "match_id"] == 2


def test_equal_ts_matches_and_ties_break_to_max_event_id():
    out = _run([
        (1, 60, 1, "click", 1.0),
        (5, 60, 1, "click", 2.0),       # same ts, larger id → wins
        (9, 60, 1, "purchase", 9.0),    # equal ts INCLUDED (>=)
    ])
    assert out.loc[9, "match_id"] == 5
    assert out.loc[9, "gap_us"] == 0


def test_no_prior_click_keeps_sentinels():
    out = _run([
        (1, 10, 3, "purchase", 2.0),
        (2, 20, 3, "click", 3.0),       # AFTER the purchase
    ])
    assert out.loc[1, "match_id"] == -1
    assert out.loc[1, "match_ts_us"] == -1
    assert out.loc[1, "match_value_e2"] == 0
    assert out.loc[1, "gap_us"] == -1


def test_users_do_not_leak():
    # user 2's click sits right before user 1's purchase timewise
    out = _run([
        (1, 39, 2, "click", 3.0),
        (2, 40, 1, "purchase", 1.0),
        (3, 35, 1, "click", 7.0),
    ])
    assert out.loc[2, "match_id"] == 3
    assert out.loc[2, "match_value_e2"] == 700


def test_other_event_types_ignored():
    out = _run([
        (1, 10, 4, "view", 1.0),        # not the right stream
        (2, 20, 4, "click", 2.0),
        (3, 30, 4, "signup", 3.0),      # neither stream
        (4, 40, 4, "purchase", 5.0),
    ])
    assert list(out.index) == [4]
    assert out.loc[4, "match_id"] == 2


def test_skewed_user_no_blowup():
    rows = [(i, i, 9, "click", 1.0) for i in range(1, 400)]
    rows.append((1000, 500, 9, "purchase", 1.0))
    out = event_asof_join(_events(rows)).to_pandas()
    assert len(out) == 1
    assert int(out.match_id.iloc[0]) == 399  # latest click


def _run_fwd(rows):
    return (event_asof_join(_events(rows), direction="forward")
            .to_pandas().set_index("left_id").sort_index())


def test_forward_earliest_following_click_wins():
    out = _run_fwd([
        (1, 10, 7, "purchase", 5.0),
        (2, 30, 7, "click", 1.0),
        (3, 40, 7, "click", 2.0),
        (4, 50, 7, "purchase", 9.0),   # only click 3 remains behind it?
    ])
    assert out.loc[1, "match_id"] == 2
    assert out.loc[1, "gap_us"] == 20 * 60 * 1_000_000
    assert out.loc[4, "match_id"] == -1  # no click at ts >= 50


def test_forward_equal_ts_matches_min_event_id():
    out = _run_fwd([
        (9, 60, 1, "purchase", 9.0),
        (3, 60, 1, "click", 1.0),
        (5, 60, 1, "click", 2.0),
    ])
    assert out.loc[9, "match_id"] == 3
    assert out.loc[9, "gap_us"] == 0


def test_forward_users_do_not_leak():
    # user 2's click is right after user 1's purchase timewise
    out = _run_fwd([
        (1, 41, 2, "click", 3.0),
        (2, 40, 1, "purchase", 1.0),
        (3, 45, 1, "click", 7.0),
    ])
    assert out.loc[2, "match_id"] == 3


def test_unknown_direction_rejected():
    import pytest

    with pytest.raises(ValueError, match="direction"):
        event_asof_join(_events([(1, 0, 1, "purchase", 1.0)]),
                        direction="nearest")
