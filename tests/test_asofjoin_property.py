"""Differential property test: the bucketed searchsorted as-of join
must agree with a naive per-event Python reference on arbitrary event
streams, in BOTH directions — the monotone key encoding, user-range
clamps and tie-breaks are the parts unit tests can miss."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from horizon_ocr_python_ray.stages.asofjoin import event_asof_join

T0 = dt.datetime(2024, 1, 1)

# (minute, user, type) tuples; minutes collide often to exercise ties
_event = st.tuples(st.integers(0, 30), st.integers(1, 4),
                   st.sampled_from(["purchase", "click", "view"]))
_streams = st.lists(_event, min_size=1, max_size=25)


def _naive(rows, direction):
    rights = [(u, m, i) for i, (m, u, ty) in rows if ty == "click"]
    out = {}
    for i, (m, u, ty) in rows:
        if ty != "purchase":
            continue
        if direction == "backward":
            cand = [(rm, ri) for (ru, rm, ri) in rights
                    if ru == u and rm <= m]
            match = max(cand) if cand else None
        else:
            cand = [(rm, ri) for (ru, rm, ri) in rights
                    if ru == u and rm >= m]
            match = min(cand) if cand else None
        if match is None:
            out[i] = (-1, -1, -1)
        else:
            rm, ri = match
            out[i] = (ri, rm * 60_000_000 + 1_704_067_200_000_000,
                      abs(m - rm) * 60_000_000)
    return out


@settings(max_examples=15, deadline=None)
@given(_streams, st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_naive(events, direction):
    rows = list(enumerate(events, start=1))
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([i for i, _ in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(minutes=m)
                        for _, (m, _, _) in rows], pa.timestamp("us")),
        "user_id": pa.array([u for _, (_, u, _) in rows], pa.int64()),
        "event_type": [ty for _, (_, _, ty) in rows],
        "value": pa.array([1.0] * len(rows), pa.float64()),
    })).repartition(2)
    got = event_asof_join(ds, direction=direction).to_pandas()
    want = _naive(rows, direction)
    if got.empty:  # Ray to_pandas drops columns on all-empty blocks
        assert not want
        return
    assert set(got.left_id) == set(want)
    for _, r in got.iterrows():
        m_id, m_ts, gap = want[int(r.left_id)]
        assert int(r.match_id) == m_id
        assert int(r.match_ts_us) == m_ts
        assert int(r.gap_us) == gap
