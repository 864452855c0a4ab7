"""As-of join over event streams — the temporal point join Ray Data has
no operator for (the third member of the custom-join triple next to the
interval join of ``stages/rangejoin.py`` and the windowed aggregates of
``stages/window.py``; reference analog: the nearest-match tolerance
joins of ``ocr/layout.py``, J4 in SURVEY.md §2, restated for the time
axis).

``event_asof_join`` attaches to every LEFT event (e.g. ``purchase``)
the same user's most recent RIGHT event (e.g. ``click``) at
``ts_right <= ts_left`` — the classic backward as-of join (feature
lookup "state as of the conversion", ad last-touch, sensor alignment).
``direction="forward"`` flips it to the earliest right event at
``ts_right >= ts_left`` (next-touch attribution, time-to-next-event),
same plan with the mirrored searchsorted side and user-range clamp.

Plan (one narrow shuffle, no inequality expansion, no per-row Python):

1. Both streams are projected in a batch combiner to fixed-width
   columns ``(user_id, ts_us, event_id, value_e2, role)`` and ride ONE
   shuffle co-located by ``hash(user_id)``
   (``stages/hashagg.grouped_reduce``).
2. Each bucket encodes ``(user, ts)`` as one monotone int64 key
   ``uidx * span + (ts - t_min)`` (the rangejoin.py key trick, fit
   asserted loudly), lexsorts the build side by ``(key, event_id)``
   once, and answers every probe with a single
   ``np.searchsorted(..., side="right") - 1`` — O((L+R) log R) per
   bucket regardless of per-user skew.

Semantics pinned for the oracle (tie-exact, no ambiguity): the match is
the right event with the greatest ``(ts, event_id)`` among
``ts <= left.ts`` — equal timestamps MATCH (DuckDB ``ASOF JOIN``'s
``>=`` convention) and ties on ts break to the larger event_id, which
the SQL replay expresses as ``last_value(... IGNORE NULLS)`` over the
union of both streams ordered by ``(ts, is_left, event_id)``. Left
events with no prior right event are KEPT (left shape) with the
integer sentinels ``match_id = -1, match_ts_us = -1, match_value_e2 =
0, gap_us = -1`` so the compare surface stays null-free int64.

At 100 TB the only exchange is the 4-column int64 shuffle of both
streams; skewed users are safe by construction (searchsorted, never a
per-user product); skewed BUCKETS re-bucket by raising ``num_buckets``
(the key-space trick documented in ``stages/hashagg.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashagg import grouped_reduce

#: right (build) rows carry role 0, left (probe) rows role 1.
_ROLE_BUILD, _ROLE_PROBE = 0, 1

_OUT_SCHEMA = {
    "left_id": pa.int64(),
    "user_id": pa.int64(),
    "ts_us": pa.int64(),
    "match_id": pa.int64(),
    "match_ts_us": pa.int64(),
    "match_value_e2": pa.int64(),
    "gap_us": pa.int64(),
}


def _empty() -> pa.Table:
    return pa.table({k: pa.array([], t) for k, t in _OUT_SCHEMA.items()})


def event_asof_join(events_ds, left_type: str = "purchase",
                    right_type: str = "click", num_buckets: int = 64,
                    direction: str = "backward"):
    """events (event_id, ts, user_id, event_type, value) → one row per
    ``left_type`` event: (left_id, user_id, ts_us, match_id,
    match_ts_us, match_value_e2, gap_us) where match_* describe the
    same user's nearest ``right_type`` event — most recent at
    ts <= left ts for ``direction="backward"`` (tie: greatest
    (ts, event_id)), earliest at ts >= left ts for ``"forward"``
    (tie: smallest (ts, event_id)); equal timestamps match in both.
    Sentinels -1/-1/0/-1 when the user has no event on that side.
    ``gap_us`` is always the non-negative |ts - match_ts|."""
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"unknown direction {direction!r}; expected backward|forward")
    forward = direction == "forward"

    def project(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array([left_type, right_type]))
        t = t.filter(keep)
        ts_us = t.column("ts").cast(pa.int64())
        e2 = pc.cast(pc.round(pc.multiply(t.column("value"), 100.0),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        role = pc.if_else(pc.equal(t.column("event_type"), left_type),
                          pa.scalar(_ROLE_PROBE, pa.int64()),
                          pa.scalar(_ROLE_BUILD, pa.int64()))
        return pa.table({"user_id": t.column("user_id"),
                         "ts_us": ts_us,
                         "event_id": t.column("event_id"),
                         "value_e2": e2,
                         "role": role})

    def asof_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        role = t.column("role").to_numpy()
        probe_mask = role == _ROLE_PROBE
        if not probe_mask.any():
            return _empty()
        users = t.column("user_id").to_numpy()
        ts = t.column("ts_us").to_numpy()
        eid = t.column("event_id").to_numpy()
        val = t.column("value_e2").to_numpy()
        # bucket-local dense user index shared by both sides
        uniq, uidx = np.unique(users, return_inverse=True)
        t_min = int(ts.min())
        span = int(ts.max()) - t_min + 2
        if len(uniq) * span >= 2**62:
            raise ValueError(
                "event_asof_join: bucket key space overflow "
                f"({len(uniq)} users x span {span}); raise num_buckets "
                "so each bucket holds fewer users")
        key = uidx * span + (ts - t_min)
        build_mask = ~probe_mask
        if not build_mask.any():
            n = int(probe_mask.sum())
            return pa.table({
                "left_id": pa.array(eid[probe_mask], pa.int64()),
                "user_id": pa.array(users[probe_mask], pa.int64()),
                "ts_us": pa.array(ts[probe_mask], pa.int64()),
                "match_id": pa.array(np.full(n, -1), pa.int64()),
                "match_ts_us": pa.array(np.full(n, -1), pa.int64()),
                "match_value_e2": pa.array(np.zeros(n, np.int64)),
                "gap_us": pa.array(np.full(n, -1), pa.int64()),
            })
        bkey = key[build_mask]
        # lexsort (key, event_id): among equal-ts builds, side="right"
        # - 1 lands on the LAST (max event_id) for backward and
        # side="left" on the FIRST (min event_id) for forward — the
        # pinned tiebreaks.
        order = np.lexsort((eid[build_mask], bkey))
        bkey = bkey[order]
        beid = eid[build_mask][order]
        bts = ts[build_mask][order]
        bval = val[build_mask][order]
        pkey = key[probe_mask]
        if forward:
            idx = np.searchsorted(bkey, pkey, side="left")
            # the earliest build at key >= probe must not fall into the
            # NEXT user's range: clamp to the user's one-past-last key.
            uend = np.searchsorted(
                bkey, (uidx[probe_mask] + 1) * span, side="left")
            matched = idx < uend
        else:
            idx = np.searchsorted(bkey, pkey, side="right") - 1
            # a probe near its user's range start must not match the
            # previous user's tail: clamp to the user's first build key.
            ustart = np.searchsorted(bkey, uidx[probe_mask] * span,
                                     side="left")
            matched = idx >= ustart
        safe = np.where(matched, idx, 0)
        m_id = np.where(matched, beid[safe], -1)
        m_ts = np.where(matched, bts[safe], -1)
        m_val = np.where(matched, bval[safe], 0)
        gap = np.where(matched, np.abs(ts[probe_mask] - m_ts), -1)
        return pa.table({
            "left_id": pa.array(eid[probe_mask], pa.int64()),
            "user_id": pa.array(users[probe_mask], pa.int64()),
            "ts_us": pa.array(ts[probe_mask], pa.int64()),
            "match_id": pa.array(m_id, pa.int64()),
            "match_ts_us": pa.array(m_ts, pa.int64()),
            "match_value_e2": pa.array(m_val, pa.int64()),
            "gap_us": pa.array(gap, pa.int64()),
        })

    projected = events_ds.map_batches(project, batch_format="pyarrow")
    return grouped_reduce(projected, "user_id", asof_bucket,
                          num_buckets=num_buckets)
