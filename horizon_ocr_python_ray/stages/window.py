"""Tumbling-window aggregation over the ``events`` stream table.

Ray Data has no event-time windows (SURVEY.md §2.7 — the reference is
strictly batch too); a tumbling window over a bounded log is a grouped
aggregate on ``floor(epoch(ts) / width)``. Partial pre-aggregation inside
``map_batches`` (one row per (key, window) per batch) shrinks the shuffle
to near-distinct-group size before the global ``groupby`` — the
combiner-before-shuffle pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Sum


def _partial(batch: pa.Table, width_s: int) -> pa.Table:
    epoch_us = batch.column("ts").cast(pa.int64())
    win = pc.multiply(
        pc.floor(pc.divide(pc.cast(epoch_us, pa.float64()), float(width_s) * 1e6)).cast(pa.int64()),
        width_s * 1_000_000,
    )
    t = batch.append_column("window_start_us", win)
    agg = pa.TableGroupBy(t, ["event_type", "window_start_us"]).aggregate(
        [("value", "sum"), ("event_id", "count")]
    )
    return agg.rename_columns(["event_type", "window_start_us", "part_sum", "part_n"])


def tumbling_window(events_ds, width_s: int = 3600):
    """events → (event_type, window_start, n_events, sum_value)."""
    partials = events_ds.map_batches(
        lambda t: _partial(t, width_s), batch_format="pyarrow", batch_size=8192
    )
    out = partials.groupby(["event_type", "window_start_us"]).aggregate(
        Sum("part_sum", alias_name="sum_value"),
        Sum("part_n", alias_name="n_events"),
    )

    def finish(t: pa.Table) -> pa.Table:
        ws = t.column("window_start_us").cast(pa.timestamp("us"))
        return pa.Table.from_arrays(
            [t.column("event_type"), ws,
             t.column("n_events").cast(pa.int64()), t.column("sum_value")],
            names=["event_type", "window_start", "n_events", "sum_value"],
        )

    return out.map_batches(finish, batch_format="pyarrow")
