"""Job metrics: distributed counters over extraction results.

The reference's CostTracker is a lock-guarded in-process record list
(``/root/reference/docvision/azure/cost_tracker.py:56-340``) — a global
mutable bottleneck. The Ray restatement (SURVEY.md §2.3 A12): emit
per-batch partial counter rows inside ``map_batches`` and fold them with
one tiny ``groupby`` — no shared actor, no lock, no bottleneck. Lineage
metrics per output partition (rows, checksum, wall) live in the
checkpoint manifest (``state/checkpoint.py``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Sum


def job_metrics(results_ds):
    """Extraction results → one row per route with counters:
    (route, n_docs, n_errors, text_chars, n_spans)."""

    def partial(t: pa.Table) -> pa.Table:
        err = pc.cast(pc.is_valid(t.column("error")), pa.int64())
        chars = pc.cast(pc.utf8_length(t.column("extracted_text")), pa.int64())
        spans = pc.cast(pc.list_value_length(t.column("spans")), pa.int64())
        t2 = pa.Table.from_arrays(
            [t.column("route"), pa.array([1] * t.num_rows, pa.int64()), err, chars, spans],
            names=["route", "one", "err", "chars", "spans"],
        )
        agg = pa.TableGroupBy(t2, ["route"]).aggregate(
            [("one", "sum"), ("err", "sum"), ("chars", "sum"), ("spans", "sum")]
        )
        return agg.rename_columns(["route", "p_docs", "p_errors", "p_chars", "p_spans"])

    partials = results_ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("route").aggregate(
        Sum("p_docs", alias_name="n_docs"),
        Sum("p_errors", alias_name="n_errors"),
        Sum("p_chars", alias_name="text_chars"),
        Sum("p_spans", alias_name="n_spans"),
    )
    return out.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("route")] + [t.column(c).cast(pa.int64())
                                   for c in ("n_docs", "n_errors", "text_chars", "n_spans")],
            names=["route", "n_docs", "n_errors", "text_chars", "n_spans"],
        ),
        batch_format="pyarrow",
    )
