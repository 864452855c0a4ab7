"""Adaptive percentile gate: flag/drop every document below the EXACT
corpus q-quantile of an integer quality metric — the adaptive-threshold
filter (DataComp-style) where the cut point is a property of the corpus,
not a constant.

Two-phase, shuffle-free plan: per-batch value histograms (one row per
DISTINCT metric value per batch — the metric domain, not the corpus, is
the cardinality) fold on the driver into the global histogram; the
exact type-1 threshold is the smallest value whose cumulative count
reaches ``ceil(q·N)`` (the same quantile rule pinned in
``stages/window.events_quantiles``); the gate itself is then a
stateless vectorized compare inside the second streaming pass. A guard
refuses metric domains too large to fold — a real quality metric
(length, token count, score bucket) has a bounded domain by nature.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

#: Distinct-metric-value bound for the driver histogram fold.
HISTOGRAM_DOMAIN_MAX = 10_000_000


def _partial_hist(batch: pa.Table, col: str) -> pa.Table:
    v, c = np.unique(batch.column(col).to_numpy(), return_counts=True)
    return pa.table({"v": pa.array(v.astype(np.int64), pa.int64()),
                     "c": pa.array(c, pa.int64())})


def exact_quantile_threshold(ds, col: str, q: float) -> int:
    """Exact type-1 q-quantile of an integer column: the smallest value
    v with cumcount(≤ v) ≥ ceil(q·N)."""
    if not 0.0 < q <= 1.0:
        raise ValueError("need 0 < q <= 1")
    hist: Counter = Counter()
    for t in (ds.map_batches(_partial_hist, batch_format="pyarrow",
                             fn_kwargs={"col": col})
              .iter_batches(batch_format="pyarrow")):
        for v, c in zip(t.column("v").to_pylist(), t.column("c").to_pylist()):
            hist[v] += c
        if len(hist) > HISTOGRAM_DOMAIN_MAX:
            raise ValueError(
                f"metric domain exceeds {HISTOGRAM_DOMAIN_MAX} distinct "
                "values; bucket the metric first")
    n = sum(hist.values())
    if n == 0:
        raise ValueError("empty input")
    need = math.ceil(q * n)
    cum = 0
    for v in sorted(hist):
        cum += hist[v]
        if cum >= need:
            return int(v)
    return int(max(hist))  # unreachable: cum reaches n ≥ need


def percentile_gate(ds, col: str, q: float = 0.1, id_col: str = "doc_id"):
    """docs → (id, metric, kept): ``kept`` iff metric ≥ the exact corpus
    q-quantile. Second pass is stateless and vectorized; the threshold
    is a scalar closure constant (no broadcast object needed)."""
    thr = exact_quantile_threshold(ds, col, q)

    def gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [batch.column(id_col), batch.column(col),
             pc.greater_equal(batch.column(col), pa.scalar(thr))],
            names=[id_col, col, "kept"],
        )

    return ds.map_batches(gate, batch_format="pyarrow")
