"""Size-aware join planner (pipelines/analytics.py): broadcast and
partitioned plans must agree row-for-row, and the auto switch must pick
by measured parquet size."""

from __future__ import annotations

import pandas as pd
import pytest

from horizon_ocr_python_ray.pipelines import analytics

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    return df.sort_values(df.columns.tolist()).reset_index(drop=True)


@pytest.mark.parametrize("fn,sort_col", [
    (analytics.revenue_by_nation, "n_name"),
    (analytics.orders_per_customer_join, "c_mktsegment"),
    (analytics.revenue_by_region_q5, "r_name"),
    (analytics.promo_revenue_q14, "n_items"),
    (analytics.priority_lines_q12, "l_returnflag"),
    (analytics.cust_order_dist_q13, "c_count"),
])
def test_plans_agree(ray_session, fn, sort_col):
    a = _df(fn(SF, plan="broadcast"))
    # num_partitions=2: the hash-shuffle join spawns one aggregator actor
    # per partition, and the 4-cpu test session can't host 8.
    b = _df(fn(SF, plan="partitioned", num_partitions=2))
    assert list(a.columns) == list(b.columns)
    # float sums may differ by partial-order ulps; compare exact ints and
    # near-exact floats the same way the driver compare does post-e2.
    for c in a.columns:
        if a[c].dtype.kind == "f":
            assert (a[c] - b[c]).abs().max() < 1e-6 * (1 + b[c].abs().max())
        else:
            assert a[c].tolist() == b[c].tolist(), c


def test_auto_resolves_by_size():
    assert analytics._resolve_join_plan("auto", SF, ["customer"]) == "broadcast"
    old = analytics.BROADCAST_BUILD_MAX_ROWS
    try:
        analytics.BROADCAST_BUILD_MAX_ROWS = 0
        assert analytics._resolve_join_plan("auto", SF, ["customer"]) == "partitioned"
    finally:
        analytics.BROADCAST_BUILD_MAX_ROWS = old
    assert analytics._resolve_join_plan("partitioned", SF, ["customer"]) == "partitioned"
