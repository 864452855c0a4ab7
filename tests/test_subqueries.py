"""Decorrelated-subquery pipelines (pipelines/subqueries.py): the
broadcast and partitioned plans of each op must agree row-for-row
(same contract as tests/test_analytics_plans.py), and the exactness
rewrites (rational-average clearing, int64 fixed point) must hold on
hand-built cases."""

from __future__ import annotations

import pandas as pd
import pytest

from horizon_ocr_python_ray.pipelines import subqueries

SF = "/root/testdata/sf0.001"


def _df(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    return df.sort_values(df.columns.tolist()).reset_index(drop=True)


@pytest.mark.parametrize("fn", [
    subqueries.orders_exists_q4,
    subqueries.top_supplier_q15,
    subqueries.part_small_qty_q17,
    subqueries.big_orders_q18,
    subqueries.cust_idle_q22,
    subqueries.waiting_supplier_q21,
    subqueries.returned_top_customers_q10,
    subqueries.disjunctive_revenue_q19,
    subqueries.market_share_q8,
    subqueries.nation_volume_q7,
    subqueries.nation_profit_q9,
    subqueries.min_cost_supplier_q2,
])
def test_plans_agree(ray_session, fn):
    a = _df(fn(SF, plan="broadcast"))
    # num_partitions=2: one aggregator actor per partition; the 4-cpu
    # test session can't host 8.
    b = _df(fn(SF, plan="partitioned", num_partitions=2))
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert a[c].tolist() == b[c].tolist(), c


def test_q4_semi_join_counts_each_order_once(ray_session):
    """EXISTS must not multiply-count orders with several returned
    lines: total order_count ≤ orders in the window."""
    out = _df(subqueries.orders_exists_q4(SF))
    assert out["order_count"].sum() > 0
    import pyarrow.parquet as pq

    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderdate"])
    df = orders.to_pandas()
    window = ((df["o_orderdate"] >= "1996-01-01")
              & (df["o_orderdate"] < "1997-01-01")).sum()
    assert out["order_count"].sum() <= window


def test_q15_single_exact_max(ray_session):
    out = _df(subqueries.top_supplier_q15(SF))
    assert len(out) >= 1
    assert out["total_revenue_e4"].nunique() == 1  # all rows share the max


def test_q17_integer_rewrite_matches_float_semantics(ray_session):
    """5·qty_e2·n < sum_e2 must equal qty < 0.2·avg on the real data."""
    import numpy as np
    import pyarrow.parquet as pq

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_quantity", "l_extendedprice"]).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    keys = set(part.loc[part["p_brand"] == "Brand#1", "p_partkey"])
    sub = li[li["l_partkey"].isin(keys)].copy()
    avg = sub.groupby("l_partkey")["l_quantity"].transform("mean")
    expect_n = int((sub["l_quantity"] < 0.2 * avg).sum())
    out = _df(subqueries.part_small_qty_q17(SF))
    assert int(out["n_lines"].iloc[0]) == expect_n


def test_q18_threshold_filters(ray_session):
    out = _df(subqueries.big_orders_q18(SF))
    assert (out["sum_qty_e2"] > 30000).all()
    assert out["o_orderkey"].is_unique


def test_q21_sole_problem_supplier_semantics(ray_session):
    """Brute-force replay: an order counts for supplier s iff s is the
    ONLY supplier with a returned line and the order has ≥2 suppliers
    and status 'F'."""
    import pyarrow.parquet as pq

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey", "l_returnflag"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_orderstatus"]).to_pandas()
    fset = set(orders.loc[orders.o_orderstatus == "F", "o_orderkey"])
    li = li[li.l_orderkey.isin(fset)]
    wins: dict[int, int] = {}
    for ok, g in li.groupby("l_orderkey"):
        supps = set(g.l_suppkey)
        prob = set(g.loc[g.l_returnflag == "R", "l_suppkey"])
        if len(prob) == 1 and len(supps) >= 2:
            s = next(iter(prob))
            wins[s] = wins.get(s, 0) + 1
    sup = pq.read_table(f"{SF}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()
    name = dict(zip(sup.s_suppkey, sup.s_name))
    want = sorted(((wins[s], name[s]) for s in wins),
                  key=lambda t: (-t[0], t[1]))[:10]
    out = subqueries.waiting_supplier_q21(SF)
    got = list(zip(out.numwait, out.s_name))
    assert got == want


def test_q10_revenue_is_exact_integer(ray_session):
    out = subqueries.returned_top_customers_q10(SF)
    assert len(out) <= 20
    assert out.revenue_e4.dtype.kind == "i"
    # sorted by (revenue desc, custkey asc)
    assert (out.revenue_e4.is_monotonic_decreasing
            or len(out.revenue_e4.unique()) < len(out))
    pairs = list(zip(-out.revenue_e4, out.c_custkey))
    assert pairs == sorted(pairs)


def test_q2_all_min_ties_kept(ray_session):
    import pyarrow.parquet as pq

    out = subqueries.min_cost_supplier_q2(SF)
    # every (partkey) group shares ONE cost (its min) and every
    # supplier achieving it appears
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_type", "p_size"]).to_pandas()
    keys = set(part.loc[(part.p_type == "ECONOMY") & (part.p_size < 15),
                        "p_partkey"])
    sub = li[li.l_partkey.isin(keys)].copy()
    sub["c"] = (sub.l_extendedprice * 100).round().astype("int64")
    mins = sub.groupby("l_partkey")["c"].min()
    for pk, g in out.groupby("l_partkey"):
        assert (g.cost_e2 == mins[pk]).all()
        want = set(sub.loc[(sub.l_partkey == pk) & (sub.c == mins[pk]),
                           "l_suppkey"])
        assert set(g.s_suppkey) == want


def test_q8_share_bounded(ray_session):
    out = subqueries.market_share_q8(SF).to_pandas()
    assert (out.num_e4 <= out.den_e4).all()
    assert (out.num_e4 >= 0).all() and (out.den_e4 > 0).all()


def test_fullouter_union_keeps_either_side(ray_session):
    import pyarrow.parquet as pq

    out = _df(subqueries.cust_year_orders_fullouter(SF))
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]).to_pandas()
    y1 = orders[(orders.o_orderdate >= "1996-01-01")
                & (orders.o_orderdate < "1997-01-01")]
    y2 = orders[(orders.o_orderdate >= "1997-01-01")
                & (orders.o_orderdate < "1998-01-01")]
    want_keys = set(y1.o_custkey) | set(y2.o_custkey)
    assert set(out.c_custkey) == want_keys
    m = out.set_index("c_custkey")
    c1, c2 = y1.groupby("o_custkey").size(), y2.groupby("o_custkey").size()
    for k in list(want_keys)[:50]:
        assert m.loc[k, "n_y1"] == c1.get(k, 0)
        assert m.loc[k, "n_y2"] == c2.get(k, 0)
    # either-side-only customers exist and carry a zero
    assert ((m.n_y1 == 0) | (m.n_y2 == 0)).any()


def test_q22_buckets_cover_output(ray_session):
    out = _df(subqueries.cust_idle_q22(SF))
    assert set(out["cgroup"]) <= set(range(8))
    assert (out["n_cust"] > 0).all()
