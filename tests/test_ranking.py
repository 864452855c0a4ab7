"""Global rank (sort-free) + integer TF-IDF retrieval + running totals."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horizon_ocr_python_ray.stages.ranking import doc_global_rank, tfidf_topk
from horizon_ocr_python_ray.stages.window import events_cumsum


def _docs():
    rows = [
        (1, "a b c d"),        # 4 tokens
        (2, "a b"),            # 2
        (3, "x y z w"),        # 4 (tie with 1 → doc_id breaks)
        (4, ""),               # 0
        (5, "a a a"),          # 3
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


def test_global_rank_total_order(ray_session):
    import ray.data

    out = (doc_global_rank(ray.data.from_arrow(_docs()))
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert out.doc_id.tolist() == [1, 3, 5, 2, 4]
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]
    assert out.n_tokens.tolist() == [4, 4, 3, 2, 0]


def test_global_rank_sharding_invariant(ray_session):
    import ray.data

    one = (doc_global_rank(ray.data.from_arrow(_docs()))
           .to_pandas().sort_values("doc_id"))
    many = (doc_global_rank(ray.data.from_arrow(_docs()).repartition(4))
            .to_pandas().sort_values("doc_id"))
    assert one["rank"].tolist() == many["rank"].tolist()


def test_tfidf_query_is_top_df_and_scores_exact(ray_session):
    import ray.data

    # df: a→3 docs, b→2, c/d/x/y/z/w→1 → query = (a, b, c) by (df desc, term)
    out = tfidf_topk(ray.data.from_arrow(_docs()), n_query=3, k=10).to_pandas()
    n = 5
    idf_a, idf_b, idf_c = (n * 10**6) // 3, (n * 10**6) // 2, (n * 10**6) // 1
    want = {
        1: idf_a + idf_b + idf_c,   # "a b c d"
        2: idf_a + idf_b,           # "a b"
        5: 3 * idf_a,               # "a a a"
    }
    got = dict(zip(out.doc_id, out.score_e6))
    assert got == want
    # ordering: (score desc, doc_id asc)
    pairs = list(zip(-out.score_e6, out.doc_id))
    assert pairs == sorted(pairs)


def test_and_search_requires_all_terms(ray_session):
    import ray.data

    from horizon_ocr_python_ray.stages.ranking import and_search

    out = and_search(ray.data.from_arrow(_docs()), n_query=2).to_pandas()
    # top-2 DF terms are (a: 3 docs, b: 2) → only docs with BOTH a and b
    assert sorted(out.doc_id) == [1, 2]
    assert dict(zip(out.doc_id, out.n_tokens)) == {1: 4, 2: 2}


def test_events_gapfill_dense_and_zero_filled(ray_session):
    import ray.data

    from horizon_ocr_python_ray.stages.window import events_gapfill

    H = 3_600_000_000
    t = pa.table({
        "event_type": pa.array(["a", "a", "b"], pa.string()),
        # hours 0, 2 for a; hour 1 for b → spine hours {0,1,2} × {a,b}
        "ts": pa.array([10, 2 * H + 5, H + 7], pa.timestamp("us")),
    })
    out = (events_gapfill(ray.data.from_arrow(t))
           .to_pandas().sort_values(["event_type", "window_start_us"])
           .reset_index(drop=True))
    assert len(out) == 6
    assert out.n_events.tolist() == [1, 0, 1, 0, 1, 0]
    assert out.window_start_us.tolist() == [0, H, 2 * H] * 2


def test_events_anomaly_flags_spike_on_constant_history(ray_session):
    import ray.data

    from horizon_ocr_python_ray.stages.window import events_anomaly

    H = 3_600_000_000
    # 24 hours of exactly 2 events, then a spike hour of 10 and a calm
    # hour of 2 → the spike flags (zero-variance history), the calm
    # hour (history now has variance from the spike) evaluates exactly.
    rows = []
    for h in range(24):
        rows += [("a", h * H + 1), ("a", h * H + 2)]
    rows += [("a", 24 * H + i) for i in range(10)]
    rows += [("a", 25 * H + 1), ("a", 25 * H + 2)]
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    out = (events_anomaly(ray.data.from_arrow(t))
           .to_pandas().sort_values("window_start_us").reset_index(drop=True))
    assert len(out) == 2  # only windows 24 and 25 have full history
    spike, calm = out.iloc[0], out.iloc[1]
    assert spike.n_events == 10 and bool(spike.is_anomaly)
    assert spike.var_num == 0 and spike.dev24 == 24 * 10 - 48
    # calm hour: trail = 23×2 + 1×10 = 56; dev = 48-56 = -8;
    # var_num = 24·(23·4+100) − 56² = 24·192 − 3136 = 1472; 64 < 9·1472
    assert calm.dev24 == -8 and calm.var_num == 1472
    assert not bool(calm.is_anomaly)


def test_events_cumsum_segmented(ray_session):
    import ray.data

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 8, 7, 8], pa.int64()),
        "ts": pa.array([100, 200, 150, 300, 50], pa.timestamp("us")),
        "value": pa.array([1.0, 2.5, 10.0, 0.5, 4.0], pa.float64()),
    })
    out = (events_cumsum(ray.data.from_arrow(t))
           .to_pandas().sort_values(["user_id", "seq"]).reset_index(drop=True))
    u7 = out[out.user_id == 7]
    assert u7.event_id.tolist() == [1, 2, 4]
    assert u7.cum_value_e2.tolist() == [100, 350, 400]
    u8 = out[out.user_id == 8]
    assert u8.event_id.tolist() == [5, 3]  # ts order: 50 then 150
    assert u8.cum_value_e2.tolist() == [400, 1400]
    assert u8.seq.tolist() == [1, 2]
