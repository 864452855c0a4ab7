"""SemDeDup composite, class rebalancing, leakage-safe split."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from horizon_ocr_python_ray.stages.kmeans import emb_semdedup
from horizon_ocr_python_ray.stages.sampling import (
    _md5_low64,
    mix_rebalance,
    safe_split,
)


def test_semdedup_marks_larger_id_of_near_identical_pair(ray_session):
    import ray.data

    rng = np.random.RandomState(7)
    base = rng.randn(6, 8)
    # rows 10 and 11 nearly identical; row 12 identical to 10
    emb = np.vstack([base, base[0] + 1e-4, base[0]])
    ids = list(range(1, 7)) + [11, 12]
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float64())),
    })
    out = (emb_semdedup(ray.data.from_arrow(t), k=2, threshold=0.95)
           .to_pandas().set_index("vec_id"))
    assert len(out) == 8
    # vec 1 is the smallest id of its near-identical family → kept
    assert not out.loc[1, "is_dup"]
    assert out.loc[11, "is_dup"] and out.loc[12, "is_dup"]
    # a cluster-mate counts only if SAME cluster
    assert out.loc[11, "cluster"] == out.loc[1, "cluster"]


def test_semdedup_sharding_invariant(ray_session):
    import ray.data

    rng = np.random.RandomState(3)
    emb = rng.randn(40, 8)
    t = pa.table({
        "vec_id": pa.array(list(range(40)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float64())),
    })
    one = (emb_semdedup(ray.data.from_arrow(t), k=4)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    many = (emb_semdedup(ray.data.from_arrow(t).repartition(5), k=4)
            .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert one.equals(many)


def test_mix_rebalance_equal_quota(ray_session):
    import ray.data

    t = pa.table({
        "doc_id": pa.array(list(range(30)), pa.int64()),
        "lang": pa.array(["en"] * 20 + ["de"] * 7 + ["fr"] * 3, pa.string()),
    })
    out = mix_rebalance(ray.data.from_arrow(t)).to_pandas()
    sizes = out.groupby("lang").size()
    assert dict(sizes) == {"en": 3, "de": 3, "fr": 3}
    # selection is the hash-order min-k within each stratum
    for lang, g in out.groupby("lang"):
        pool = t.to_pandas().query("lang == @lang")
        want = sorted(pool.doc_id, key=lambda d: (_md5_low64(str(d)), d))[:3]
        assert sorted(g.doc_id) == sorted(want)


def test_safe_split_groups_never_straddle(ray_session):
    import ray.data

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    t = pa.table({
        "doc_id": pa.array(list(range(1, 7)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = safe_split(ray.data.from_arrow(t), eval_permille=500).to_pandas()
    assert len(out) == 6
    # all members of a content group share rep and split
    for _, g in out.groupby("content_md5"):
        assert g.group_rep.nunique() == 1
        assert g.split.nunique() == 1
        assert g.group_rep.iloc[0] == g.doc_id.min()
