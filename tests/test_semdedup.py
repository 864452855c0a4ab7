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


def test_dup_mask_blocked_equals_dense():
    from horizon_ocr_python_ray.stages.ann import _normalize
    from horizon_ocr_python_ray.stages.kmeans import _dup_mask_blocked

    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    # plant near-dups: rows 13/14/15 copy row 2 with small noise
    for r in (13, 14, 15):
        base[r] = base[2] + rng.normal(scale=1e-3, size=16)
    n = _normalize(base)
    dense = np.tril(n @ n.T >= 0.8, k=-1).any(axis=1)
    for block in (1, 2, 3, 7, 39, 40, 4096):
        got = _dup_mask_blocked(n, 0.8, block)
        assert (got == dense).all(), block


def test_semdedup_blocked_scan_identical_under_skew(ray_session):
    import ray.data

    # one dominant cluster: 90% of vectors huddle around a single point
    rng = np.random.default_rng(5)
    hub = rng.normal(size=24)
    embs = [hub + rng.normal(scale=0.05, size=24) for _ in range(90)]
    embs += [rng.normal(size=24) for _ in range(10)]
    t = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in embs],
                              pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    key = lambda rows: sorted((r["vec_id"], r["cluster"], r["is_dup"]) for r in rows)
    dense_like = key(emb_semdedup(ds, k=4, threshold=0.9,
                                  scan_block=1 << 20).take_all())
    tiled = key(emb_semdedup(ds, k=4, threshold=0.9, scan_block=8).take_all())
    assert tiled == dense_like
    assert any(d for _, _, d in tiled)  # the hub really produces dups


def test_semdedup_auto_k_rule():
    from horizon_ocr_python_ray.stages.kmeans import (
        SEMDEDUP_TARGET_CLUSTER_ROWS, semdedup_auto_k)

    assert semdedup_auto_k(100) == 8                      # floor
    assert semdedup_auto_k(10**6) == -(-10**6 // SEMDEDUP_TARGET_CLUSTER_ROWS)
    assert semdedup_auto_k(10**12) == 1 << 16             # ceiling
