"""Grouped mode (stages/skew.py:host_lang_mode) and corpus-rank
fluency scoring (stages/topterms.py:doc_mean_rank)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from horizon_ocr_python_ray.stages.skew import host_lang_mode
from horizon_ocr_python_ray.stages.topterms import (
    build_rank_table,
    doc_mean_rank,
)


def _pages(rows):
    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_mode_tie_breaks_to_smallest_lang(ray_session):
    ds = _pages([
        ("https://a.com/1", "en"), ("https://a.com/2", "de"),
        ("https://a.com/3", "de"), ("https://a.com/4", "en"),
        ("https://b.com/1", "fr"),
    ])
    out = {r["host"]: (r["top_lang"], r["n_top"], r["n_langs"])
           for r in host_lang_mode(ds).take_all()}
    assert out["a.com"] == ("de", 2, 2)   # 2-2 tie → 'de' < 'en'
    assert out["b.com"] == ("fr", 1, 1)


def test_mode_reshard_stable(ray_session):
    rows = [(f"https://h{i % 3}.com/{i}", ["en", "de", "fr"][i % 2])
            for i in range(40)]
    a = sorted(map(tuple, (r.values() for r in host_lang_mode(_pages(rows)).take_all())))
    b = sorted(map(tuple, (r.values() for r in host_lang_mode(
        _pages(rows).repartition(5)).take_all())))
    assert a == b


def _docs(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_rank_table_order(ray_session):
    tbl = build_rank_table(_docs(["b b b a a c", "a b"]))
    ranks = dict(zip(tbl.column("term").to_pylist(),
                     tbl.column("rank").to_pylist()))
    # b: 4 occurrences, a: 3, c: 1
    assert ranks == {"b": 1, "a": 2, "c": 3}


def test_mean_rank_scores(ray_session):
    out = {r["doc_id"]: (r["n_tokens"], r["rank_sum"])
           for r in doc_mean_rank(_docs(["b b b a a c", "a b", ""])).take_all()}
    assert out[0] == (6, 3 * 1 + 2 * 2 + 3)   # 3·rank(b) + 2·rank(a) + rank(c)
    assert out[1] == (2, 2 + 1)
    assert out[2] == (0, 0)                   # empty doc → zero, not missing


def test_vocab_guard_raises(ray_session, monkeypatch):
    import horizon_ocr_python_ray.stages.topterms as tt

    monkeypatch.setattr(tt, "BROADCAST_VOCAB_MAX", 1)
    with pytest.raises(ValueError, match="broadcast bound"):
        build_rank_table(_docs(["a b c"]))
