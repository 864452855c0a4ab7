"""Exact n-gram Jaccard all-pairs (stages/jaccard.py): prefix-filtered
plan vs a naive all-pairs reference."""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages.jaccard import (
    _md5_shingle_set,
    _prefix_len,
    jaccard_near_dup_pairs,
)


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
    })).repartition(3)


def _naive(rows, k=5, thr_num=1, thr_den=2):
    sets = {d: _md5_shingle_set(t, k) for d, t in rows}
    out = set()
    for (a, sa), (b, sb) in itertools.combinations(
            sorted(sets.items()), 2):
        inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
        union = int(sa.size + sb.size - inter)
        if union > 0 and thr_den * inter >= thr_num * union:
            out.add((a, b, inter, union))
    return out


def _run(rows, **kw):
    got = jaccard_near_dup_pairs(_docs(rows), **kw).to_pandas()
    if got.empty:  # Ray to_pandas drops columns on all-empty blocks
        return set()
    return {tuple(int(v) for v in r)
            for r in got[["doc_a", "doc_b", "n_inter", "n_union"]]
            .itertuples(index=False, name=None)}


WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliet kilo lima mike november oscar papa").split()


def _synth(n_docs=30, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for d in range(1, n_docs + 1):
        toks = rng.choice(WORDS, size=rng.integers(8, 20)).tolist()
        rows.append((d, " ".join(toks)))
    # planted near-dups: copy with a small tail edit
    base = rows[0][1]
    rows.append((100, base + " zulu"))
    rows.append((101, rows[1][1]))  # exact dup of doc 2
    return rows


def test_matches_naive_all_pairs():
    rows = _synth()
    assert _run(rows) == _naive(rows)


def test_exact_dup_pair_has_jaccard_one():
    rows = _synth()
    got = _run(rows)
    exact = [(a, b, i, u) for (a, b, i, u) in got
             if (a, b) == (2, 101)]
    assert len(exact) == 1
    _, _, inter, union = exact[0]
    assert inter == union  # identical sets


def test_threshold_is_integer_exact():
    # two docs engineered to share exactly half their union
    a = "one two three four five six seven eight nine"      # 5 grams
    b = "one two three four five sixx seven eight nine ten"  # 6 grams
    rows = [(1, a), (2, b)]
    sa, sb = _md5_shingle_set(a, 5), _md5_shingle_set(b, 5)
    inter = np.intersect1d(sa, sb).size
    union = sa.size + sb.size - inter
    got = _run(rows, thr_num=inter, thr_den=union)  # τ == exact J
    assert (1, 2, inter, union) in got
    assert _run(rows, thr_num=inter + 1, thr_den=union) == set()


def test_short_docs_never_pair():
    rows = [(1, "tiny doc"), (2, "tiny doc"), (3, "x")]
    assert _run(rows) == set()


def test_prefix_len_bounds():
    n = np.array([1, 2, 3, 10, 11])
    lp = _prefix_len(n, 1, 2)
    assert (lp >= 1).all() and (lp <= n).all()
    # τ=1 (exact dup): prefix collapses to a single gram
    assert (_prefix_len(n, 1, 1) == 1).all()


def test_distributed_verify_plan_is_row_identical():
    rows = _synth(n_docs=15, seed=9)
    assert (_run(rows, verify_plan="distributed")
            == _run(rows, verify_plan="broadcast"))


def test_auto_plan_caps_candidate_collect(monkeypatch):
    """A dup-heavy corpus past PAIR_COLLECT_MAX_ROWS must route to the
    distributed verify (never a full driver collect) with identical
    pairs; an explicit broadcast plan refuses loudly."""
    from horizon_ocr_python_ray.stages import jaccard as jmod

    # every doc duplicates one of 3 base texts → dense candidate set
    base = _synth(n_docs=3, seed=5)[:3]
    rows = [(i + 1, base[i % 3][1]) for i in range(24)]
    monkeypatch.setattr(jmod, "PAIR_COLLECT_MAX_ROWS", 0)
    assert _run(rows, verify_plan="auto") == _naive(rows)
    with pytest.raises(ValueError, match="PAIR_COLLECT_MAX_ROWS"):
        _run(rows, verify_plan="broadcast")


def test_df_plan_parity_and_refusal(monkeypatch):
    """The broadcast-df (2-exchange) and bucketed (3-exchange) plans
    must produce identical pairs; past the gram cap auto falls back to
    the bucketed plan with identical output and broadcast refuses."""
    from horizon_ocr_python_ray.stages import jaccard as jmod

    rows = _synth(n_docs=25, seed=11)
    want = _naive(rows)
    assert _run(rows, df_plan="broadcast") == want
    assert _run(rows, df_plan="exchange") == want
    monkeypatch.setattr(jmod, "DF_BROADCAST_MAX_GRAMS", 0)
    assert _run(rows, df_plan="auto") == want
    with pytest.raises(ValueError, match="DF_BROADCAST_MAX_GRAMS"):
        _run(rows, df_plan="broadcast")
