"""Incremental cross-corpus near-dup (stages/incdedup.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages import incdedup
from horizon_ocr_python_ray.stages.incdedup import incremental_near_dup


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
    }))


BASE_TEXT = "alpha beta gamma delta epsilon zeta eta theta"


def test_exact_duplicate_found():
    base = _ds([(1, BASE_TEXT), (2, "totally different words here now ok")])
    new = _ds([(100, BASE_TEXT)])
    out = incremental_near_dup(base, new, k_shingle=5, threshold=0.5).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.base_id, r.new_id) == (1, 100)
    assert r.n_inter == r.n_union  # identical shingle sets


def test_threshold_excludes_weak_overlap():
    # shares one 5-gram only → jaccard well below 0.5
    base = _ds([(1, BASE_TEXT + " tail one two three four five six")])
    new = _ds([(100, BASE_TEXT)])
    # jaccard = 4/11 ≈ 0.36: above 0.3, below 0.5
    out = incremental_near_dup(base, new, threshold=0.5).to_pandas()
    assert len(out) == 0
    out2 = incremental_near_dup(base, new, threshold=0.3).to_pandas()
    assert len(out2) == 1
    assert (out2.iloc[0].n_inter, out2.iloc[0].n_union) == (4, 11)


def test_no_cross_side_self_pairs():
    # identical docs WITHIN the base side are never paired
    base = _ds([(1, BASE_TEXT), (2, BASE_TEXT)])
    new = _ds([(100, "unrelated content entirely with more words")])
    out = incremental_near_dup(base, new).to_pandas()
    assert len(out) == 0


def test_new_side_cap(monkeypatch):
    monkeypatch.setattr(incdedup, "NEW_SIDE_MAX_POSTINGS", 2)
    base = _ds([(1, BASE_TEXT)])
    new = _ds([(100, BASE_TEXT)])
    with pytest.raises(ValueError, match="not a small side"):
        incremental_near_dup(base, new).to_pandas()


def test_matches_bruteforce_on_random_corpus():
    """Inverted-index probe == brute-force cross join (recall 1)."""
    import itertools
    import random

    from horizon_ocr_python_ray.functions.minhash import (
        exact_jaccard,
        shingle_hashes,
    )

    rng = random.Random(5)
    vocab = [f"w{i}" for i in range(30)]
    base_rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(6, 30))))
                 for i in range(20)]
    new_rows = [(100 + i, " ".join(rng.choices(vocab, k=rng.randint(6, 30))))
                for i in range(5)]
    # plant one near-dup
    new_rows.append((200, base_rows[3][1] + " extra"))
    out = incremental_near_dup(_ds(base_rows), _ds(new_rows),
                               k_shingle=5, threshold=0.3).to_pandas()
    got = {(r.base_id, r.new_id) for r in out.itertuples()}
    want = set()
    for (bid, bt), (nid, nt) in itertools.product(base_rows, new_rows):
        if exact_jaccard(shingle_hashes(bt, 5), shingle_hashes(nt, 5)) >= 0.3:
            want.add((bid, nid))
    assert got == want
    assert (3, 200) in got
