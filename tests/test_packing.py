"""Sequence packing (stages/packing.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages.packing import _pack_shard, pack_documents


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(texts))), "text": texts}))


def _words(n):
    return " ".join("w" for _ in range(n))


def test_next_fit_rule():
    import pandas as pd

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                       "shard": [0] * 5,
                       "n_tokens": [100, 100, 100, 300, 10]})
    out = _pack_shard(df, budget=256)
    assert list(out.bin_idx) == [0, 0, 1, 2, 3]
    assert list(out.offset_tokens) == [0, 100, 0, 0, 0]
    # oversized doc 4 (300 > 256) sits in its own bin; doc 5 opens a new
    # one because 300 + 10 > 256


def test_zero_token_docs_pack_in_place():
    import pandas as pd

    df = pd.DataFrame({"doc_id": [1, 2, 3], "shard": [0] * 3,
                       "n_tokens": [256, 0, 1]})
    out = _pack_shard(df, budget=256)
    # the empty doc fits (acc + 0 == 256, not >), the next one overflows
    assert list(out.bin_idx) == [0, 0, 1]
    assert list(out.offset_tokens) == [0, 256, 0]


def test_dataset_invariants():
    ds = _ds([_words(n) for n in (50, 200, 90, 260, 10, 10, 10)])
    out = pack_documents(ds, budget=256, n_shards=2).to_pandas()
    assert len(out) == 7
    # every doc appears once, offsets stay within budget unless the doc
    # itself is oversized
    assert sorted(out.doc_id) == list(range(7))
    over = out[out.n_tokens <= 256]
    assert ((over.offset_tokens + over.n_tokens) <= 256).all()
    # bins are dense per shard: 0..max without gaps
    for _, grp in out.groupby("shard"):
        assert set(grp.bin_idx) == set(range(grp.bin_idx.max() + 1))


def test_stable_under_repartition():
    ds1 = _ds([_words(n) for n in (50, 200, 90, 260, 10)])
    a = (pack_documents(ds1, budget=128, n_shards=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    ds2 = _ds([_words(n) for n in (50, 200, 90, 260, 10)]).repartition(4)
    b = (pack_documents(ds2, budget=128, n_shards=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)


def test_bad_params_raise():
    with pytest.raises(ValueError):
        pack_documents(_ds(["a"]), budget=0)
