"""Eval-set decontamination (stages/decontam.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages import decontam
from horizon_ocr_python_ray.stages.decontam import decontaminate, doc_ngrams


def test_doc_ngrams_basic():
    assert doc_ngrams("The quick  Brown fox", 2) == {
        "the quick", "quick brown", "brown fox"}
    assert doc_ngrams("one two", 3) == set()
    assert doc_ngrams("", 2) == set()
    # distinct: repeated gram appears once
    assert doc_ngrams("a b a b a", 2) == {"a b", "b a"}


def test_decontaminate_flags_shared_grams():
    ev = ray.data.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["held out secret eval passage here"],
    }))
    train = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "totally unrelated training text sample",
            "contains the secret eval passage here verbatim plus more",
            "secret eval passage appears but shifted secret eval passage here",
        ],
    })).repartition(2)
    out = decontaminate(train, ev, n=4).to_pandas().sort_values("doc_id")
    # doc 2 shares "secret eval passage here" and "eval passage here verbatim"?
    # eval grams (n=4): {held out secret eval, out secret eval passage,
    #                    secret eval passage here}
    got = dict(zip(out.doc_id, out.matched_grams))
    assert got == {2: 1, 3: 1}  # both share exactly "secret eval passage here"


def test_decontaminate_excludes_clean_docs():
    ev = ray.data.from_arrow(pa.table({"doc_id": [9], "text": ["w x y z"]}))
    train = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["a b c d"]}))
    ds = decontaminate(train, ev, n=4)
    assert ds.schema().names == ["doc_id", "matched_grams"]
    assert ds.count() == 0


def test_eval_gram_cap(monkeypatch):
    monkeypatch.setattr(decontam, "EVAL_GRAM_MAX", 2)
    ev = ray.data.from_arrow(pa.table({
        "doc_id": [1], "text": ["a b c d e f g h"]}))
    with pytest.raises(ValueError, match="not a small side"):
        decontam.eval_gram_ref(ev, n=2)
