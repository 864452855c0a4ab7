"""Repeated n-gram stats (stages/repgrams.py)."""

from __future__ import annotations

import pyarrow as pa
import ray

from horizon_ocr_python_ray.stages.repgrams import repeated_ngram_stats


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": [r[0] for r in rows],
        "text": [r[1] for r in rows],
    })).repartition(2)


def test_shared_grams_counted():
    shared = "alpha beta gamma delta"  # one 4-gram, present in both docs
    out = (repeated_ngram_stats(_ds([
        (1, shared + " tail1 t2 t3"),
        (2, "head1 h2 h3 " + shared),
        (3, "w1 w2 w3 w4 w5"),
    ]), n=4).to_pandas().set_index("doc_id").sort_index())
    assert out.loc[1, "n_repeated"] == 1
    assert out.loc[2, "n_repeated"] == 1
    assert out.loc[3, "n_repeated"] == 0
    assert out.loc[3, "n_grams"] == 2


def test_within_doc_repeat_not_cross_doc():
    # gram repeated twice INSIDE doc 1 only → df(distinct docs)=1 → unique
    out = (repeated_ngram_stats(_ds([
        (1, "a b c d x a b c d"),
        (2, "p q r s t"),
    ]), n=4).to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_repeated"] == 0


def test_identical_docs_fully_repeated():
    out = (repeated_ngram_stats(_ds([
        (1, "m n o p q"),
        (2, "m n o p q"),
    ]), n=4).to_pandas().set_index("doc_id"))
    assert (out["n_repeated"] == out["n_grams"]).all()
    assert out.loc[1, "n_grams"] == 2


def test_short_docs_excluded():
    out = repeated_ngram_stats(_ds([(1, "just three words"),
                                    (2, "a b c d e")]), n=4).to_pandas()
    assert list(out.doc_id) == [2]
