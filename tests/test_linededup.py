"""Boilerplate line removal (stages/linededup.py)."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages import linededup
from horizon_ocr_python_ray.stages.linededup import boilerplate_line_dedup


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "url": [r[0] for r in rows],
        "extracted_text": [r[1] for r in rows],
    })).repartition(2)


def test_drops_repeated_lines_keeps_order():
    ds = _ds([
        ("a", "unique alpha\nfooter\nbody a"),
        ("b", "footer\nbody b"),
        ("c", "body c\nfooter"),
        ("d", ""),  # empty text: skipped entirely
    ])
    out = (boilerplate_line_dedup(ds, min_df=3).to_pandas()
           .set_index("url").sort_index())
    assert list(out.index) == ["a", "b", "c"]
    assert out.loc["a", "n_dropped"] == 1 and out.loc["a", "n_kept"] == 2
    assert out.loc["a", "kept_md5"] == hashlib.md5(
        b"unique alpha\nbody a").hexdigest()
    # every doc lost exactly the one "footer" line
    assert (out["n_dropped"] == 1).all()


def test_threshold_respected():
    ds = _ds([("a", "twice\nx"), ("b", "twice\ny"), ("c", "z")])
    out = boilerplate_line_dedup(ds, min_df=3).to_pandas()
    assert (out["n_dropped"] == 0).all()  # df("twice") == 2 < 3
    out2 = boilerplate_line_dedup(ds, min_df=2).to_pandas().set_index("url")
    assert out2.loc["a", "n_dropped"] == 1
    assert out2.loc["b", "n_dropped"] == 1


def test_duplicate_line_within_one_doc_counts_once():
    # "rep" appears twice inside doc a but only 1 distinct doc → df=1
    ds = _ds([("a", "rep\nmid\nrep"), ("b", "other")])
    out = boilerplate_line_dedup(ds, min_df=2).to_pandas()
    assert (out["n_dropped"] == 0).all()


def test_empty_lines_never_dropped():
    ds = _ds([("a", "x\n\ny"), ("b", "p\n\nq"), ("c", "m\n\nn")])
    out = boilerplate_line_dedup(ds, min_df=2).to_pandas()
    assert (out["n_kept"] == 3).all()  # the blank line survives in all


def test_plans_agree():
    ds = _ds([
        ("a", "unique alpha\nfooter\nbody a"),
        ("b", "footer\nbody b"),
        ("c", "body c\nfooter"),
    ])
    auto = (boilerplate_line_dedup(ds, min_df=3, plan="auto").to_pandas()
            .sort_values("url").reset_index(drop=True))
    shuf = (boilerplate_line_dedup(ds, min_df=3, plan="shuffle").to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert auto.equals(shuf)


def test_auto_falls_back_to_shuffle_on_fold_overflow(monkeypatch):
    monkeypatch.setattr(linededup, "DRIVER_FOLD_LINE_MAX", 1)
    ds = _ds([("a", "l1\nl2\nl3"), ("b", "l1\nx"), ("c", "l1\ny")])
    out = boilerplate_line_dedup(ds, min_df=3, plan="auto").to_pandas()
    assert out.set_index("url").loc["a", "n_dropped"] == 1  # "l1" dropped


def test_drop_set_cap(monkeypatch):
    monkeypatch.setattr(linededup, "DROP_SET_MAX", 1)
    ds = _ds([("a", "l1\nl2"), ("b", "l1\nl2"), ("c", "l1\nl2")])
    with pytest.raises(ValueError, match="drop-set exceeds"):
        boilerplate_line_dedup(ds, min_df=2).to_pandas()


def test_hash64_repr_matches_strings_repr(ray_session):
    ds = _ds([
        ("a", "unique alpha\nfooter\nbody a\n\nx"),
        ("b", "footer\nbody b\n"),
        ("c", "body c\nfooter"),
        ("d", ""),
        ("e", "footer\nfooter\nonly footer doc"),
    ])
    key = "url"
    s = (boilerplate_line_dedup(ds, min_df=3, drop_repr="strings")
         .to_pandas().sort_values(key).reset_index(drop=True))
    h = (boilerplate_line_dedup(ds, min_df=3, drop_repr="hash64")
         .to_pandas().sort_values(key).reset_index(drop=True))
    assert s.equals(h)
    assert (s.loc[s.url != "a", "n_dropped"] > 0).any()


def test_hash64_repr_on_real_corpus(ray_session, corpus_dir):
    from horizon_ocr_python_ray import build_extract_pipeline, read_pages

    docs = build_extract_pipeline(read_pages(corpus_dir)).select_columns(
        ["url", "extracted_text"]).materialize()
    key = "url"
    s = (boilerplate_line_dedup(docs, min_df=5, drop_repr="strings")
         .to_pandas().sort_values(key).reset_index(drop=True))
    h = (boilerplate_line_dedup(docs, min_df=5, drop_repr="hash64")
         .to_pandas().sort_values(key).reset_index(drop=True))
    assert len(s) > 0
    assert s.equals(h)


def test_hash64_no_boilerplate_is_noop(ray_session):
    ds = _ds([("a", "x\ny"), ("b", "p\nq")])
    out = boilerplate_line_dedup(ds, min_df=2, drop_repr="hash64").to_pandas()
    assert (out.n_dropped == 0).all()


def test_unknown_drop_repr_raises():
    with pytest.raises(ValueError, match="drop_repr"):
        boilerplate_line_dedup(_ds([("a", "x")]), drop_repr="bogus")


def test_hash_cap_enforced(ray_session, monkeypatch):
    monkeypatch.setattr(linededup, "DROP_HASH_MAX", 0)
    ds = _ds([("a", "footer\nx"), ("b", "footer\ny"), ("c", "footer")])
    with pytest.raises(ValueError, match="DROP_HASH_MAX"):
        boilerplate_line_dedup(ds, min_df=2, drop_repr="hash64").to_pandas()
