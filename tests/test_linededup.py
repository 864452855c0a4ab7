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
