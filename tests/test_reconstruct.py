"""Reconstruction builder (reference io/reconstruction.py:136-501):
reading-order key, y-band dedup (D4), tables + fields sections."""

from __future__ import annotations

from horizon_ocr_python_ray.functions.reconstruct import (
    build_reconstruction,
    dedup_y_band,
    order_elements,
    reading_order_key,
)


def _el(text, page=0, x=10.0, y=100.0, kind="text", idx=0):
    return {"page": page, "bbox": [x, y, x + 8 * len(text), y + 28.0],
            "text": text, "kind": kind, "idx": idx}


def test_reading_order_key_bands():
    assert reading_order_key(0, [10, 49, 50, 60]) < reading_order_key(0, [5, 51, 40, 70])
    # same band → x decides
    assert reading_order_key(0, [5, 10, 40, 30]) < reading_order_key(0, [500, 12, 540, 32])
    # page dominates
    assert reading_order_key(0, [900, 1300, 950, 1320]) < reading_order_key(1, [0, 0, 10, 10])


def test_dedup_same_band_repeat():
    els = [_el("dup", y=100.0), _el("dup", x=400.0, y=110.0), _el("dup", y=300.0)]
    kept = dedup_y_band(order_elements(els))
    assert len(kept) == 2  # same text in band 2 dropped once, band 6 kept


def test_build_reconstruction_layout():
    els = [_el("Second line", y=160.0), _el("First line", y=100.0),
           _el("Page two line", page=1, y=100.0)]
    tables = {0: [{"table_idx": 0, "n_rows": 1, "n_cols": 2, "bbox": [0, 0, 1, 1],
                   "cells": [{"row": 0, "col": 0, "text": "a", "bbox": [], "confidence": 1.0},
                             {"row": 0, "col": 1, "text": "b", "bbox": [], "confidence": 1.0}]}]}

    class F:
        name, value, status = "total", "$5.00", "validated"

    md = build_reconstruction(els, tables, [F()])
    lines = md.splitlines()
    assert lines[0] == "# Document reconstruction"
    i_first = lines.index("[text] First line")
    i_second = lines.index("[text] Second line")
    i_p1 = lines.index("## Page 1")
    assert i_first < i_second < i_p1
    assert "| a | b |" in md
    assert "- total: $5.00 (validated)" in md
    # deterministic
    assert md == build_reconstruction(els, tables, [F()])


def test_pipeline_over_corpus(corpus_dir):
    from horizon_ocr_python_ray import read_pages
    from horizon_ocr_python_ray.stages.reconstruct_stage import build_reconstruction_pipeline

    df = build_reconstruction_pipeline(read_pages(corpus_dir)).to_pandas()
    assert len(df) > 0
    assert (df["n_elements"] > 0).all()
    assert (df["n_tables"] > 0).any()
    assert (df["n_fields"] > 0).any()
    assert df["reconstruction"].str.startswith("# Document reconstruction").all()
