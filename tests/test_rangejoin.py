"""Interval join (stages/rangejoin.py) and substring-span dedup
(stages/substrdedup.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages.rangejoin import purchase_window_join
from horizon_ocr_python_ray.stages.substrdedup import substring_dedup

T0 = dt.datetime(2024, 1, 1)


def _events(rows):
    """rows: (event_id, minutes-after-T0, user_id, event_type, value)."""
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": [r[3] for r in rows],
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
    })).repartition(2)


def test_window_counts_and_sums():
    out = purchase_window_join(_events([
        (1, 0, 7, "view", 1.0),
        (2, 30, 7, "click", 2.5),
        (3, 59, 7, "purchase", 10.0),   # both priors inside the hour
        (4, 200, 7, "purchase", 5.0),   # window empty
    ])).to_pandas().set_index("purchase_id").sort_index()
    assert out.loc[3, "n_prior"] == 2
    assert out.loc[3, "sum_prior_e2"] == 350
    assert out.loc[4, "n_prior"] == 0 and out.loc[4, "sum_prior_e2"] == 0


def test_window_boundaries_strict():
    out = purchase_window_join(_events([
        (1, 0, 1, "view", 1.0),     # exactly ts-1h → INCLUDED (>=)
        (2, 60, 1, "purchase", 9.0),
        (3, 60, 1, "view", 4.0),    # equal ts → EXCLUDED (<)
    ])).to_pandas().set_index("purchase_id")
    assert out.loc[2, "n_prior"] == 1
    assert out.loc[2, "sum_prior_e2"] == 100


def test_users_do_not_leak_across_window():
    # user 2's events sit inside user 1's purchase window timewise
    out = purchase_window_join(_events([
        (1, 30, 2, "view", 3.0),
        (2, 40, 1, "purchase", 1.0),
        (3, 35, 1, "view", 7.0),
    ])).to_pandas().set_index("purchase_id")
    assert out.loc[2, "n_prior"] == 1
    assert out.loc[2, "sum_prior_e2"] == 700


def test_prior_purchases_count_as_events():
    out = purchase_window_join(_events([
        (1, 10, 5, "purchase", 2.0),
        (2, 20, 5, "purchase", 3.0),
    ])).to_pandas().set_index("purchase_id").sort_index()
    assert out.loc[1, "n_prior"] == 0
    assert out.loc[2, "n_prior"] == 1


def test_skewed_user_no_blowup():
    # one hot user with many events: output stays one row per purchase
    rows = [(i, i % 50, 9, "view", 1.0) for i in range(1, 400)]
    rows.append((1000, 49, 9, "purchase", 1.0))
    out = purchase_window_join(_events(rows)).to_pandas()
    assert len(out) == 1
    # views at minutes 0..48 within [ts-1h, ts): all 399 views minus the
    # ones at exactly minute 49 (equal ts excluded)
    at49 = sum(1 for r in rows[:-1] if r[1] == 49)
    assert int(out.n_prior.iloc[0]) == 399 - at49


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": [r[1] for r in rows],
    })).repartition(2)


def test_substring_dedup_removes_shared_span():
    span = "one two three four five six seven eight"  # exactly 8 tokens
    out = substring_dedup(_docs([
        (1, span + " tailA tailB"),
        (2, "headX " + span),
        (3, "totally different words here without any long match"),
    ]), n=8).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_covered"] == 8
    assert out.loc[1, "clean_text"] == "taila tailb"
    assert out.loc[2, "clean_text"] == "headx"
    assert out.loc[3, "n_covered"] == 0
    assert out.loc[3, "clean_text"].startswith("totally different")


def test_substring_dedup_within_doc_multiplicity():
    # the SAME doc repeating a window twice counts (suffix-array parity)
    span = "a b c d e f g h"
    out = substring_dedup(_docs([
        (1, span + " mid " + span),
        (2, "unrelated填 filler words that are all unique here ok"),
    ]), n=8).to_pandas().set_index("doc_id")
    assert out.loc[1, "clean_text"] == "mid"
    assert out.loc[1, "n_covered"] == 16


def test_substring_dedup_short_docs_kept_whole():
    out = substring_dedup(_docs([
        (1, "short doc"),
        (2, "short doc"),  # identical but < 8 tokens → no window, kept
    ]), n=8).to_pandas().set_index("doc_id")
    assert (out["n_covered"] == 0).all()
    assert out.loc[1, "clean_text"] == "short doc"


def test_substring_dedup_fully_covered_doc_empty():
    span = "p q r s t u v w"
    out = substring_dedup(_docs([
        (1, span), (2, span),
    ]), n=8).to_pandas().set_index("doc_id")
    assert (out["clean_text"] == "").all()
    assert (out["n_covered"] == 8).all()


def test_substring_dedup_overlapping_windows_merge():
    # doc1/doc2 share a 9-token run → two overlapping 8-windows; coverage
    # merges to 9, not 16
    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    out = substring_dedup(_docs([
        (1, run + " xend"),
        (2, "ystart " + run),
    ]), n=8).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_covered"] == 9
    assert out.loc[1, "clean_text"] == "xend"
