"""C4-style heuristic cleaning rules (functions/c4filter.py)."""

from __future__ import annotations

import hashlib

import pyarrow as pa

from horizon_ocr_python_ray.functions.c4filter import c4_filter_batch

GOOD = "alpha beta gamma delta epsilon zeta."  # >=5 words, terminal punct


def run(texts, keys=None):
    keys = keys or [f"u{i}" for i in range(len(texts))]
    batch = pa.table({"url": pa.array(keys, pa.string()),
                      "extracted_text": pa.array(texts, pa.string())})
    return c4_filter_batch(batch)


def test_line_rules_terminal_punct_and_min_words():
    # 3 good lines survive; heading (no punct), short line, and
    # phrase-flagged lines are dropped.
    text = "\n".join([
        "Heading Without Punct",              # no terminal punct
        GOOD,
        "too short.",                          # <5 words
        "please enable javascript to view this page.",  # phrase drop
        "read our cookie policy before you continue here.",
        "read our privacy policy before you continue here.",
        "see the terms of use for the full details here.",
        GOOD,
        'quoted line with five whole words here"',      # ends in quote: kept
        "does it end with a question about the corpus?",  # ? kept
        "it ends with an exclamation over five words!",   # ! kept
    ])
    out = run([text])
    assert out.num_rows == 1
    assert out.column("n_lines")[0].as_py() == 11
    assert out.column("n_kept")[0].as_py() == 5
    kept = [GOOD, GOOD,
            'quoted line with five whole words here"',
            "does it end with a question about the corpus?",
            "it ends with an exclamation over five words!"]
    expect_md5 = hashlib.md5("\n".join(kept).encode()).hexdigest()
    assert out.column("clean_md5")[0].as_py() == expect_md5
    assert out.column("n_tokens_kept")[0].as_py() == sum(
        len(l.split()) for l in kept)


def test_doc_drop_rules():
    three_good = "\n".join([GOOD, GOOD, GOOD])
    out = run([
        three_good,                                   # survives
        three_good + "\nvar x = {bad};",              # brace → dropped
        three_good + "\nLorem Ipsum dolor sit amet.",  # lorem → dropped
        "\n".join([GOOD, GOOD]),                      # only 2 kept → dropped
        "",                                           # empty → dropped
    ])
    assert out.column("url").to_pylist() == ["u0"]
    assert out.column("n_kept")[0].as_py() == 3


def test_multi_doc_segment_alignment():
    # Mixed batch: per-doc counters must not bleed across documents.
    docs = [
        "\n".join([GOOD] * 4),
        "\n".join(["Nope", GOOD, GOOD, GOOD, "x y."]),
        "\n".join([GOOD] * 3 + ["please enable javascript now ok."]),
    ]
    out = run(docs)
    assert out.column("url").to_pylist() == ["u0", "u1", "u2"]
    assert out.column("n_lines").to_pylist() == [4, 5, 4]
    assert out.column("n_kept").to_pylist() == [4, 3, 3]
    w = len(GOOD.split())
    assert out.column("n_tokens_kept").to_pylist() == [4 * w, 3 * w, 3 * w]


def test_null_text_treated_as_empty():
    batch = pa.table({"url": pa.array(["a", "b"], pa.string()),
                      "extracted_text": pa.array(
                          [None, "\n".join([GOOD] * 3)], pa.string())})
    out = c4_filter_batch(batch)
    assert out.column("url").to_pylist() == ["b"]


def test_tab_tokens_counted_like_oracle():
    # Token runs are [^ \t]+ — tabs separate words exactly like spaces.
    line = "one\ttwo\tthree\tfour\tfive."
    out = run(["\n".join([line, GOOD, GOOD])])
    assert out.num_rows == 1
    assert out.column("n_tokens_kept")[0].as_py() == 5 + 2 * len(GOOD.split())
