"""Differential property test: the vectorized C4 kernel must agree with
a naive per-document Python reference on arbitrary inputs — the Arrow
list-offset rebuild (filter + prefix-sum segment folds) is the part a
unit test can miss."""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from horizon_ocr_python_ray.functions.c4filter import (
    DOC_DROP_BRACE,
    DOC_DROP_PHRASE,
    LINE_DROP_PHRASES,
    MIN_KEPT_LINES,
    MIN_LINE_WORDS,
    c4_filter_batch,
)

_TERM = re.compile(r'[.!?"]$')
_TOK = re.compile(r"[^ \t]+")


def _naive_doc(text: str):
    lines = text.split("\n")
    kept, tok_kept = [], 0
    for ln in lines:
        toks = _TOK.findall(ln)
        low = ln.lower()
        if (_TERM.search(ln) and len(toks) >= MIN_LINE_WORDS
                and not any(p in low for p in LINE_DROP_PHRASES)):
            kept.append(ln)
            tok_kept += len(toks)
    if (DOC_DROP_BRACE in text or DOC_DROP_PHRASE in text.lower()
            or len(kept) < MIN_KEPT_LINES):
        return None
    return (len(lines), len(kept), tok_kept,
            hashlib.md5("\n".join(kept).encode("utf-8")).hexdigest())


# ASCII-heavy alphabet plus separators and rule-triggering fragments.
_frag = st.one_of(
    st.text(alphabet=" \tabcdeXYZ.!?\"{}'\n", max_size=30),
    st.sampled_from([
        "alpha beta gamma delta epsilon.", "Lorem ipsum", "JavaScript",
        "cookie policy", "terms of use", "a b c d e!", "short.", "",
    ]),
)
_doc = st.lists(_frag, max_size=8).map(lambda parts: "\n".join(parts))


@settings(max_examples=200, deadline=None)
@given(st.lists(_doc, max_size=6))
def test_vectorized_matches_naive(texts):
    batch = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(texts))], pa.string()),
        "extracted_text": pa.array(texts, pa.string()),
    })
    out = c4_filter_batch(batch)
    got = {
        u: (nl, nk, tk, md5)
        for u, nl, nk, tk, md5 in zip(
            out.column("url").to_pylist(), out.column("n_lines").to_pylist(),
            out.column("n_kept").to_pylist(),
            out.column("n_tokens_kept").to_pylist(),
            out.column("clean_md5").to_pylist())
    }
    want = {f"u{i}": r for i, t in enumerate(texts)
            if (r := _naive_doc(t)) is not None}
    assert got == want
