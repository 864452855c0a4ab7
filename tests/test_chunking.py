"""Training-window chunking (stages/chunking.py)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray

from horizon_ocr_python_ray.stages.chunking import chunk_documents, doc_chunks


def _words(n):
    return " ".join(f"w{i}" for i in range(n))


def test_short_doc_single_chunk():
    got = doc_chunks(_words(5), window=8, stride=6, min_keep=4)
    assert got == [(0, 0, 5, "w0 w1 w2 w3 w4")]


def test_empty_doc_no_chunks():
    assert doc_chunks("", 8, 6, 4) == []
    assert doc_chunks("   ", 8, 6, 4) == []


def test_windows_overlap_and_cover():
    # 20 tokens, window 8, stride 6 → starts 0, 6, 12 (12+8 >= 20 stops)
    got = doc_chunks(_words(20), window=8, stride=6, min_keep=4)
    assert [(c[0], c[1], c[2]) for c in got] == [
        (0, 0, 8), (1, 6, 8), (2, 12, 8)]
    # consecutive windows overlap by window - stride tokens
    assert got[0][3].split()[6:] == got[1][3].split()[:2]


def test_tail_shorter_than_min_keep_dropped():
    # 17 tokens, window 8, stride 6 → starts 0, 6; start 12 has 5 < 6? no:
    # min_keep 6 → tail (5 tokens) dropped
    got = doc_chunks(_words(17), window=8, stride=6, min_keep=6)
    assert [c[1] for c in got] == [0, 6]
    # with min_keep 4 the tail window survives
    got2 = doc_chunks(_words(17), window=8, stride=6, min_keep=4)
    assert [c[1] for c in got2] == [0, 6, 12]


def test_no_window_past_coverage():
    # 8 tokens, window 8, stride 6: the 0-window reaches the end; start 6
    # would only re-slice covered tokens and must not be emitted
    got = doc_chunks(_words(8), window=8, stride=6, min_keep=1)
    assert [c[1] for c in got] == [0]


def test_chunk_documents_dataset():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": [_words(20), ""]})).repartition(2)
    out = chunk_documents(ds, window=8, stride=6, min_keep=4).to_pandas()
    assert list(out.doc_id) == [1, 1, 1]
    assert list(out.chunk_idx) == [0, 1, 2]
    assert (out.n_tokens == 8).all()


def test_bad_params_raise():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, window=4, stride=8)
