"""Unicode normalization kernel (functions/normalize.py)."""

from __future__ import annotations

import unicodedata

import pyarrow as pa

from horizon_ocr_python_ray.functions.normalize import (
    normalize_batch,
    normalize_text,
)


def test_whitespace_collapse_and_trim():
    assert normalize_text("  A\t\tB\r\nC  ") == "a b c"


def test_nfc_composition():
    decomposed = "éclair"  # e + combining acute
    assert normalize_text(decomposed) == unicodedata.normalize("NFC", decomposed)
    assert normalize_text(decomposed) == "éclair"


def test_empty_and_none_safe():
    assert normalize_text("") == ""
    t = pa.table({"doc_id": [1, 2], "text": [None, "X"]})
    out = normalize_batch(t)
    assert out.column("n_chars_before").to_pylist() == [0, 1]
    assert out.column("norm_md5")[1].as_py() == __import__("hashlib").md5(
        b"x").hexdigest()


def test_batch_schema():
    t = pa.table({"doc_id": [7], "text": ["Foo   Bar"]})
    out = normalize_batch(t)
    assert out.schema.names == ["doc_id", "n_chars_before",
                                "n_chars_after", "norm_md5"]
    assert out.column("n_chars_after").to_pylist() == [7]  # "foo bar"
