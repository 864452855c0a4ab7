"""HTML metadata harvest kernel (functions/htmlmeta.py)."""

from __future__ import annotations

import pyarrow as pa

from horizon_ocr_python_ray.functions.htmlmeta import html_meta_batch

DOC = (b"<!DOCTYPE html><html><head><title>A Fine Title</title></head>"
       b"<body><h1>A</h1><h2>B</h2><p>x</p><p>y</p>"
       b'<a href="/1">l</a><a href="/2">m</a></body></html>')


def run(payloads, urls=None):
    urls = urls or [f"u{i}" for i in range(len(payloads))]
    return html_meta_batch(pa.table({
        "url": pa.array(urls, pa.string()),
        "html": pa.array(payloads, pa.binary()),
    }))


def test_fields_extracted():
    out = run([DOC])
    assert out.column("title").to_pylist() == ["A Fine Title"]
    assert out.column("n_anchors").to_pylist() == [2]
    assert out.column("n_paragraphs").to_pylist() == [2]
    assert out.column("n_headings").to_pylist() == [2]


def test_prefix_gate_drops_non_html():
    out = run([
        DOC,
        b"\xff\xd8binarystuff",          # binary: dropped
        b"plain text payload",            # text: dropped
        b"<html><title>no doctype</title></html>",  # missing prefix: dropped
        b"<!DOCTYPE htm",                 # shorter than the prefix: dropped
    ])
    assert out.column("url").to_pylist() == ["u0"]


def test_missing_title_is_empty_string():
    out = run([b"<!DOCTYPE html><html><body><p>x</p></body></html>"])
    assert out.column("title").to_pylist() == [""]
    assert out.column("n_paragraphs").to_pylist() == [1]


def test_null_payload_dropped():
    out = run([None, DOC])
    assert out.column("url").to_pylist() == ["u1"]
