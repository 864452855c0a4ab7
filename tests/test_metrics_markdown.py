"""Job-metrics counters and the markdown sink."""

from __future__ import annotations

from horizon_ocr_python_ray import build_extract_pipeline, read_pages
from horizon_ocr_python_ray.functions.markdown import markdown_batch, render_markdown
from horizon_ocr_python_ray.stages.metrics import job_metrics


def test_job_metrics_counts(corpus_dir, golden_map):
    out = build_extract_pipeline(read_pages(corpus_dir))
    m = job_metrics(out).to_pandas()
    assert m.n_docs.sum() == len(golden_map)
    assert set(m.route) == {g["route"] for g in golden_map.values()}
    # the v13 corpus plants corrupt doc payloads → error counter is live
    expect_errors = sum(1 for g in golden_map.values() if g["has_error"])
    assert m.n_errors.sum() == expect_errors
    expect_chars = sum(len(g["extracted_text"]) for g in golden_map.values())
    assert m.text_chars.sum() == expect_chars
    expect_spans = sum(len(g["spans"]) for g in golden_map.values())
    assert m.n_spans.sum() == expect_spans


def test_render_markdown_structure():
    md = render_markdown(
        "https://h/x", "My Title\nBody paragraph here.",
        [{"start": 0, "end": 8, "kind": "title"},
         {"start": 9, "end": 30, "kind": "paragraph"}],
        "html", None,
    )
    assert "# My Title" in md
    assert "Body paragraph here." in md
    assert md.endswith("\n")


def test_markdown_batch_over_pipeline(corpus_dir, golden_map):
    out = build_extract_pipeline(read_pages(corpus_dir))
    md = out.map_batches(markdown_batch, batch_format="pyarrow").to_pandas()
    assert len(md) == len(golden_map)
    assert set(md.columns) == {"url", "markdown"}
    sample_url = md.url.iloc[0]
    g = golden_map[sample_url]
    if g["spans"]:
        first = g["extracted_text"][g["spans"][0]["start"]:g["spans"][0]["end"]]
        assert first in md.markdown.iloc[0]
