"""Public one-call API (§2.8 ProcessingOptions/DocumentProcessor analog)."""

from __future__ import annotations

from horizon_ocr_python_ray import ProcessingOptions, process_pages, read_pages


def test_default_options_only_extract(corpus_dir):
    out = process_pages(read_pages(corpus_dir))
    assert set(out) == {"extract"}


def test_all_stage_toggles(corpus_dir, golden_map):
    opts = ProcessingOptions(run_fields=True, run_tables=True, run_styles=True,
                             run_reconstruction=True, run_markdown=True,
                             run_validation=True, run_redact=True)
    out = process_pages(read_pages(corpus_dir), opts)
    assert set(out) == {"extract", "fields", "tables", "styles",
                       "reconstruction", "markdown", "validation", "redact"}
    # extract stays byte-identical through the API surface
    got = {r["url"]: r["extracted_text"]
           for r in out["extract"].select_columns(["url", "extracted_text"]).take_all()}
    sample = next(iter(golden_map))
    assert got[sample] == golden_map[sample]["extracted_text"]
    for name in ("fields", "tables", "styles", "reconstruction", "markdown",
                 "validation", "redact"):
        assert out[name].count() > 0, name


def test_variant_passthrough(corpus_dir):
    out = process_pages(read_pages(corpus_dir),
                        ProcessingOptions(variant="staged", dedup=False))
    assert out["extract"].count() > 0


def test_sf_from_dir_accepts_corpus_cache_layout():
    from horizon_ocr_python_ray.sources.synth import sf_from_dir

    assert sf_from_dir("/root/testdata/sf0.01") == 0.01
    assert sf_from_dir("/tmp/hopr_corpus/seed42_sf4_v14") == 4.0
    assert sf_from_dir("/tmp/hopr_corpus/seed42_sf0.1_v14/") == 0.1
