"""End-to-end golden byte-identity over Ray (the correctness gate:
byte-identical extracted text per url, FIXTURES.md §2)."""

import pandas as pd

from horizon_ocr_python_ray import build_extract_pipeline, read_pages


def _run(corpus_dir, **kw) -> pd.DataFrame:
    return build_extract_pipeline(read_pages(corpus_dir), **kw).to_pandas()


def _assert_matches_golden(df: pd.DataFrame, golden_map):
    assert len(df) == len(golden_map)
    assert set(df["url"]) == set(golden_map)
    for row in df.itertuples():
        g = golden_map[row.url]
        assert row.extracted_text == g["extracted_text"], row.url
        assert row.route == g["route"], row.url
        assert row.content_hash == g["content_hash"], row.url
        got_spans = [dict(s) for s in row.spans]
        assert got_spans == g["spans"], row.url
        if g["has_error"]:
            # corrupt planted payload: error channel set, empty result
            assert row.error is not None, row.url
            assert row.extracted_text == "", row.url
        else:
            assert row.error is None, row.url


def test_combined_pipeline_byte_identity(corpus_dir, golden_map):
    _assert_matches_golden(_run(corpus_dir), golden_map)


def test_combined_without_dedup_identical(corpus_dir, golden_map):
    _assert_matches_golden(_run(corpus_dir, dedup=False), golden_map)


def test_staged_pipeline_byte_identity(corpus_dir, golden_map):
    _assert_matches_golden(_run(corpus_dir, variant="staged"), golden_map)


def test_dedup_propagates_to_duplicate_urls(corpus_dir, golden_map):
    df = _run(corpus_dir)
    by_hash = df.groupby("content_hash")["extracted_text"].nunique()
    assert (by_hash == 1).all()
    # the synthetic corpus contains at least one real duplicate group
    assert (df.groupby("content_hash")["url"].count() > 1).any()


def test_grouped_dedup_variant_byte_identity(corpus_dir, golden_map):
    _assert_matches_golden(_run(corpus_dir, variant="grouped"), golden_map)


def test_registry_dedup_variant_byte_identity(corpus_dir, golden_map):
    _assert_matches_golden(_run(corpus_dir, variant="registry"), golden_map)


def test_complexity_routed_pipeline_byte_identity(corpus_dir, golden_map):
    """A11 routing analog: splitting the corpus by header-only
    complexity bands (combined stage for simple/medium, staged pipeline
    for complex) changes the execution shape, never the bytes."""
    from horizon_ocr_python_ray.stages.complexity import (
        build_complexity_routed_pipeline,
    )

    out = build_complexity_routed_pipeline(read_pages(corpus_dir))
    _assert_matches_golden(out.to_pandas(), golden_map)


def test_complexity_bands_all_populated(corpus_dir):
    """The synthetic corpus exercises every band and both variants."""
    from horizon_ocr_python_ray.stages.complexity import complexity_batch
    import pyarrow.parquet as pq
    import glob
    import pyarrow as pa

    tabs = [pq.read_table(f, columns=["url", "html"])
            for f in sorted(glob.glob(corpus_dir + "/pages/*.parquet"))]
    scored = complexity_batch(pa.concat_tables(tabs))
    bands = set(scored.column("complexity").to_pylist())
    assert bands == {"simple", "medium", "complex"}
    variants = set(scored.column("extract_variant").to_pylist())
    assert variants == {"combined", "staged"}
