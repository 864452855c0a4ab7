"""Curation funnel: single-pass staged counts over the pages corpus."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def funnel(ray_session):
    from horizon_ocr_python_ray import ensure_corpus, read_pages
    from horizon_ocr_python_ray.pipelines.curation import curation_funnel

    corpus = ensure_corpus(0.001)
    df = curation_funnel(read_pages(corpus)).to_pandas()
    return df.sort_values("stage_idx").set_index("stage")["n_rows"]


def test_funnel_monotone_nonincreasing(funnel):
    vals = funnel.loc[["extracted", "url_dedup", "content_dedup",
                       "lang_en", "quality", "train"]].tolist()
    assert vals == sorted(vals, reverse=True)


def test_funnel_stage_semantics(funnel):
    # all 500 pages extract; tracking-variant dups collapse at url_dedup;
    # mirror dups only at content_dedup; ~20% of rows are labeled en
    assert funnel["extracted"] == 500
    assert funnel["url_dedup"] < funnel["extracted"]
    assert funnel["content_dedup"] < funnel["url_dedup"]  # mirrors exist
    assert 0 < funnel["lang_en"] < funnel["content_dedup"]
    assert 0 < funnel["train"] <= funnel["quality"] <= funnel["lang_en"]


def test_lang_id_recovers_planted_stopwords():
    # construction property the lang_en gate relies on: a labeled row's
    # sentences carry its language's stopwords, so lang_id recovers it
    from horizon_ocr_python_ray.functions.textstats import lang_id
    from horizon_ocr_python_ray.sources.synth import gen_corpus

    pages, golden = gen_corpus(120)
    hits = total = 0
    for i in range(120):
        label = pages.column("lang")[i].as_py()
        if label == "unknown" or golden.column("route")[i].as_py() == "dup":
            continue
        text = golden.column("extracted_text")[i].as_py()
        if not text.strip():
            continue
        total += 1
        hits += lang_id(text) == label
    assert total > 50
    assert hits / total > 0.9
