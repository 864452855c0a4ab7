"""Validation-summary stage (G6 rollup + G7 consistency) tests.

Reference semantics: per-field validator results rolled into a
document-level summary (``/root/reference/docvision/pipeline/
orchestrator.py:1349-1372`` via ``kie/validators.py:495-558``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from horizon_ocr_python_ray.stages.validation_stage import (
    annotate_checks,
    summarize_bucket,
)


def _fields_table(rows):
    cols = {"url": [], "name": [], "value": [], "data_type": []}
    for url, name, value, dt in rows:
        cols["url"].append(url)
        cols["name"].append(name)
        cols["value"].append(value)
        cols["data_type"].append(dt)
    return pa.table(cols)


def test_annotate_checks_per_type():
    t = _fields_table([
        ("u1", "total", "$12.50", "currency"),
        ("u1", "date", "2024-03-05", "date"),
        ("u1", "vendor", "Acme", "string"),
        ("u2", "total", "not-a-number", "currency"),
        ("u2", "due_date", "not a date", "date"),
        ("u2", "note", "", "string"),
    ])
    out = annotate_checks(t).to_pandas().set_index(["url", "name"])
    # currency/date each carry one parse check; strings none (non-empty)
    assert out.loc[("u1", "total")]["n_checks"] == 1
    assert out.loc[("u1", "total")]["n_passed"] == 1
    assert out.loc[("u1", "date")]["n_checks"] == 1
    assert out.loc[("u1", "date")]["n_passed"] == 1
    assert out.loc[("u1", "vendor")]["n_checks"] == 0
    # unparseable values fail their parse check
    assert out.loc[("u2", "total")]["n_checks"] == 1
    assert out.loc[("u2", "total")]["n_passed"] == 0
    assert out.loc[("u2", "due_date")]["n_passed"] == 0
    # empty value adds a failing non_empty check
    assert out.loc[("u2", "note")]["n_checks"] == 1
    assert out.loc[("u2", "note")]["n_passed"] == 0


def test_summarize_consistency_pass_and_fail():
    df = pd.DataFrame({
        "url": ["a"] * 3 + ["b"] * 3 + ["c"],
        "name": ["total", "subtotal", "tax"] * 2 + ["total"],
        "value": ["$110.00", "$100.00", "$10.00",   # a: consistent
                  "$200.00", "$100.00", "$10.00",   # b: off by 90
                  "$50.00"],                        # c: incomplete
        "data_type": ["currency"] * 7,
        "n_checks": [1] * 7,
        "n_passed": [1] * 7,
    })
    out = summarize_bucket(df).set_index("url")
    assert out.loc["a"]["consistency_checked"] == 1
    assert out.loc["a"]["consistency_passed"] == 1
    assert out.loc["b"]["consistency_checked"] == 1
    assert out.loc["b"]["consistency_passed"] == 0
    assert out.loc["c"]["consistency_checked"] == 0
    assert out.loc["c"]["consistency_passed"] == 0
    assert (out["n_fields"] == [3, 3, 1]).all()
    assert (out["n_currency"] == [3, 3, 1]).all()


def test_validation_pipeline_matches_pandas_recompute(corpus_dir):
    from horizon_ocr_python_ray import build_extract_pipeline, read_pages
    from horizon_ocr_python_ray.stages.fields_stage import build_fields_pipeline
    from horizon_ocr_python_ray.stages.validation_stage import (
        build_validation_pipeline,
    )

    fields = build_fields_pipeline(build_extract_pipeline(read_pages(corpus_dir)))
    fields_df = fields.to_pandas()
    got = (build_validation_pipeline(fields)
           .to_pandas().sort_values("url").reset_index(drop=True))

    # single-process recompute through the same kernels (bucketing must
    # not change results: every url lands in exactly one bucket)
    annotated = annotate_checks(pa.Table.from_pandas(
        fields_df, preserve_index=False)).to_pandas()
    want = summarize_bucket(annotated).sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])

    # corpus construction: every document with fields has the full
    # total/subtotal/tax triple and it is internally consistent
    assert (got["consistency_checked"] == 1).all()
    assert (got["consistency_passed"] == 1).all()
    assert (got["n_checks"] == got["n_passed"]).all()
