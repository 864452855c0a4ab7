"""Nested KIE: JSON / <s_k> tag island parsing + dotted-name explosion
(reference kie/donut_runner.py:179-364, azure/gpt_vision_kie.py:455-541)."""

from __future__ import annotations

import json

from horizon_ocr_python_ray.functions.nested import explode_fields, parse_structured
from horizon_ocr_python_ray.stages.fields_stage import candidates_from_text


def test_parse_json_island():
    out = parse_structured('prefix {"a": {"b": 1}, "c": [2, 3]} suffix')
    assert out == {"a": {"b": 1}, "c": [2, 3]}


def test_parse_tag_island_with_sep_list():
    s = ("<s_vendor><s_name>acme</s_name></s_vendor>"
         "<s_items><s_qty>2</s_qty><s_price>$3.00</s_price><sep/>"
         "<s_qty>1</s_qty><s_price>$4.25</s_price></s_items>")
    out = parse_structured(s)
    assert out == {
        "vendor": {"name": "acme"},
        "items": [{"qty": "2", "price": "$3.00"},
                  {"qty": "1", "price": "$4.25"}],
    }


def test_parse_plain_tag_value():
    assert parse_structured("<s_total>$5.00</s_total>") == {"total": "$5.00"}


def test_parse_garbage_is_empty():
    assert parse_structured("no structure here at all") == {}
    assert parse_structured("{broken json") == {}


def test_explode_dotted_and_indexed_names():
    data = {"vendor": {"name": "acme", "id": "V0001"},
            "line_items": [{"qty": 2, "price": "$3.00"}, {"qty": 1, "price": "$4.25"}],
            "tags": ["a", "b"]}
    rows = dict(explode_fields(data))
    assert rows == {
        "vendor.name": "acme",
        "vendor.id": "V0001",
        "line_items[0].qty": "2",
        "line_items[0].price": "$3.00",
        "line_items[1].qty": "1",
        "line_items[1].price": "$4.25",
        "tags[0]": "a",
        "tags[1]": "b",
    }


def test_candidates_route_islands_to_nested_source():
    text = "\n".join([
        "Total: $10.00",
        'Meta: {"vendor":{"name":"acme"},"line_items":[{"qty":2}]}',
        "<s_vendor><s_id>V0042</s_id></s_vendor>",
    ])
    cands = candidates_from_text(text)
    by_src: dict[str, set] = {}
    for c in cands:
        by_src.setdefault(c.source, set()).add(c.name)
    assert "Total" in by_src["regex"]
    assert {"vendor.name", "line_items[0].qty", "vendor.id"} <= by_src["nested"]
    # the island line itself must NOT produce a flat "meta" candidate
    assert "Meta" not in by_src.get("regex", set())


class TestGoldenNestedFields:
    def test_line_item_fields_match_golden_construction(self, corpus_dir, golden_map):
        """pages_fields rows for JSON-island docs equal an independent
        json.loads + explosion of the golden text's Meta line."""
        from horizon_ocr_python_ray import build_extract_pipeline, read_pages
        from horizon_ocr_python_ray.stages.fields_stage import build_fields_pipeline

        out = build_extract_pipeline(read_pages(corpus_dir))
        fields = build_fields_pipeline(out).to_pandas()
        nested = fields[fields["name"].str.contains(r"\.", regex=True)]
        assert len(nested) > 0

        checked = 0
        for url, grow in golden_map.items():
            meta_lines = [ln for ln in grow["extracted_text"].split("\n")
                          if ln.startswith("Meta: ")]
            if not meta_lines:
                continue
            expected = dict(explode_fields(json.loads(meta_lines[0][len("Meta: "):])))
            got = {r["name"]: r["value"] for _, r in
                   fields[fields.url == url].iterrows() if "." in r["name"] or "[" in r["name"]}
            assert got == expected, url
            checked += 1
            if checked >= 25:
                break
        assert checked > 0
