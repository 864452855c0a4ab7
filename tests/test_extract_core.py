"""Route-dispatched extraction core unit tests."""

from horizon_ocr_python_ray.config import DEFAULT_CONFIG
from horizon_ocr_python_ray.functions.docformat import (
    decode_glyphs,
    encode_doc_payload,
    encode_glyphs,
    encode_image_payload,
    make_line,
)
from horizon_ocr_python_ray.functions.extract_core import (
    extract_payload,
    normalize_plain_text,
)


def test_glyph_roundtrip():
    for s in ("hello", "ünïcødé ✓", "", "a\nb"):
        assert decode_glyphs(encode_glyphs(s)) == s


def test_normalize_plain_text():
    text, spans = normalize_plain_text("  a line  \r\n\r\n second \n")
    assert text == "a line\nsecond"
    assert spans == [
        {"start": 0, "end": 6, "kind": "line"},
        {"start": 7, "end": 13, "kind": "line"},
    ]


def test_doc_route_page_order_preserved():
    p0 = {"page": 0, "w": 100.0, "h": 100.0, "lines": [make_line("first", (0, 0, 50, 10), 0.9)]}
    p1 = {"page": 1, "w": 100.0, "h": 100.0, "lines": [make_line("second", (0, 0, 50, 10), 0.9)]}
    payload = encode_doc_payload([p1, p0])  # stored out of order
    text, spans, err = extract_payload("doc", payload, None, DEFAULT_CONFIG)
    assert err is None
    assert text == "first\nsecond"
    assert [s["kind"] for s in spans] == ["header", "header"]  # top-of-page lines → header role


def test_image_route():
    payload = encode_image_payload(
        {"w": 100.0, "h": 100.0, "lines": [make_line("img line", (0, 0, 50, 10), 0.9)]}
    )
    text, _, err = extract_payload("image", payload, None, DEFAULT_CONFIG)
    assert (text, err) == ("img line", None)


def test_poison_payload_yields_error_row_not_raise():
    text, spans, err = extract_payload("doc", b"%PDF-1.7\n%SYNDOC1\nnot-json", None, DEFAULT_CONFIG)
    assert text == "" and spans == [] and err is not None


def test_unknown_route():
    text, _, err = extract_payload("binary", b"\x00\x01", None, DEFAULT_CONFIG)
    assert err.startswith("unsupported_route")


def test_glyph_roundtrip_fuzz():
    from hypothesis import given, settings, strategies as st

    from horizon_ocr_python_ray.functions.docformat import decode_glyphs, encode_glyphs

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=120))
    def check(s):
        assert decode_glyphs(encode_glyphs(s)) == s

    check()
