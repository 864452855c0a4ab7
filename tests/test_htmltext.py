"""DOM-heuristic boilerplate stripper unit tests."""

from horizon_ocr_python_ray.config import HtmlConfig
from horizon_ocr_python_ray.functions.htmltext import extract_html

CFG = HtmlConfig()

LONG = "This paragraph is definitely long enough to be retained as main content."


def _extract(html: str):
    return extract_html(html.encode("utf-8"), CFG)


def test_basic_main_content():
    text, spans = _extract(
        f"<html><head><title>Ignore Me</title></head><body>"
        f"<h1>The Title</h1><p>{LONG}</p></body></html>"
    )
    assert text == f"The Title\n{LONG}"
    assert spans == [
        {"start": 0, "end": 9, "kind": "title"},
        {"start": 10, "end": 10 + len(LONG), "kind": "paragraph"},
    ]


def test_boilerplate_subtrees_dropped():
    text, _ = _extract(
        f"<body><nav><ul><li><a href='/'>Home page link text that is long</a></li></ul></nav>"
        f"<header><div>A header banner with quite a lot of text inside it.</div></header>"
        f"<p>{LONG}</p>"
        f"<aside><p>{LONG}</p></aside>"
        f"<footer><p>Copyright notice text that is long enough to retain.</p></footer></body>"
    )
    assert text == LONG


def test_link_density_drops_link_farms():
    farm = "".join(f"<li><a href='/{i}'>related article number {i} here</a></li>" for i in range(4))
    text, _ = _extract(f"<body><p>{LONG}</p><div><ul>{farm}</ul></div></body>")
    assert text == LONG


def test_inline_link_low_density_kept():
    html = f"<body><p>{LONG} See <a href='/x'>ref</a> for details.</p></body>"
    text, _ = _extract(html)
    assert text == f"{LONG} See ref for details."


def test_short_blocks_dropped_headings_kept():
    text, spans = _extract("<body><h2>Short Head</h2><p>tiny</p><p>" + LONG + "</p></body>")
    assert text == f"Short Head\n{LONG}"
    assert spans[0]["kind"] == "heading"


def test_entities_and_whitespace_normalized():
    text, _ = _extract(
        "<body><p>Fish &amp; chips    are a   classic dish enjoyed worldwide today.</p></body>"
    )
    assert text == "Fish & chips are a classic dish enjoyed worldwide today."


def test_nested_blocks_flush_in_document_order():
    text, _ = _extract(
        f"<body><div><p>{LONG}</p><p>Another paragraph with sufficient length to retain fully.</p></div></body>"
    )
    assert text == f"{LONG}\nAnother paragraph with sufficient length to retain fully."


def test_malformed_html_does_not_crash():
    text, spans = _extract("<body><p>Unclosed paragraph that is long enough to keep around here")
    assert "Unclosed paragraph" in text
    assert spans[0]["start"] == 0
