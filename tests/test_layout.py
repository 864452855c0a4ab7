"""Reading order + targeted re-pass kernels (reference semantics:
``detect/text_craft.py:353-410``, ``ocr/targeted_reocr.py:150-178``)."""

from horizon_ocr_python_ray.config import DocConfig
from horizon_ocr_python_ray.functions.docformat import make_line
from horizon_ocr_python_ray.functions.layout import reading_order_indices, recognize_page

CFG = DocConfig()


def test_reading_order_rows_and_columns():
    # grid: row0 [A, B], row1 [C]; stored shuffled
    boxes = [
        [500.0, 40.0, 700.0, 70.0],   # B (row0, col1)
        [50.0, 80.0, 300.0, 110.0],   # C (row1)
        [50.0, 40.0, 300.0, 70.0],    # A (row0, col0)
    ]
    assert reading_order_indices(boxes) == [2, 0, 1]


def test_reading_order_tolerates_jitter():
    # same row with ±5px vertical jitter still groups into one row
    boxes = [
        [500.0, 45.0, 700.0, 75.0],
        [50.0, 40.0, 300.0, 70.0],
    ]
    assert reading_order_indices(boxes) == [1, 0]


def test_reading_order_tie_break_is_total():
    boxes = [[50.0, 40.0, 300.0, 70.0], [50.0, 40.0, 300.0, 70.0]]
    assert reading_order_indices(boxes) == [0, 1]


def test_repass_accept_margin():
    lines = [
        # low conf, alt clears margin → accepted
        make_line("b#d", (50, 40, 200, 68), 0.40, alt_text="bad", alt_conf=0.60),
        # low conf, alt below margin → rejected
        make_line("w#rse", (50, 80, 200, 108), 0.60, alt_text="worse", alt_conf=0.64),
        # high conf → never re-passed even with alt present
        make_line("good", (50, 120, 200, 148), 0.90, alt_text="evil", alt_conf=0.99),
    ]
    out = recognize_page(lines, CFG)
    assert [o["text"] for o in out] == ["bad", "w#rse", "good"]
    assert [o["repassed"] for o in out] == [True, False, False]
    assert out[0]["confidence"] == 0.60


def test_repass_per_page_cap_worst_first():
    cfg = DocConfig(reocr_max_lines_per_page=1)
    lines = [
        make_line("a#", (50, 40, 200, 68), 0.50, alt_text="aa", alt_conf=0.90),
        make_line("b#", (50, 80, 200, 108), 0.30, alt_text="bb", alt_conf=0.90),
    ]
    out = recognize_page(lines, cfg)
    # only the worst line (conf 0.30) gets the re-pass under cap=1
    assert [o["text"] for o in out] == ["a#", "bb"]
