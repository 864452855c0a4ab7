"""Fuser strategies + quality filter (reference ``kie/fuse.py``)."""

from horizon_ocr_python_ray.config import FuseConfig
from horizon_ocr_python_ray.functions.fuse import (
    Candidate,
    fuse_fields,
    normalize_field_name,
    quality_filter,
)

CFG = FuseConfig()


def test_normalize_field_name():
    assert normalize_field_name("Invoice Number") == "invoice_number"
    assert normalize_field_name("  Due-Date ") == "due_date"


def test_quality_filter_drops_low_single_source():
    cands = [
        Candidate("note", "x", 0.10, "regex"),      # single source, conf<0.15 → drop
        Candidate("note2", "keep me", 0.10, "regex"),
        Candidate("note2", "keep me", 0.10, "layout"),  # two sources → kept
        Candidate("empty", "  ", 0.99, "regex"),    # empty → drop
        Candidate("total", "not-an-amount", 0.9, "regex"),  # implausible → drop
    ]
    kept = quality_filter(cands, CFG)
    names = [c.name for c in kept]
    assert names == ["note2", "note2"]


def test_weighted_vote_picks_heavier_group():
    cands = [
        Candidate("invoice_number", "INV-1", 0.6, "regex"),    # w 1.0 → 0.6
        Candidate("invoice_number", "INV-2", 0.4, "regex"),
        Candidate("invoice_number", "INV-2", 0.5, "layout"),   # 0.4 + 0.45 = 0.85
    ]
    out = fuse_fields(cands, CFG, run_validators=False)
    assert len(out) == 1
    assert out[0].value == "INV-2"
    assert out[0].n_candidates == 3
    assert out[0].status == "confident"  # two sources agree on winner


def test_consensus_majority():
    cfg = FuseConfig(strategy="consensus")
    cands = [
        Candidate("f", "A", 0.9, "regex"),
        Candidate("f", "B", 0.5, "layout"),
        Candidate("f", "B", 0.5, "fallback"),
    ]
    out = fuse_fields(cands, cfg, run_validators=False)
    assert out[0].value == "B"  # 2 of 3 sources


def test_highest_confidence():
    cfg = FuseConfig(strategy="highest_confidence")
    cands = [
        Candidate("f", "low", 0.4, "regex"),
        Candidate("f", "high", 0.8, "layout"),
    ]
    out = fuse_fields(cands, cfg, run_validators=False)
    assert out[0].value == "high"


def test_validation_status_and_normalization():
    cands = [
        Candidate("Total", "$110.00", 0.9, "regex"),
        Candidate("Subtotal", "$100.00", 0.9, "regex"),
        Candidate("Tax", "$10.00", 0.9, "regex"),
        Candidate("Date", "15/03/2024", 0.9, "regex"),
    ]
    out = fuse_fields(cands, CFG)
    by_name = {f.name: f for f in out}
    assert by_name["total"].normalized_value == "110.00"
    assert by_name["total"].data_type == "currency"
    assert by_name["total"].status == "validated"
    assert by_name["date"].normalized_value == "2024-03-15"


def test_validation_failure_propagates():
    cands = [
        Candidate("Total", "$120.00", 0.9, "regex"),
        Candidate("Subtotal", "$100.00", 0.9, "regex"),
        Candidate("Tax", "$10.00", 0.9, "regex"),
    ]
    out = fuse_fields(cands, CFG)
    assert all(f.status == "validation_failed" for f in out)


def test_deterministic_tie_break():
    cands = [
        Candidate("f", "A", 0.5, "regex"),
        Candidate("f", "B", 0.5, "layout"),
    ]
    a = fuse_fields(cands, CFG, run_validators=False)
    b = fuse_fields(list(reversed(cands)), CFG, run_validators=False)
    assert a[0].value == b[0].value
