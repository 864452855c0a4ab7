"""Validator kernels (reference semantics ``kie/validators.py``)."""

from horizon_ocr_python_ray.functions.validators import (
    check_document_consistency,
    detect_currency,
    infer_data_type,
    normalize_date,
    normalize_value,
    parse_amount,
    validate_field,
)


def test_parse_amount_us_eu_disambiguation():
    assert parse_amount("$1,234.56") == 1234.56
    assert parse_amount("1.234,56 €") == 1234.56
    assert parse_amount("1,234,567.89") == 1234567.89
    assert parse_amount("1.234.567,89") == 1234567.89
    assert parse_amount("1234,56") == 1234.56       # decimal comma
    assert parse_amount("1,234") == 1234.0          # thousands comma
    assert parse_amount("1.234") == 1234.0          # EU thousands dot
    assert parse_amount("12.34") == 12.34
    assert parse_amount("-42.00") == -42.0
    assert parse_amount("") is None
    assert parse_amount("n/a") is None


def test_normalize_date_cascade():
    assert normalize_date("2024-03-15") == "2024-03-15"
    assert normalize_date("15/03/2024") == "2024-03-15"
    assert normalize_date("03-15-2024") == "2024-03-15"
    assert normalize_date("15.03.2024") == "2024-03-15"
    assert normalize_date("Mar 15, 2024") == "2024-03-15"
    assert normalize_date("15 March 2024") == "2024-03-15"
    assert normalize_date("20240315") == "2024-03-15"
    assert normalize_date("15-Mar-2024") == "2024-03-15"
    assert normalize_date("15/03/24") == "2024-03-15"  # 2-digit-year retry
    assert normalize_date("not a date") is None


def test_currency_detection():
    assert detect_currency("$5") == "USD"
    assert detect_currency("5 €") == "EUR"
    assert detect_currency("5 GBP") == "GBP"
    assert detect_currency("5") is None


def test_infer_and_normalize():
    assert infer_data_type("total", "$1,234.56") == "currency"
    assert normalize_value("currency", "$1,234.56") == "1234.56"
    assert infer_data_type("invoice date", "2024-01-02") == "date"
    assert infer_data_type("notes", "hello world") == "string"
    assert infer_data_type("count", "42") == "number"


def test_validate_field():
    res = validate_field("total", "$10.00", "currency")
    assert res == [{"name": "amount_parse", "passed": True, "message": ""}]
    res = validate_field("total", "abc", "currency")
    assert not res[0]["passed"]


def test_consistency_tolerance():
    ok = check_document_consistency({"total": "110.00", "subtotal": "100.00", "tax": "10.00"})
    assert ok[0]["passed"]
    bad = check_document_consistency({"total": "115.00", "subtotal": "100.00", "tax": "10.00"})
    assert not bad[0]["passed"]
    dates = check_document_consistency({"date": "2024-01-10", "due_date": "2024-01-01"})
    assert not dates[0]["passed"]


def test_normalize_date_all_formats():
    # every format of the reference's 17-entry cascade parses to ISO
    # (kie/validators.py:262-286)
    from horizon_ocr_python_ray.functions.validators import normalize_date

    cases = [
        "2024-03-15", "15/03/2024", "03/15/2024", "15-03-2024",
        "15.03.2024", "2024/03/15", "2024.03.15", "15 Mar 2024",
        "15 March 2024", "Mar 15, 2024", "March 15, 2024", "Mar 15 2024",
        "March 15 2024", "20240315", "15-Mar-2024", "15 Mar, 2024",
    ]
    for s in cases:
        assert normalize_date(s) == "2024-03-15", s
    # ambiguous day/month: first matching format wins (d/m before m/d)
    assert normalize_date("03-15-2024") == "2024-03-15"  # m-d fallback
    # 2-digit-year retry
    assert normalize_date("15/03/24") == "2024-03-15"
    assert normalize_date("not a date") is None


def test_parse_amount_matrix():
    from horizon_ocr_python_ray.functions.validators import parse_amount

    cases = {
        "$1,234.56": 1234.56,
        "1.234,56 €": 1234.56,
        "1,234,567": 1234567.0,
        "1.234.567": 1234567.0,
        "1234,56": 1234.56,
        "1.234": 1234.0,          # EU thousands
        "12.34": 12.34,           # decimal dot
        "-42.00": -42.0,
        "USD 99": 99.0,
        "0": 0.0,
    }
    for s, want in cases.items():
        got = parse_amount(s)
        assert got == want, (s, got, want)
    assert parse_amount("") is None
    assert parse_amount("--") is None
    assert parse_amount("no digits") is None
