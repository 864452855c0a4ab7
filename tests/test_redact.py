"""PII redaction kernel tests (rule order, masking, counts)."""

from __future__ import annotations

import pyarrow as pa

from horizon_ocr_python_ray.functions.redact import redact_batch, redact_text_array


def _run(texts):
    t = pa.table({"url": [f"u{i}" for i in range(len(texts))],
                  "extracted_text": texts})
    return redact_batch(t).to_pylist()


def test_masks_and_counts():
    rows = _run([
        "write to alice.b+x@mail-host.example or bob@h.example now",
        "call 555-123-4567 or 555-999-0000 tomorrow",
        "server at 10.0.12.34 and 192.168.1.1 responded",
        "clean text with no identifiers at all",
        "",
    ])
    assert [r["n_emails"] for r in rows] == [2, 0, 0, 0, 0]
    assert [r["n_phones"] for r in rows] == [0, 2, 0, 0, 0]
    assert [r["n_ips"] for r in rows] == [0, 0, 2, 0, 0]


def test_rule_order_email_wins_over_numeric_classes():
    # an email whose local/domain parts look like phone/IP digit runs must
    # be consumed by the email rule; nothing numeric remains to re-match
    counts, red = redact_text_array(pa.array(["reach 555-123-4567@10.0.0.1.example ok"]))
    assert counts["email"].to_pylist() == [1]
    assert counts["phone"].to_pylist() == [0]
    assert counts["ip"].to_pylist() == [0]
    assert red.to_pylist() == ["reach <EMAIL> ok"]


def test_phone_boundaries():
    counts, red = redact_text_array(pa.array([
        "order 9555-123-45678 is not a phone but 555-123-4567 is",
    ]))
    assert counts["phone"].to_pylist() == [1]
    assert red.to_pylist() == ["order 9555-123-45678 is not a phone but <PHONE> is"]


def test_corpus_has_planted_pii(corpus_dir):
    from horizon_ocr_python_ray import build_extract_pipeline, read_pages

    out = build_extract_pipeline(read_pages(corpus_dir))
    rows = out.map_batches(redact_batch, batch_format="pyarrow").to_pandas()
    assert rows["n_emails"].sum() > 0
    assert rows["n_phones"].sum() > 0
    assert rows["n_ips"].sum() > 0
    # every planted sentence carries all three classes at once
    assert ((rows["n_emails"] == rows["n_phones"])
            & (rows["n_phones"] == rows["n_ips"])).all()
