"""PII redaction over extracted text (training-data curation op).

Standard web-corpus scrubbing as described in public pipeline reports
(C4's blocklist filtering, the Dolma toolkit's PII taggers): regex
classes for emails, US-style phone numbers and IPv4 addresses, each
replaced with a typed mask token. The rules are applied IN ORDER on the
progressively redacted text (email first, so its digit runs can't be
re-matched by the looser numeric classes) and are RE2-compatible,
mirrored 1:1 in the DuckDB oracle (``oracle_sql()['pages_redact']``)
which recomputes counts and the redacted text from the golden fixtures
independently.

Vectorized end-to-end with ``pyarrow.compute`` RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``); the only
per-row Python is the md5 digest of the redacted text (no Arrow md5
kernel exists — same pattern as the markdown sink).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

#: (rule name, RE2 pattern, mask token) — applied in order.
REDACT_RULES = (
    ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_text_array(text: pa.ChunkedArray | pa.Array):
    """text array → (counts dict by rule name, redacted array).

    Counts are taken on the text as it stands when the rule runs (the
    same nested-application order the oracle uses)."""
    counts: dict[str, pa.Array] = {}
    red = text
    for name, pat, mask in REDACT_RULES:
        counts[name] = pc.cast(
            pc.count_substring_regex(red, pattern=pat), pa.int64())
        red = pc.replace_substring_regex(red, pattern=pat, replacement=mask)
    return counts, red


def redact_batch(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    """extraction rows → (url, n_emails, n_phones, n_ips, redacted_md5)."""
    counts, red = redact_text_array(batch.column(text_col))
    out = batch.select(["url"])
    for name, _, _ in REDACT_RULES:
        out = out.append_column(f"n_{name}s", counts[name])
    md5s = [hashlib.md5((s or "").encode("utf-8")).hexdigest()
            for s in red.to_pylist()]
    return out.append_column("redacted_md5", pa.array(md5s, pa.string()))
