"""Unicode text normalization: the cleanup pass every web-text
pipeline runs before tokenization (Dolma/CCNet-style) — lowercase,
Unicode NFC composition, whitespace collapse.

Rule (pinned, mirrored 1:1 in the DuckDB oracle so the driver verifies
it exactly)::

    norm(t) = trim(regexp_replace(nfc(lower(t)), '\\s+', ' '))

Pure per-row string kernel — runs in a stateless ``map_batches`` body,
no shuffle, no state; the compare surface carries the digest and the
before/after lengths, not the text.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

import pyarrow as pa

_WS_RE = re.compile(r"\s+")


def normalize_text(text: str) -> str:
    if not text:
        return ""
    return _WS_RE.sub(" ", unicodedata.normalize("NFC", text.lower())).strip()


def normalize_batch(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    ids = batch.column(id_col)
    texts = batch.column(text_col).to_pylist()
    normed = [normalize_text(t or "") for t in texts]
    return pa.Table.from_arrays(
        [ids,
         pa.array([len(t or "") for t in texts], pa.int64()),
         pa.array([len(n) for n in normed], pa.int64()),
         pa.array([hashlib.md5(n.encode("utf-8")).hexdigest() for n in normed],
                  pa.string())],
        names=[id_col, "n_chars_before", "n_chars_after", "norm_md5"],
    )
