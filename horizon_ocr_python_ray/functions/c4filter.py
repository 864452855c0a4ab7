"""C4-style heuristic line/document cleaning (Raffel et al. 2020, §2.2).

The classic web-corpus cleaning pass every large LM pipeline runs before
dedup: per-LINE keep rules (terminal punctuation, minimum word count,
boilerplate-phrase drops) followed by per-DOCUMENT drop rules (code-like
``{``, placeholder "lorem ipsum", fewer than 3 surviving lines). Rules
follow the published C4 recipe; the boilerplate phrase list is C4's
("javascript", "cookie policy", "privacy policy", "terms of use").

Reference parity: none — the reference repo has no corpus-cleaning
stage; this is part of the engine's training-data-curation surface
(SURVEY.md §7's LLM-pipeline mandate), sited with the other text
curation ops (``linededup``, ``redact``, ``textstats``).

Execution shape: stateless, embarrassingly parallel ``map_batches``
projection — zero shuffles at any corpus size. Fully vectorized: the
line explode is ``pc.split_pattern``, every line predicate is an Arrow
RE2 kernel over the FLATTENED line array (one kernel call per rule per
batch, never per line), per-document reductions are numpy prefix-sum
segment folds, and the cleaned text is reassembled with
``pc.binary_join`` over a rebuilt list array. The only per-row Python
is the final md5 digest of surviving documents (no Arrow md5 kernel —
same accepted pattern as ``redact.py`` / the markdown sink).

Every pattern here is RE2-compatible and mirrored 1:1 in the DuckDB
oracle (``oracle_sql()['pages_c4_filter']``), which replays the same
rules with ``list_filter`` lambdas + ``regexp_extract_all``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Line keep-rule constants (C4 §2.2). RE2 patterns, ASCII-explicit
#: token class (same RE2/Python alignment note as functions/textstats.py).
TERMINAL_PUNCT_RE = r'[.!?"]$'
TOKEN_RE = r"[^ \t]+"
MIN_LINE_WORDS = 5
MIN_KEPT_LINES = 3
#: Lowercased substrings that drop a LINE wherever they appear.
LINE_DROP_PHRASES = ("javascript", "cookie policy", "privacy policy",
                     "terms of use")
#: Lowercased substrings / literals that drop the whole DOCUMENT.
DOC_DROP_BRACE = "{"
DOC_DROP_PHRASE = "lorem ipsum"


def _segment_sums(per_line: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Sum a per-line vector into per-document segments.

    ``bounds`` is the int64 prefix array ``[0, c0, c0+c1, ...]`` of line
    counts; one cumsum + a boundary gather, no Python loop."""
    cs = np.concatenate([[0], np.cumsum(per_line, dtype=np.int64)])
    return cs[bounds[1:]] - cs[bounds[:-1]]


def c4_filter_batch(batch: pa.Table, text_col: str = "extracted_text",
                    key_col: str = "url") -> pa.Table:
    """Cleaning rows for documents that SURVIVE the C4 rules.

    Output: (key, n_lines, n_kept, n_tokens_kept, clean_md5) — integer
    counters plus the digest of the kept lines re-joined with ``\\n``,
    so the oracle's hash-compare verifies the kept/dropped decision AND
    the order-preserving reassembly byte-for-byte."""
    text = pc.fill_null(batch.column(text_col), "").combine_chunks()
    if isinstance(text, pa.ChunkedArray):  # 1-chunk after combine
        text = text.chunk(0) if text.num_chunks else pa.array([], pa.string())

    lines_list = pc.split_pattern(text, pattern="\n")
    flat = pc.list_flatten(lines_list)
    counts = pc.list_value_length(lines_list).to_numpy(zero_copy_only=False)
    bounds = np.concatenate([[0], np.cumsum(counts, dtype=np.int64)])

    # Per-line keep rules — one Arrow kernel per rule over ALL lines.
    keep = pc.match_substring_regex(flat, pattern=TERMINAL_PUNCT_RE)
    tokens = pc.count_substring_regex(flat, pattern=TOKEN_RE)
    keep = pc.and_(keep, pc.greater_equal(tokens, MIN_LINE_WORDS))
    for phrase in LINE_DROP_PHRASES:
        keep = pc.and_(keep, pc.invert(
            pc.match_substring(flat, pattern=phrase, ignore_case=True)))
    keep_np = keep.to_numpy(zero_copy_only=False)
    tokens_np = tokens.to_numpy(zero_copy_only=False).astype(np.int64)

    n_kept = _segment_sums(keep_np.astype(np.int64), bounds)
    tok_kept = _segment_sums(np.where(keep_np, tokens_np, 0), bounds)

    # Reassemble the kept lines per doc (order-preserving) and join.
    kept_values = flat.filter(keep)
    kept_offsets = np.concatenate([[0], np.cumsum(n_kept, dtype=np.int64)])
    kept_list = pa.LargeListArray.from_arrays(
        pa.array(kept_offsets, pa.int64()), kept_values.combine_chunks()
        if isinstance(kept_values, pa.ChunkedArray) else kept_values)
    joined = pc.binary_join(kept_list, "\n")

    # Per-document drop rules on the ORIGINAL text.
    doc_bad = pc.or_(
        pc.match_substring(text, pattern=DOC_DROP_BRACE),
        pc.match_substring(text, pattern=DOC_DROP_PHRASE, ignore_case=True))
    survive = np.logical_and(
        np.logical_not(doc_bad.to_numpy(zero_copy_only=False)),
        n_kept >= MIN_KEPT_LINES)
    survive_pa = pa.array(survive)

    joined_kept = joined.filter(survive_pa)
    md5s = [hashlib.md5((s or "").encode("utf-8")).hexdigest()
            for s in joined_kept.to_pylist()]
    return pa.table({
        key_col: batch.column(key_col).filter(survive_pa),
        "n_lines": pa.array(counts[survive].astype(np.int64), pa.int64()),
        "n_kept": pa.array(n_kept[survive], pa.int64()),
        "n_tokens_kept": pa.array(tok_kept[survive], pa.int64()),
        "clean_md5": pa.array(md5s, pa.string()),
    })
