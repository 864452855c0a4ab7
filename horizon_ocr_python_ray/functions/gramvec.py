"""Vectorized n-gram explode — the kernel behind repeated-n-gram stats.

``doc_ngrams`` (``stages/decontam.py``) builds each document's distinct
token n-grams with a per-doc Python set comprehension; fine for the
broadcast decontamination probe (eval sets are small) but the dominant
cost of the corpus-wide repeated-gram pipeline, which explodes EVERY
document (round-2 verdict: the most expensive bench query). This module
does the same explode with Arrow/numpy kernels only:

1. ``utf8_lower`` + ``split_pattern_regex('\\s+')`` (one C++ call each;
   Arrow's regex engine is RE2, the same engine DuckDB uses, so the
   whitespace class is byte-identical to the SQL oracles' —
   ``[\\t\\n\\f\\r ]``, not Python's Unicode ``\\s``),
2. drop zero-length boundary tokens in the FLAT token array (regex
   split keeps leading/trailing empties; ``\\S+`` does not),
3. window starts via the repeat/cumsum ownership trick (the same shape
   as ``fasthash``'s per-row sums),
4. gram strings via ``binary_join_element_wise`` over n shifted takes
   of the flat token array,
5. per-doc DISTINCT via one ``Table.group_by`` on (doc_id, gram).

Output is value-identical to ``doc_ngrams`` per doc (property-tested
against it), so the SQL mirror documented there is unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _flat_tokens(texts: pa.ChunkedArray | pa.Array):
    """Lower + whitespace-split a text column → (flat token Array,
    int64 per-doc offsets into it), empty tokens removed, null texts
    treated as empty docs."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # list offsets, slice-corrected
    offsets = np.asarray(toks.offsets).astype(np.int64)
    offsets = offsets - offsets[0]
    keep = pc.not_equal(pc.binary_length(flat), 0)
    keep_np = np.asarray(keep)
    flat = flat.filter(keep)
    n_docs = len(toks)
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64),
                           np.diff(offsets))
    counts = np.bincount(doc_of_tok[keep_np], minlength=n_docs)
    new_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=new_offsets[1:])
    return flat, new_offsets


def _gram_windows(texts: pa.ChunkedArray | pa.Array, n: int):
    """Shared window explode: tokenize ``texts`` and enumerate every
    n-token window. Returns ``(doc_idx, intra, grams)`` — the owning
    document's positional index (int64 ndarray), the 0-based token
    start within that document (int64 ndarray), and the joined gram
    strings (Arrow Array) — or ``None`` when no document has ≥ n
    tokens. Both explode entry points project from this one kernel so
    the window arithmetic can never drift between them."""
    flat, offsets = _flat_tokens(texts)
    tok_counts = np.diff(offsets)
    gram_counts = np.maximum(tok_counts - n + 1, 0)
    total = int(gram_counts.sum())
    if total == 0:
        return None
    gram_starts = np.zeros(len(gram_counts) + 1, np.int64)
    np.cumsum(gram_counts, out=gram_starts[1:])
    # global window index → start position in the flat token array
    intra = (np.arange(total, dtype=np.int64)
             - np.repeat(gram_starts[:-1], gram_counts))
    starts = np.repeat(offsets[:-1], gram_counts) + intra
    parts = [flat.take(pa.array(starts + k, pa.int64())) for k in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    doc_idx = np.repeat(np.arange(len(gram_counts), dtype=np.int64),
                        gram_counts)
    return doc_idx, intra, grams


def explode_distinct_ngrams(doc_ids: pa.ChunkedArray | pa.Array,
                            texts: pa.ChunkedArray | pa.Array,
                            n: int) -> pa.Table:
    """(doc_id, gram) DISTINCT pairs of every document's lowered
    whitespace-token n-grams — ``doc_ngrams`` exploded over a whole
    batch with no per-row Python. Docs with < n tokens emit nothing."""
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    win = _gram_windows(texts, n)
    if win is None:
        return pa.table({"doc_id": pa.array([], doc_ids.type),
                         "gram": pa.array([], pa.string())})
    doc_idx, _intra, grams = win
    owner = doc_ids.take(pa.array(doc_idx, pa.int64()))
    pairs = pa.table({"doc_id": owner, "gram": grams})
    return pairs.group_by(["doc_id", "gram"]).aggregate([])


def explode_ngram_instances(doc_ids: pa.ChunkedArray | pa.Array,
                            texts: pa.ChunkedArray | pa.Array,
                            n: int) -> pa.Table:
    """(doc_id, start, gram) for EVERY n-gram window (start = 0-based
    token index, one row per instance, repeats kept) — the positional
    explode behind substring-span dedup, same tokenization as
    :func:`explode_distinct_ngrams` (lower, whitespace split, empties
    dropped)."""
    if isinstance(doc_ids, pa.ChunkedArray):
        doc_ids = doc_ids.combine_chunks()
    win = _gram_windows(texts, n)
    if win is None:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "start": pa.array([], pa.int64()),
                         "gram": pa.array([], pa.string())})
    doc_idx, intra, grams = win
    owner = doc_ids.take(pa.array(doc_idx, pa.int64())).cast(pa.int64())
    return pa.table({"doc_id": owner,
                     "start": pa.array(intra, pa.int64()),
                     "gram": grams})
