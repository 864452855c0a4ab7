"""Corpus-global boilerplate line removal (RefinedWeb / CCNet-style):
drop every line that occurs in ≥ K distinct documents ("Page 1",
copyright footers, nav crumbs) from every document's extracted text.

Scale shape (100 TB):
- Pass 1 (line document-frequency) pre-aggregates INSIDE each batch —
  the shuffle carries one ``(line, partial_df)`` row per distinct line
  per batch (each input row is one whole document, so batch-local doc
  counts are exact partials); ``groupby(line).sum`` finishes it. The
  shuffle is 2 columns wide; payloads never move.
- The DROP-SET (lines with df ≥ K) is small by construction — every
  member needs K distinct documents, so |drop| ≤ total_lines / K, and
  in practice boilerplate is a tiny vocabulary. It is folded to the
  driver behind a hard cap (no silent fallback) and broadcast once via
  ``ray.put`` with the worker-global cache pattern.
- Pass 2 re-streams the documents and filters lines locally — no
  second shuffle; output is one narrow row per document.

Lines cross the shuffle as STRINGS (not 64-bit hashes): a hash
collision would silently drop an innocent line, and the compare
contract is exact string semantics mirrored in the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow as pa

#: Default document-frequency threshold: a line present in this many
#: distinct documents is boilerplate.
DEFAULT_MIN_DF = 5

#: Refuse to broadcast a drop-set larger than this — hitting it means
#: K is far too low for the corpus, not that the plan should silently
#: degrade.
DROP_SET_MAX = 20_000_000


def _partial_line_df(batch: pa.Table, text_col: str) -> pa.Table:
    """One output row per distinct non-empty line in the batch, counting
    how many of the batch's documents contain it."""
    counts: Counter = Counter()
    for text in batch.column(text_col).to_pylist():
        if text:
            counts.update({ln for ln in text.split("\n") if ln})
    lines = sorted(counts)
    return pa.Table.from_arrays(
        [pa.array(lines, pa.string()),
         pa.array([counts[ln] for ln in lines], pa.int64())],
        names=["line", "partial_df"],
    )


def boilerplate_lines_ref(docs_ds, min_df: int = DEFAULT_MIN_DF,
                          text_col: str = "extracted_text"):
    """docs → ``ray.put`` handle of the frozenset of boilerplate lines
    (df ≥ min_df). One narrow shuffle; the filtered result is tiny."""
    import ray
    from ray.data.aggregate import Sum

    df = (docs_ds.map_batches(_partial_line_df, batch_format="pyarrow",
                              fn_kwargs={"text_col": text_col})
          .groupby("line").aggregate(Sum("partial_df", alias_name="df")))
    drop: set[str] = set()
    for t in df.iter_batches(batch_format="pyarrow"):
        mask = pa.compute.greater_equal(t.column("df"), min_df)
        drop.update(t.filter(mask).column("line").to_pylist())
        if len(drop) > DROP_SET_MAX:
            raise ValueError(
                f"boilerplate drop-set exceeds {DROP_SET_MAX}: min_df={min_df} "
                "is too low for this corpus")
    return ray.put(frozenset(drop))


#: Worker-process-global broadcast cache (pattern of
#: ``stages/topterms._WORKER_SCORER``).
_WORKER_DROP: tuple[str, frozenset] | None = None


def _clean_batch(batch: pa.Table, drop_ref, text_col: str) -> pa.Table:
    global _WORKER_DROP
    import ray

    key = drop_ref.hex()
    if _WORKER_DROP is None or _WORKER_DROP[0] != key:
        _WORKER_DROP = (key, ray.get(drop_ref))
    drop = _WORKER_DROP[1]
    urls, n_kept, n_dropped, digests = [], [], [], []
    for url, text in zip(batch.column("url").to_pylist(),
                         batch.column(text_col).to_pylist()):
        if not text:
            continue
        lines = text.split("\n")
        kept = [ln for ln in lines if ln not in drop]
        urls.append(url)
        n_kept.append(len(kept))
        n_dropped.append(len(lines) - len(kept))
        digests.append(hashlib.md5("\n".join(kept).encode()).hexdigest())
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(n_kept, pa.int64()),
         pa.array(n_dropped, pa.int64()), pa.array(digests, pa.string())],
        names=["url", "n_kept", "n_dropped", "kept_md5"],
    )


def boilerplate_line_dedup(docs_ds, min_df: int = DEFAULT_MIN_DF,
                           text_col: str = "extracted_text"):
    """docs (url, text) → per-doc (url, n_kept, n_dropped, kept_md5)
    after removing every line present in ≥ min_df distinct documents.

    ``kept_md5`` digests the cleaned text so the full rewrite is
    verifiable without shipping it; a production sink would emit the
    cleaned text column instead (same kernel, different projection).
    Documents whose text is empty are passed over (nothing to clean).
    """
    ref = boilerplate_lines_ref(docs_ds, min_df, text_col)
    return docs_ds.map_batches(_clean_batch, batch_format="pyarrow",
                               fn_kwargs={"drop_ref": ref, "text_col": text_col})
