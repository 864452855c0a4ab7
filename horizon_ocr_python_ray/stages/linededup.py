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
from ..functions.collect import iter_tables

#: Default document-frequency threshold: a line present in this many
#: distinct documents is boilerplate.
DEFAULT_MIN_DF = 5

#: Refuse to broadcast a drop-set of Python STRINGS larger than this —
#: a 2M-line frozenset is ~100s of MB deserialized per worker process;
#: anything bigger must use the hash64 representation (or K is far too
#: low for the corpus).
DROP_SET_MAX = 2_000_000

#: Cap for the hash64 drop-set representation: a sorted uint64 numpy
#: array costs 8 bytes/line (160 MB at cap) and probes vectorized via
#: ``searchsorted`` — the 100-TB representation.
DROP_HASH_MAX = 20_000_000


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


#: Distinct-line bound for the driver-fold DF plan (``plan="auto"``):
#: above this the line vocabulary is folded through the distributed
#: ``groupby(line)`` shuffle instead.
DRIVER_FOLD_LINE_MAX = 5_000_000


def _line_df_table_driver_fold(partials) -> pa.Table:
    """Fold the batch-local (line, partial_df) combiner outputs on the
    driver with pyarrow ``group_by`` — skips the distributed
    ``groupby(line)`` sort-shuffle (measured 8.6 s → ~3 s at sf0.1,
    where the shuffle dominated). Memory stays O(distinct lines +
    chunk); the bound is enforced on every fold and a breach falls back
    to the shuffle plan (same switch pattern as
    ``stages/topterms.build_df_table``)."""
    import ray

    def _fold(tables: list[pa.Table]) -> pa.Table:
        merged = (pa.concat_tables(tables)
                  .group_by("line").aggregate([("df", "sum")])
                  .select(["line", "df_sum"]).rename_columns(["line", "df"]))
        if merged.num_rows > DRIVER_FOLD_LINE_MAX:
            raise _FoldOverflow()
        return merged

    empty = pa.table(
        {"line": pa.array([], pa.string()), "df": pa.array([], pa.int64())})
    chunk: list[pa.Table] = [empty]
    for t in iter_tables(partials):
        chunk.append(t.rename_columns(["line", "df"]))
        if len(chunk) >= 64:
            chunk = [_fold(chunk)]
    return _fold(chunk) if len(chunk) > 1 else chunk[0]


class _FoldOverflow(Exception):
    pass


def boilerplate_lines_ref(docs_ds, min_df: int = DEFAULT_MIN_DF,
                          text_col: str = "extracted_text",
                          plan: str = "auto"):
    """docs → ``ray.put`` handle of the frozenset of boilerplate lines
    (df ≥ min_df).

    ``plan="auto"`` folds the combiner partials on the driver (no
    shuffle) while the distinct-line vocabulary fits
    :data:`DRIVER_FOLD_LINE_MAX`, else — or with ``plan="shuffle"`` —
    runs the distributed ``groupby(line).sum`` and collects only the
    filtered drop-set. Both plans produce the identical set (tested)."""
    import ray

    partials = docs_ds.map_batches(_partial_line_df, batch_format="pyarrow",
                                   fn_kwargs={"text_col": text_col})
    drop: set[str] = set()
    if plan == "auto":
        try:
            df_tbl = _line_df_table_driver_fold(partials)
        except _FoldOverflow:
            plan = "shuffle"
        else:
            mask = pa.compute.greater_equal(df_tbl.column("df"), min_df)
            drop = set(df_tbl.filter(mask).column("line").to_pylist())
    if plan == "shuffle":
        from ray.data.aggregate import Sum

        df = partials.groupby("line").aggregate(Sum("partial_df", alias_name="df"))
        drop = set()
        for t in df.iter_batches(batch_format="pyarrow"):
            mask = pa.compute.greater_equal(t.column("df"), min_df)
            drop.update(t.filter(mask).column("line").to_pylist())
            if len(drop) > DROP_SET_MAX:
                raise ValueError(
                    f"boilerplate drop-set exceeds {DROP_SET_MAX}: "
                    f"min_df={min_df} is too low for this corpus")
    if len(drop) > DROP_SET_MAX:
        raise ValueError(
            f"boilerplate drop-set exceeds {DROP_SET_MAX}: min_df={min_df} "
            "is too low for this corpus; use drop_repr='hash64'")
    return ray.put(frozenset(drop))


def boilerplate_hashes_ref(docs_ds, min_df: int = DEFAULT_MIN_DF,
                           text_col: str = "extracted_text"):
    """docs → ``ray.put`` handle of a SORTED uint64 array of hash64
    values (``functions/fasthash.py``) of the boilerplate lines — the
    scale representation: 8 bytes/line broadcast, vectorized
    ``searchsorted`` probe, capped at :data:`DROP_HASH_MAX`.

    The drop decision becomes hash-based: with |drop| = 2·10⁷ and 64-bit
    hashes the chance ANY innocent corpus line collides into the set is
    ~|corpus|·|drop|/2⁶⁴ (≈ 1e-5 even at 10¹² lines) — documented,
    non-exact; the string plan stays the exactness default under its
    cap."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from ..functions.fasthash import hash64_bytes_column

    partials = docs_ds.map_batches(_partial_line_df, batch_format="pyarrow",
                                   fn_kwargs={"text_col": text_col})
    df = partials.groupby("line").aggregate(Sum("partial_df", alias_name="df"))
    chunks: list = []
    total = 0
    for t in df.iter_batches(batch_format="pyarrow"):
        if t.num_rows == 0 or "line" not in t.column_names:
            continue
        mask = pa.compute.greater_equal(t.column("df"), min_df)
        kept = t.filter(mask)
        if kept.num_rows:
            chunks.append(hash64_bytes_column(kept.column("line")))
            total += kept.num_rows
            if total > DROP_HASH_MAX:
                raise ValueError(
                    f"boilerplate drop-set exceeds DROP_HASH_MAX="
                    f"{DROP_HASH_MAX}: min_df={min_df} is too low for "
                    "this corpus")
    arr = (np.sort(np.concatenate(chunks)) if chunks
           else np.empty(0, np.uint64))
    return ray.put(arr)


#: Worker-process-global broadcast cache (pattern of
#: ``stages/topterms._WORKER_SCORER``).
_WORKER_DROP: tuple[str, frozenset] | None = None


def _clean_batch_hash(batch: pa.Table, drop, text_col: str) -> pa.Table:
    """Hash64 drop-set probe, fully vectorized: split lines with one
    Arrow kernel, hash the FLAT line array, binary-search the sorted
    drop array, reassemble kept lines per doc with ``binary_join``."""
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.fasthash import hash64_bytes_column

    texts = batch.column(text_col)
    nonempty = pc.and_(pc.is_valid(texts),
                       pc.not_equal(pc.fill_null(texts, ""), ""))
    t = batch.filter(nonempty)
    if t.num_rows == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "n_kept": pa.array([], pa.int64()),
                         "n_dropped": pa.array([], pa.int64()),
                         "kept_md5": pa.array([], pa.string())})
    lines = pc.split_pattern(t.column(text_col), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    flat = lines.flatten()
    offsets = np.asarray(lines.offsets).astype(np.int64)
    offsets = offsets - offsets[0]
    h = hash64_bytes_column(flat)
    if len(drop):
        idx = np.clip(np.searchsorted(drop, h), 0, len(drop) - 1)
        keep = drop[idx] != h
    else:
        keep = np.ones(len(h), bool)
    n_lines = np.diff(offsets)
    doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), n_lines)
    n_kept = np.bincount(doc_of[keep], minlength=t.num_rows)
    new_off = np.zeros(t.num_rows + 1, np.int64)
    np.cumsum(n_kept, out=new_off[1:])
    kept_list = pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), flat.filter(pa.array(keep)))
    joined = pc.binary_join(kept_list, "\n")
    digests = [hashlib.md5(s.encode()).hexdigest()
               for s in joined.to_pylist()]
    return pa.Table.from_arrays(
        [t.column("url"),
         pa.array(n_kept.astype(np.int64), pa.int64()),
         pa.array((n_lines - n_kept).astype(np.int64), pa.int64()),
         pa.array(digests, pa.string())],
        names=["url", "n_kept", "n_dropped", "kept_md5"],
    )


def _clean_batch(batch: pa.Table, drop_ref, text_col: str) -> pa.Table:
    global _WORKER_DROP
    import numpy as np
    import ray

    key = drop_ref.hex()
    if _WORKER_DROP is None or _WORKER_DROP[0] != key:
        _WORKER_DROP = (key, ray.get(drop_ref))
    drop = _WORKER_DROP[1]
    if isinstance(drop, np.ndarray):
        return _clean_batch_hash(batch, drop, text_col)
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
                           text_col: str = "extracted_text",
                           plan: str = "auto", drop_repr: str = "strings"):
    """docs (url, text) → per-doc (url, n_kept, n_dropped, kept_md5)
    after removing every line present in ≥ min_df distinct documents.

    ``kept_md5`` digests the cleaned text so the full rewrite is
    verifiable without shipping it; a production sink would emit the
    cleaned text column instead (same kernel, different projection).
    Documents whose text is empty are passed over (nothing to clean).

    ``drop_repr``: ``"strings"`` (exact membership, the oracle-backed
    default, capped at :data:`DROP_SET_MAX`) or ``"hash64"`` (sorted
    uint64 array + vectorized ``searchsorted`` probe — 8 bytes/line,
    :data:`DROP_HASH_MAX` cap, documented ~2⁻⁶⁴-per-comparison
    collision odds; the 100-TB representation)."""
    if drop_repr == "hash64":
        ref = boilerplate_hashes_ref(docs_ds, min_df, text_col)
    elif drop_repr == "strings":
        ref = boilerplate_lines_ref(docs_ds, min_df, text_col, plan=plan)
    else:
        raise ValueError(f"unknown drop_repr {drop_repr!r}; "
                         "expected strings|hash64")
    return docs_ds.map_batches(_clean_batch, batch_format="pyarrow",
                               fn_kwargs={"drop_ref": ref, "text_col": text_col})
