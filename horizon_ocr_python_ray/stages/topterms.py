"""Per-document top-k distinctive terms via a two-phase document-
frequency aggregate + broadcast scoring pass.

The TF-IDF-shaped curation primitive (rank a document's terms by how
often they occur in it and how rare they are corpus-wide), with an
integer-exact ranking key ``(tf DESC, df ASC, term ASC)`` so the result
is bit-reproducible across engines — no ``ln()`` ulp drift in the
comparison surface (the real-valued tf·idf score is monotone in this
key for fixed tf, and the key is what any dedup/quality gate consumes).

Scale shape (100 TB):
- Phase 1 (DF) pre-aggregates INSIDE each batch — the shuffle carries
  one ``(term, partial_df)`` row per distinct term per batch, not one
  row per token occurrence; ``groupby(term).sum()`` finishes it.
- Phase 2 re-reads the docs and scores per document entirely locally:
  a document's terms all live in its own row, so top-k needs no second
  shuffle — only the DF table crosses the cluster.
- ``plan="auto"`` broadcasts the DF table via ``ray.put`` when it is
  small (bounded vocabulary) and otherwise switches to the fully
  distributed SHUFFLE-JOIN plan — explode ``(doc_id, term, tf)``, hash
  join the DF table on ``term``, regroup by ``doc_id`` for the local
  top-k. Same explicit-switch pattern as the MinHash candidate planner
  (``stages/dedup_docs.py``); both plans are tested byte-equal.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..functions.textstats import tokens
from ..functions.collect import iter_tables

#: Above this many distinct terms the broadcast plan refuses (a real
#: web-scale vocabulary needs the shuffle-join plan instead).
BROADCAST_VOCAB_MAX = 5_000_000


def _doc_terms(text: str) -> Counter:
    return Counter(t.lower() for t in tokens(text))


def _partial_df(batch: pa.Table) -> pa.Table:
    """Batch-local combiner: one output row per distinct term in the
    batch, counting how many of the batch's docs contain it."""
    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        counts.update(set(_doc_terms(text)))
    terms = sorted(counts)
    return pa.Table.from_arrays(
        [pa.array(terms, pa.string()),
         pa.array([counts[t] for t in terms], pa.int64())],
        names=["term", "partial_df"],
    )


def build_df_dataset(docs_ds):
    """documents → (term, df) dataset via the combiner + one narrow shuffle."""
    from ray.data.aggregate import Sum

    return (docs_ds.map_batches(_partial_df, batch_format="pyarrow")
            .groupby("term").aggregate(Sum("partial_df", alias_name="df")))


def build_df_table(docs_ds) -> "pa.Table":
    """documents → (term, df) Arrow table (small: the reduced vocabulary).

    The combiner already reduced each batch to one row per distinct term,
    so the final sum runs on the DRIVER with ``pyarrow`` ``group_by`` —
    the partial tables are exactly what a broadcast consumer must hold
    anyway, and skipping the distributed ``groupby(term)`` removes a full
    sort-shuffle round trip (measured 7 s → 0.5 s on a 5k-doc corpus).
    Partials are folded incrementally in chunks so driver memory stays
    O(vocabulary + chunk), and the broadcast bound is enforced on every
    fold. Raises when the vocabulary exceeds the bound — callers use
    ``plan="join"`` (or ``"auto"``) instead."""
    import ray

    empty = pa.table(
        {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})

    def _fold(tables: list[pa.Table]) -> pa.Table:
        merged = (pa.concat_tables(tables)
                  .group_by("term").aggregate([("df", "sum")])
                  .select(["term", "df_sum"]).rename_columns(["term", "df"]))
        if merged.num_rows > BROADCAST_VOCAB_MAX:
            raise ValueError(
                f"vocabulary {merged.num_rows} exceeds broadcast bound "
                f"{BROADCAST_VOCAB_MAX}; use plan='join' (explode (doc_id, "
                "term, tf) → hash join DF on term → groupby(doc_id) top-k)"
            )
        return merged

    partials = docs_ds.map_batches(_partial_df, batch_format="pyarrow")
    acc = empty
    chunk: list[pa.Table] = [acc]
    for t in iter_tables(partials):
        chunk.append(t.rename_columns(["term", "df"]))
        if len(chunk) >= 64:
            chunk = [_fold(chunk)]
    out = _fold(chunk) if len(chunk) > 1 else chunk[0]
    return out.sort_by("term") if out.num_rows else empty


class TopTermsScorer:
    """Broadcast-DF scorer: the DF dict deserializes once per worker
    (actor ``__init__`` / worker-global for the task form); each doc is
    scored locally against it."""

    def __init__(self, df_ref, k: int) -> None:
        import ray

        df_tbl = ray.get(df_ref)
        self.df = dict(zip(df_tbl.column("term").to_pylist(),
                           df_tbl.column("df").to_pylist()))
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, terms, tfs, dfs, ranks = [], [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            tf = _doc_terms(text)
            ranked = sorted(tf.items(), key=lambda kv: (-kv[1], self.df[kv[0]], kv[0]))
            for rank, (term, cnt) in enumerate(ranked[: self.k], start=1):
                ids.append(doc_id)
                terms.append(term)
                tfs.append(cnt)
                dfs.append(self.df[term])
                ranks.append(rank)
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(terms, pa.string()),
             pa.array(tfs, pa.int64()), pa.array(dfs, pa.int64()),
             pa.array(ranks, pa.int64())],
            names=["doc_id", "term", "tf", "df", "rank"],
        )


#: Worker-process-global scorer for the task-based stage (same reuse
#: pattern as ``stages/extract_stage._WORKER_EXTRACTOR``): Ray reuses
#: task workers, so the broadcast DF dict deserializes once per worker
#: instead of once per 4-actor pool member — and the stage scales to
#: every CPU in the cluster with zero actor-spawn latency.
_WORKER_SCORER: tuple[str, TopTermsScorer] | None = None


def _score_batch_task(batch: pa.Table, df_ref, k: int) -> pa.Table:
    global _WORKER_SCORER
    key = df_ref.hex()
    if _WORKER_SCORER is None or _WORKER_SCORER[0] != key or _WORKER_SCORER[1].k != k:
        _WORKER_SCORER = (key, TopTermsScorer(df_ref, k))
    return _WORKER_SCORER[1](batch)


def _explode_tf(batch: pa.Table) -> pa.Table:
    """One row per (doc, distinct term): the join plan's left side."""
    ids, terms, tfs = [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        for term, cnt in _doc_terms(text).items():
            ids.append(doc_id)
            terms.append(term)
            tfs.append(cnt)
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(terms, pa.string()),
         pa.array(tfs, pa.int64())],
        names=["doc_id", "term", "tf"],
    )


def _topk_in_doc(group: pa.Table, k: int) -> pa.Table:
    import pyarrow.compute as pc

    order = pc.sort_indices(group, sort_keys=[("tf", "descending"),
                                              ("df", "ascending"),
                                              ("term", "ascending")])
    kept = group.take(order[:k])
    return kept.append_column(
        "rank", pa.array(range(1, kept.num_rows + 1), pa.int64()))


def _partial_tf(batch: pa.Table) -> pa.Table:
    """Batch-local combiner counting token OCCURRENCES (not DF): one
    output row per distinct term per batch."""
    counts: Counter = Counter()
    for text in batch.column("text").to_pylist():
        counts.update(_doc_terms(text))
    terms = sorted(counts)
    return pa.Table.from_arrays(
        [pa.array(terms, pa.string()),
         pa.array([counts[t] for t in terms], pa.int64())],
        names=["term", "partial_df"],   # reuse the fold's column contract
    )


def build_rank_table(docs_ds) -> "pa.Table":
    """Corpus frequency ranks: (term, rank) with rank 1 = most frequent,
    ties broken by term ASC — the integer-exact stand-in for a unigram
    LM's log-probability order (CCNet-style quality scoring without a
    transcendental in the compare surface). Same driver fold + vocab
    guard as :func:`build_df_table`."""
    import numpy as np
    import ray

    empty = pa.table(
        {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())})

    def _fold(tables: list[pa.Table]) -> pa.Table:
        merged = (pa.concat_tables(tables)
                  .group_by("term").aggregate([("df", "sum")])
                  .select(["term", "df_sum"]).rename_columns(["term", "df"]))
        if merged.num_rows > BROADCAST_VOCAB_MAX:
            raise ValueError(
                f"vocabulary {merged.num_rows} exceeds broadcast bound "
                f"{BROADCAST_VOCAB_MAX}; shuffle-join the rank table on "
                "term instead (the doc_top_terms plan='join' shape)")
        return merged

    partials = docs_ds.map_batches(_partial_tf, batch_format="pyarrow")
    acc = [empty]
    for t in iter_tables(partials):
        acc.append(t.rename_columns(["term", "df"]))
        if len(acc) >= 64:
            acc = [_fold(acc)]
    tf = _fold(acc) if len(acc) > 1 else acc[0]
    if not tf.num_rows:
        return pa.table({"term": pa.array([], pa.string()),
                         "rank": pa.array([], pa.int64())})
    import pyarrow.compute as pc

    order = pc.sort_indices(tf, sort_keys=[("df", "descending"),
                                           ("term", "ascending")])
    ranked = tf.take(order)
    return pa.table({"term": ranked.column("term"),
                     "rank": pa.array(np.arange(1, ranked.num_rows + 1),
                                      pa.int64())})


def doc_mean_rank(docs_ds, rank_docs_ds=None):
    """Corpus-relative fluency score per document: the sum (and count)
    of each token occurrence's corpus frequency RANK — a low mean rank
    means the document is made of common words (fluent-ish), a high one
    flags gibberish/rare-token soup. The integer (rank_sum, n_tokens)
    pair is the compare surface; consumers divide for the mean.

    Two passes: the rank table folds from per-batch occurrence
    combiners on the driver (vocab-guarded, the top-terms pattern) and
    broadcasts via ``ray.put``; scoring is then one stateless
    ``map_batches`` — zero shuffles end to end."""
    import ray

    rank_tbl = build_rank_table(rank_docs_ds or docs_ds)
    rref = ray.put(rank_tbl)

    def score(batch: pa.Table) -> pa.Table:
        tbl = ray.get(rref)
        ranks = dict(zip(tbl.column("term").to_pylist(),
                         tbl.column("rank").to_pylist()))
        ids, ns, sums = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = [t.lower() for t in tokens(text)]
            ids.append(doc_id)
            ns.append(len(toks))
            sums.append(sum(ranks[t] for t in toks))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(ns, pa.int64()),
                         "rank_sum": pa.array(sums, pa.int64())})

    return docs_ds.map_batches(score, batch_format="pyarrow", batch_size=256)


def doc_top_terms(docs_ds, k: int = 3, concurrency: tuple[int, int] = (1, 4),
                  plan: str = "auto", num_partitions: int = 8):
    """documents (doc_id, text) → top-k terms per doc by
    (tf DESC, df ASC, term ASC).

    ``plan``: ``"broadcast"`` ships the DF table to every scorer actor
    (right for bounded vocabularies); ``"join"`` is the fully distributed
    path for web-scale vocabularies — explode (doc_id, term, tf), hash
    join DF on term, regroup by doc_id for the local top-k (two extra
    shuffles, zero driver state); ``"auto"`` tries broadcast and falls
    back to join above ``BROADCAST_VOCAB_MAX``. Both plans are tested
    byte-equal (``tests/test_topterms.py``).
    """
    import ray

    if plan == "auto":
        try:
            df_tbl = build_df_table(docs_ds)
            plan = "broadcast"
        except ValueError:
            plan = "join"
    elif plan == "broadcast":
        df_tbl = build_df_table(docs_ds)

    if plan == "broadcast":
        df_ref = ray.put(df_tbl)
        return docs_ds.map_batches(
            _score_batch_task,
            fn_kwargs={"df_ref": df_ref, "k": k},
            batch_format="pyarrow",
            batch_size=256,
        )
    if plan != "join":
        raise ValueError(f"unknown plan {plan!r}; expected auto|broadcast|join")

    tf_rows = docs_ds.map_batches(_explode_tf, batch_format="pyarrow")
    joined = tf_rows.join(
        build_df_dataset(docs_ds), join_type="inner",
        num_partitions=num_partitions, on=("term",),
    )
    out = joined.groupby("doc_id").map_groups(
        lambda g: _topk_in_doc(g, k), batch_format="pyarrow")
    return out.map_batches(
        lambda t: t.select(["doc_id", "term", "tf", "df", "rank"]),
        batch_format="pyarrow",
    )
