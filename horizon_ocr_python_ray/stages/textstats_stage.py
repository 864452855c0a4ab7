"""Text-analysis stages over the ``documents`` table.

Stateless ``map_batches`` bodies wrapping the kernels in
``functions/textstats.py``. Column names match the SQL oracles in
``__ray_entry__.oracle_sql`` exactly (driver hash-compares by name).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    bpe_token_count,
    lang_id,
    quality_features,
    rolling_fingerprint,
    token_count,
)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array([token_count(t) for t in texts], pa.int64()),
            pa.array([bpe_token_count(t) for t in texts], pa.int64()),
            pa.array([len(t or "") for t in texts], pa.int64()),
        ],
        names=["doc_id", "n_tokens", "n_bpe_tokens", "n_chars_computed"],
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    feats = [quality_features(t) for t in texts]
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array([int(f["n_tokens"]) for f in feats], pa.int64()),
            pa.array([f["punct_ratio"] for f in feats], pa.float64()),
            pa.array([f["stopword_ratio"] for f in feats], pa.float64()),
            pa.array([f["mean_word_len"] for f in feats], pa.float64()),
        ],
        names=["doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_word_len"],
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            pa.array([lang_id(t) for t in texts], pa.string()),
        ],
        names=["doc_id", "pred_lang"],
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.Table.from_arrays(
        [
            batch.column("doc_id"),
            # hex string: avoids int64 sign pitfalls across engines
            pa.array([f"{rolling_fingerprint(t):016x}" for t in texts], pa.string()),
        ],
        names=["doc_id", "fingerprint"],
    )


def lang_confusion(docs_ds):
    """(label lang × detected lang) document counts — the eval-style
    confusion matrix over the corpus's language labels. Batch-local
    combiner (one row per (lang, pred) pair per batch) → tiny
    ``groupby.sum``: the shuffle carries at most |langs|² rows per
    batch, never documents."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        preds = [lang_id(t) for t in batch.column("text").to_pylist()]
        t = pa.table({"lang": batch.column("lang"),
                      "pred_lang": pa.array(preds, pa.string())})
        agg = pa.TableGroupBy(t, ["lang", "pred_lang"]).aggregate([([], "count_all")])
        return agg.rename_columns(["lang", "pred_lang", "part"])

    out = (docs_ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["lang", "pred_lang"])
           .aggregate(Sum("part", alias_name="n_docs")))
    return out.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("lang"), t.column("pred_lang"),
             t.column("n_docs").cast(pa.int64())],
            names=["lang", "pred_lang", "n_docs"]),
        batch_format="pyarrow",
    )
