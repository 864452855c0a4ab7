"""Scalar (int8-range) quantization of an embedding column — the
storage/bandwidth lever every vector pipeline applies before ANN
serving (fp32 → 1 byte/dim + one scale per vector, 4× smaller blocks
through the object store; the SemDeDup/IVF stages of ``stages/ann.py``
and ``stages/kmeans.py`` read the same column this stage compresses).

``emb_quantize`` maps each vector to symmetric max-abs codes:
``code[d] = round(x[d] * 127 / max_abs(vec))`` (half away from zero,
SQL ``round`` semantics), so codes live in [-127, 127] and dequant is
``code * max_abs / 127``. Per-vector scale — not per-corpus — keeps the
kernel embarrassingly parallel: ONE stateless ``map_batches`` pass,
zero shuffles, nothing on the driver at any corpus size.

Exactness across engines (the vecagg.py convention): the compare
surface is integer-only — the int64 code digests (sum, sum of squares,
min, max, n_dims) plus the scale fixed-pointed as ``max_abs_e6`` — and
the float work reproduces DuckDB's promotion order bit-exactly
(float32 abs/max per row, then ``float64(x) * 127.0 / float64(ma)``).

Zero vectors (ma == 0) quantize to all-zero codes rather than dividing
by zero; the oracle replays the same CASE guard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .vecagg import _batch_matrix, _round_half_away

EMB_SCALE = 1_000_000  # 1e-6 fixed point for the per-vector scale


def _codes_matrix(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, dim) float matrix → (int64 code matrix in [-127, 127],
    float64 per-row max-abs) with the pinned promotion order: float32
    abs/max per row first, then float64 for the scaled division."""
    mat32 = mat.astype(np.float32, copy=False)
    ma32 = np.abs(mat32).max(axis=1) if mat32.size else np.zeros(
        len(mat32), np.float32)
    ma64 = ma32.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        v = (mat32.astype(np.float64) * 127.0) / ma64[:, None]
    v = np.where(ma64[:, None] == 0.0, 0.0, v)
    return _round_half_away(v).astype(np.int64), ma64


def _quantize_batch(batch: pa.Table, id_col: str, emb_col: str) -> pa.Table:
    ids = batch.column(id_col).cast(pa.int64())
    mat = _batch_matrix(batch, emb_col)
    if mat.size == 0:
        # no rows, or every embedding list in the batch is empty —
        # either way one all-zero digest row per vector (the oracle
        # coalesces its NULL list aggregates to the same zeros), so
        # vec_ids are never silently dropped.
        zeros = pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        return pa.table({
            "vec_id": ids,
            "max_abs_e6": zeros,
            "n_dims": zeros,
            "code_sum": zeros,
            "code_sqsum": zeros,
            "code_min": zeros,
            "code_max": zeros,
        })
    codes, ma64 = _codes_matrix(mat)
    n, dim = codes.shape
    return pa.table({
        "vec_id": ids,
        "max_abs_e6": pa.array(
            _round_half_away(ma64 * EMB_SCALE).astype(np.int64), pa.int64()),
        "n_dims": pa.array(np.full(n, dim, np.int64), pa.int64()),
        "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
        "code_sqsum": pa.array((codes * codes).sum(axis=1), pa.int64()),
        "code_min": pa.array(codes.min(axis=1), pa.int64()),
        "code_max": pa.array(codes.max(axis=1), pa.int64()),
    })


def emb_quantize(emb_ds, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
    """embeddings → (vec_id, max_abs_e6, n_dims, code_sum, code_sqsum,
    code_min, code_max): per-vector symmetric int8 quantization digest
    (codes in [-127, 127], scale = max_abs/127)."""
    return emb_ds.map_batches(
        lambda t: _quantize_batch(t, id_col, emb_col),
        batch_format="pyarrow")


def quantized_topk(emb_ds, query: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", emb_col: str = "embedding"):
    """Top-k by INTEGER dot product of int8 codes — the similarity
    search the quantized column exists for (4× less object-store
    traffic than fp32 brute force, and the compare surface is exact
    int64: code·code scores have no float in them at all).

    Accepts a single vector or a (Q, dim) query MATRIX: with a matrix
    the result carries a leading int64 ``query_idx`` column (row index
    into the matrix) and rank is per query; a 1-D query keeps the
    original 3-column layout.

    Scale shape (the ``ann.brute_force_topk`` shape minus its per-query
    groupby): each batch quantizes locally against the broadcast
    quantized query matrix and emits ≤ Q·k partial rows; the per-block
    partials are folded ON THE DRIVER (``functions/collect.iter_tables``
    — the tiny-key monoid-fold idiom, no sort exchange for a Q·k-row
    merge). Returns a pyarrow Table of ``Q · min(k, n)`` rows with rank
    1-based by (score_q DESC, vec_id) within each query."""
    import ray

    from ..functions.collect import iter_tables

    query = np.asarray(query, dtype=np.float32)
    single = query.ndim == 1
    qcodes, _ = _codes_matrix(np.atleast_2d(query))
    qref = ray.put(qcodes)  # (Q, dim) int64 codes
    n_query = qcodes.shape[0]

    def partial_topk(batch: pa.Table) -> pa.Table:
        qc = ray.get(qref)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        empty = pa.table({"query_idx": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "score_q": pa.array([], pa.int64())})
        if len(ids) == 0:
            return empty
        mat = _batch_matrix(batch, emb_col)
        if mat.size == 0:
            # all-empty embedding lists: score 0 (the oracle's
            # coalesce), rows kept — the _quantize_batch invariant
            scores = np.zeros((len(ids), qc.shape[0]), np.int64)
        else:
            codes, _ = _codes_matrix(mat)
            scores = codes @ qc.T  # (batch, Q) exact int64
        take = min(k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            # partial top-k with the pinned (score DESC, vec_id ASC) order
            order = np.lexsort((ids, -col))[:take]
            out_q.append(np.full(take, qi, np.int64))
            out_id.append(ids[order])
            out_s.append(col[order])
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
            "score_q": pa.array(np.concatenate(out_s), pa.int64())})

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    tabs = list(iter_tables(partials))  # yields non-empty blocks only
    if tabs:
        merged = pa.concat_tables(tabs)
        qidx = merged.column("query_idx").to_numpy()
        ids = merged.column("vec_id").to_numpy()
        scores = merged.column("score_q").to_numpy()
    else:
        qidx = ids = scores = np.array([], np.int64)
    out_q, out_id, out_s, out_r = [], [], [], []
    for qi in range(n_query):
        m = qidx == qi
        order = np.lexsort((ids[m], -scores[m]))[:k]
        out_q.append(np.full(len(order), qi, np.int64))
        out_id.append(ids[m][order])
        out_s.append(scores[m][order])
        out_r.append(np.arange(1, len(order) + 1, dtype=np.int64))
    cols = {
        "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
        "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
        "score_q": pa.array(np.concatenate(out_s), pa.int64()),
        "rank": pa.array(np.concatenate(out_r), pa.int64()),
    }
    if single:
        cols.pop("query_idx")
    return pa.table(cols)
