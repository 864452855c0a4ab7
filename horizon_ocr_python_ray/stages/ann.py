"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — numpy matmul per batch against a
broadcast query matrix (``ray.put`` once, read per actor), per-batch
partial top-k, tiny global merge. The scale path is the LSH-bucketed
variant: random-hyperplane signatures bucket vectors so each query only
scans its bucket (an IVF-style restriction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Per-batch partial top-k against the broadcast query matrix."""

    def __init__(self, query_ref, k: int) -> None:
        q = ray.get(query_ref)  # (n_query, dim) float64 — fetched once per actor
        self.qn = _normalize(q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _batch_matrix(batch)
        sims = _normalize(emb) @ self.qn.T  # (batch, n_query)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            k = min(self.k, len(col))
            # partial top-k, ties broken by vec_id ascending
            idx = np.lexsort((ids, -col))[:k]
            out_q.extend([qi] * k)
            out_id.extend(ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.Table.from_arrays(
            [pa.array(out_q, pa.int32()), pa.array(out_id, pa.int64()),
             pa.array(out_s, pa.float64())],
            names=["query_idx", "vec_id", "score"],
        )


def brute_force_topk(emb_ds, query: np.ndarray, k: int = 10):
    """embeddings dataset → top-k rows per query: (query_idx, vec_id, score).

    The global merge is a per-query groupby over the tiny partial-top-k
    set (≤ k rows per batch per query), not a full sort of the corpus.
    """
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    ref = ray.put(query)
    partials = emb_ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs={"query_ref": ref, "k": k},
        batch_format="pyarrow", concurrency=2, batch_size=4096,
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partials.groupby("query_idx").map_groups(merge, batch_format="pandas")


class HyperplaneLSH:
    """Random-hyperplane signature stage: adds a ``bucket`` column.

    Vectors sharing a bucket are cosine-close with high probability; a
    query is answered by scanning only its bucket (plus optionally the
    Hamming-1 neighbor buckets). Deterministic planes from a fixed seed.
    """

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11) -> None:
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        _, emb = _batch_matrix(batch)
        return batch.append_column("bucket", pa.array(self.bucket_of(emb), pa.int64()))


def lsh_bucketed_topk(emb_ds, query: np.ndarray, k: int = 10, dim: int = 64,
                      n_planes: int = 8):
    """Scale path: restrict the scan to the query's LSH bucket. Recall is
    approximate (tested against brute force for overlap, not equality)."""
    query = np.atleast_2d(np.asarray(query, dtype=np.float64))
    lsh = HyperplaneLSH(dim, n_planes)
    qbuckets = set(lsh.bucket_of(query).tolist())
    bucketed = emb_ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=2,
    )
    import pyarrow.compute as pc

    candidates = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t.column("bucket"), value_set=pa.array(sorted(qbuckets)))),
        batch_format="pyarrow",
    )
    return brute_force_topk(candidates.drop_columns(["bucket"]), query, k)


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95):
    """Embedding-cosine near-duplicate pairs: all (a < b) with cosine ≥
    threshold.

    Exact variant: the normalized corpus matrix is broadcast once via
    ``ray.put`` and each batch computes ``batch × corpusᵀ`` with one numpy
    matmul — O(n²) flops but fully vectorized and embarrassingly parallel
    across batches. The scale path replaces the broadcast matrix with LSH
    bucketing (:class:`HyperplaneLSH` + within-bucket pairs) at the cost
    of recall; at 100 TB you would also shard the right-hand side and
    sweep shards per batch (block-matmul join).
    """
    rows = emb_ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _normalize(np.array([rows[i]["embedding"] for i in order], dtype=np.float64))
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self, ref, threshold):
            self.ids, self.mat = ray.get(ref)  # fetched once per worker
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids, bemb = _batch_matrix(batch)
            sims = _normalize(bemb) @ self.mat.T  # (batch, corpus)
            rows_i, cols_j = np.nonzero(sims >= self.threshold)
            keep = bids[rows_i] < self.ids[cols_j]  # a < b, drops self-pairs
            rows_i, cols_j = rows_i[keep], cols_j[keep]
            return pa.Table.from_arrays(
                [
                    pa.array(bids[rows_i], pa.int64()),
                    pa.array(self.ids[cols_j], pa.int64()),
                    pa.array(np.round(sims[rows_i, cols_j] * 1e6).astype(np.int64), pa.int64()),
                ],
                names=["vec_a", "vec_b", "sim_e6"],
            )

    return emb_ds.map_batches(
        PairFinder, fn_constructor_kwargs={"ref": ref, "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8),
    )


def embedding_near_dup_pairs_lsh(emb_ds, threshold: float = 0.95, dim: int = 64,
                                 n_planes: int = 12):
    """Approximate near-dup pairs: bucket by random-hyperplane signature,
    compare only within buckets (``groupby(bucket)``). Misses pairs whose
    members land in different buckets — recall is tested against the
    exact variant, not equality."""
    import pandas as pd

    bucketed = emb_ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=2,
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.Series(dtype="int64"),
                                 "vec_b": pd.Series(dtype="int64"),
                                 "sim_e6": pd.Series(dtype="int64")})
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        mat = _normalize(np.array(g["embedding"].tolist(), dtype=np.float64))
        sims = mat @ mat.T
        i, j = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "vec_a": ids[i], "vec_b": ids[j],
            "sim_e6": np.round(sims[i, j] * 1e6).astype(np.int64),
        })

    return bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
