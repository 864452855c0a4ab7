"""Deduplication operators over the ``documents`` table.

Exact dedup (hash-partition + per-group first), MinHash+LSH near-dup,
SimHash bucketing, and n-gram Jaccard verification — the training-data
curation counterparts of the engine's content-hash dedup
(``stages/dedup.py``; reference semantics
``/root/reference/docvision/azure/response_cache.py:66-91``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import (
    band_hashes,
    estimated_jaccard,
    exact_jaccard,
    minhash_params,
    minhash_signature,
    shingle_hashes,
    simhash64,
)


# -- exact dedup -------------------------------------------------------------

def add_text_md5(batch: pa.Table) -> pa.Table:
    """md5 of the raw text (md5 so the DuckDB oracle can reproduce it)."""
    hs = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
    return batch.append_column("text_hash", pa.array(hs, pa.string()))


def exact_dedup_docs(docs_ds):
    """documents → one representative (min doc_id) per distinct text,
    with the duplicate multiplicity. One shuffle on the hash key."""
    ds = docs_ds.map_batches(add_text_md5, batch_format="pyarrow")

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        return pd.DataFrame(
            {
                "text_hash": [g["text_hash"].iloc[0]],
                "rep_doc_id": [g["doc_id"].iloc[0]],
                "n_dups": [len(g)],
            }
        )

    return ds.groupby("text_hash").map_groups(first_per_group, batch_format="pandas")


# -- MinHash + LSH near-dup --------------------------------------------------

class MinHashStage:
    """Actor-pool stage: shingles → signature → LSH band rows.

    Emits (doc_id, band_id, band_hash, sig) — one row per band. Identical
    band_hash within a band_id ⇒ candidate pair (standard banding scheme).
    Signatures ride along so candidate verification after the band groupby
    needs no join back; at corpus scale you would instead hash-join
    signatures by doc_id (documented trade-off).
    """

    def __init__(self, num_hashes: int = 128, num_bands: int = 16, k_shingle: int = 5,
                 seed: int = 7) -> None:
        self.a, self.b = minhash_params(num_hashes, seed)
        self.num_bands = num_bands
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc, out_band, out_bh, out_sig = [], [], [], []
        for did, text in zip(doc_ids, texts):
            sig = minhash_signature(shingle_hashes(text or "", self.k), self.a, self.b)
            for band_id, bh in enumerate(band_hashes(sig, self.num_bands)):
                out_doc.append(did)
                out_band.append(band_id)
                out_bh.append(bh - (1 << 63))  # shift to signed int64 domain
                out_sig.append(sig.view(np.int64).tolist())
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.int64()),
                pa.array(out_band, pa.int32()),
                pa.array(out_bh, pa.int64()),
                pa.array(out_sig, pa.list_(pa.int64())),
            ],
            names=["doc_id", "band_id", "band_hash", "sig"],
        )


def _candidate_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
    """One (band_id, band_hash) bucket → candidate pairs with estimated
    Jaccard from the signatures."""
    if len(g) < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "est_jaccard": "float64"}
        )
    g = g.sort_values("doc_id").drop_duplicates("doc_id")
    ids = g["doc_id"].tolist()
    sigs = [np.array(s, dtype=np.int64).view(np.uint64) for s in g["sig"].tolist()]
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            rows.append((ids[i], ids[j], estimated_jaccard(sigs[i], sigs[j])))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_jaccard"])


def minhash_lsh_pairs(docs_ds, num_hashes: int = 128, num_bands: int = 16,
                      k_shingle: int = 5, min_est_jaccard: float = 0.5):
    """documents → near-duplicate candidate pairs (deduped across bands).

    shingle→minhash→band (map) → groupby(band) (shuffle #1) → pairs →
    groupby(pair) dedup (shuffle #2, tiny).
    """
    bands = docs_ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_hashes": num_hashes, "num_bands": num_bands,
                               "k_shingle": k_shingle},
        batch_format="pyarrow",
        concurrency=2,
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _candidate_pairs_group, batch_format="pandas"
    )

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    pairs = pairs.groupby(["doc_a", "doc_b"]).map_groups(dedup_pair, batch_format="pandas")
    return pairs.filter(lambda r: r["est_jaccard"] >= min_est_jaccard)


# -- SimHash -----------------------------------------------------------------

def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    vals = [simhash64(t or "") - (1 << 63) for t in texts]  # signed domain
    return pa.Table.from_arrays(
        [batch.column("doc_id"), pa.array(vals, pa.int64())],
        names=["doc_id", "simhash"],
    )


# -- n-gram Jaccard verification --------------------------------------------

def ngram_jaccard_verify(docs_ds, pairs_ds, k_shingle: int = 5, threshold: float = 0.5):
    """Verify candidate pairs with EXACT n-gram Jaccard. The (small)
    document text map is broadcast once via ``ray.put`` and read in every
    verify task — never re-shipped per batch."""
    import ray

    texts = {r["doc_id"]: r["text"] for r in docs_ds.select_columns(["doc_id", "text"]).take_all()}
    ref = ray.put(texts)

    class Verify:
        def __init__(self, ref, k, threshold):
            self.texts = ray.get(ref)
            self.k = k
            self.threshold = threshold
            self.cache: dict[int, np.ndarray] = {}

        def _sh(self, did: int) -> np.ndarray:
            if did not in self.cache:
                self.cache[did] = shingle_hashes(self.texts.get(did, "") or "", self.k)
            return self.cache[did]

        def __call__(self, batch: pa.Table) -> pa.Table:
            da = batch.column("doc_a").to_pylist()
            db = batch.column("doc_b").to_pylist()
            jac = [exact_jaccard(self._sh(a), self._sh(b)) for a, b in zip(da, db)]
            t = batch.append_column("jaccard", pa.array(jac, pa.float64()))
            import pyarrow.compute as pc
            return t.filter(pc.greater_equal(t.column("jaccard"), pa.scalar(self.threshold)))

    return pairs_ds.map_batches(
        Verify, fn_constructor_kwargs={"ref": ref, "k": k_shingle, "threshold": threshold},
        batch_format="pyarrow", concurrency=2,
    )
