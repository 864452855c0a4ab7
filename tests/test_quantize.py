"""Scalar embedding quantization (stages/quantize.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from horizon_ocr_python_ray.stages.quantize import (
    _codes_matrix,
    emb_quantize,
    quantized_topk,
)


def _emb(vectors, ids=None):
    ids = ids or list(range(1, len(vectors) + 1))
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([[float(x) for x in v] for v in vectors],
                              pa.list_(pa.float32())),
    })).repartition(2)


def _run(vectors, ids=None):
    return (emb_quantize(_emb(vectors, ids))
            .to_pandas().set_index("vec_id").sort_index())


def test_codes_match_naive_quantization():
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    out = _run(vecs.tolist())
    for i, v in enumerate(vecs, start=1):
        ma = np.abs(v).max()
        scaled = v.astype(np.float64) * 127.0 / np.float64(ma)
        codes = np.where(scaled >= 0, np.floor(scaled + 0.5),
                         np.ceil(scaled - 0.5)).astype(np.int64)
        assert out.loc[i, "code_sum"] == codes.sum()
        assert out.loc[i, "code_sqsum"] == (codes * codes).sum()
        assert out.loc[i, "code_min"] == codes.min()
        assert out.loc[i, "code_max"] == codes.max()
        assert out.loc[i, "n_dims"] == 8


def test_codes_stay_in_int8_range():
    rng = np.random.default_rng(11)
    out = _run((rng.normal(size=(50, 16)) * 100).tolist())
    assert (out.code_max <= 127).all()
    assert (out.code_min >= -127).all()
    # the max-abs element always quantizes to ±127
    assert ((out.code_max == 127) | (out.code_min == -127)).all()


def test_zero_vector_quantizes_to_zero_codes():
    out = _run([[0.0, 0.0, 0.0], [1.0, -2.0, 0.5]])
    assert out.loc[1, "max_abs_e6"] == 0
    assert out.loc[1, "code_sum"] == 0 and out.loc[1, "code_sqsum"] == 0
    assert out.loc[2, "max_abs_e6"] == 2_000_000
    assert out.loc[2, "code_min"] == -127


def test_empty_embeddings_keep_their_rows():
    out = _run([[], []])
    assert list(out.index) == [1, 2]
    assert (out.n_dims == 0).all()
    assert (out[["max_abs_e6", "code_sum", "code_sqsum",
                 "code_min", "code_max"]] == 0).all().all()


def test_scale_is_per_vector_not_global():
    # same direction, different magnitude → identical codes
    out = _run([[1.0, 0.5, -0.25], [100.0, 50.0, -25.0]])
    a, b = out.loc[1], out.loc[2]
    assert a.code_sum == b.code_sum and a.code_sqsum == b.code_sqsum
    assert a.max_abs_e6 != b.max_abs_e6


def test_quantized_topk_matches_naive_int_ranking():
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    q = vecs[0]
    out = quantized_topk(_emb(vecs.tolist()), q, k=7).to_pandas()
    codes, _ = _codes_matrix(vecs)
    qc, _ = _codes_matrix(np.atleast_2d(q))
    scores = codes @ qc[0]
    ids = np.arange(1, 41)
    order = np.lexsort((ids, -scores))[:7]
    assert out.vec_id.tolist() == ids[order].tolist()
    assert out.score_q.tolist() == scores[order].tolist()
    assert out.loc[0, "vec_id"] == 1  # the query matches itself first
    assert out["rank"].tolist() == list(range(1, 8))


def test_quantized_topk_tiebreak_is_vec_id():
    # identical vectors → identical scores; rank order = vec_id
    out = quantized_topk(_emb([[1.0, 2.0]] * 5), [1.0, 2.0],
                         k=3).to_pandas()
    assert out.vec_id.tolist() == [1, 2, 3]


def test_quantized_topk_batch_matches_per_query():
    import numpy as np
    import ray.data

    from horizon_ocr_python_ray.stages.quantize import quantized_topk

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"])
    rows = ds.sort("vec_id").take(3)
    qmat = np.array([r["embedding"] for r in rows], dtype=np.float32)
    batched = quantized_topk(ds, qmat, k=5).to_pandas()
    assert list(batched.columns) == ["query_idx", "vec_id", "score_q",
                                     "rank"]
    for qi in range(3):
        single = quantized_topk(ds, qmat[qi], k=5).to_pandas()
        assert list(single.columns) == ["vec_id", "score_q", "rank"]
        mine = batched[batched["query_idx"] == qi].reset_index(drop=True)
        assert mine["vec_id"].tolist() == single["vec_id"].tolist()
        assert mine["score_q"].tolist() == single["score_q"].tolist()
