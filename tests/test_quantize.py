"""Tests for int8 embedding quantization (operators/quantize.py): the
scale/2 error bound, ANN recall through the quantized representation."""

from __future__ import annotations

import numpy as np

from clp_spark.operators import quantize as QZ
from clp_spark.operators import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_quantize_error_bound(spark):
    out = QZ.dequantize_embeddings(QZ.quantize_embeddings(_emb(spark))).collect()
    for r in out:
        x = np.asarray(r["embedding"], dtype=np.float64)
        d = np.asarray(r["embedding_deq"], dtype=np.float64)
        bound = r["q_scale"] / 2 + 1e-12
        assert np.abs(x - d).max() <= bound, r["vec_id"]
        assert max(abs(v) for v in r["q"]) <= 127


def test_quantize_zero_vector(spark):
    d = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    r = QZ.dequantize_embeddings(QZ.quantize_embeddings(d)).collect()[0]
    assert r["q_scale"] == 0.0
    assert r["embedding_deq"] == [0.0, 0.0, 0.0]


def test_quantize_ragged_and_empty_fail_loud(spark):
    """Ragged or zero-length vectors raise a clear ValueError from the
    executor instead of an opaque numpy/Arrow error."""
    import pytest

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    ).coalesce(1)  # same Arrow batch, so the ragged stack is visible
    with pytest.raises(Exception, match="fixed-dimension non-empty"):
        QZ.quantize_embeddings(ragged).collect()
    empty = spark.createDataFrame(
        [(1, [])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="fixed-dimension non-empty"):
        QZ.quantize_embeddings(empty).collect()


def test_quantized_ann_recall(spark):
    """Top-10 cosine neighbors computed on dequantized int8 vectors overlap
    the exact float top-10 almost entirely (int8 distortion is tiny at
    d=64)."""
    e = _emb(spark)
    q = (
        QZ.dequantize_embeddings(QZ.quantize_embeddings(e))
        .select("vec_id", "embedding_deq")
        .withColumnRenamed("embedding_deq", "embedding")
    )
    qvec = np.asarray(
        e.where("vec_id = 0").collect()[0]["embedding"], dtype=np.float64
    )
    exact = {r["vec_id"] for r in SIM.cosine_topk(e, qvec, k=10).collect()}
    approx = {r["vec_id"] for r in SIM.cosine_topk(q, qvec, k=10).collect()}
    assert len(exact & approx) >= 9
