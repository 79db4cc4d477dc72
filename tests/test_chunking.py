"""Tests for token-window chunking (operators/chunking.py): boundary
arithmetic, reconstruction, fan-out shape, and the zero-shuffle plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from clp_spark.operators.chunking import chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_windows(spark):
    # 11 tokens, chunk 5, stride 3 -> starts 0,3,6,9
    text = "a b c d e f g h i j k"
    out = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(_mk(spark, [(1, text)]), 5, 3).collect()
    )
    assert out == [
        (0, "a b c d e", 5),
        (1, "d e f g h", 5),
        (2, "g h i j k", 5),
        (3, "j k", 2),
    ]


def test_empty_and_whitespace_only_docs_emit_nothing(spark):
    out = chunk_documents(_mk(spark, [(1, ""), (2, "   \t\n "), (3, "x")]), 4, 4)
    rows = out.collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(3, "x")]


def test_short_doc_single_chunk(spark):
    rows = chunk_documents(_mk(spark, [(7, "only three tokens")]), 64, 48).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_idx"] == 0
    assert rows[0]["chunk_text"] == "only three tokens"
    assert rows[0]["n_tokens"] == 3


def test_nonoverlapping_chunks_reconstruct_document(spark):
    """stride == chunk_tokens partitions the token sequence exactly: the
    idx-ordered concatenation equals the whitespace-normalized text."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    ch = chunk_documents(docs, 16, 16, id_col="doc_id")
    rebuilt = {
        r["doc_id"]: r["t"]
        for r in ch.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("t")
        )
        .collect()
    }
    for row in docs.collect():
        norm = " ".join(
            t for t in re.split("[ \t\n\r\f\x0b]+", row["text"]) if t
        )
        if norm:
            assert rebuilt[row["doc_id"]] == norm


def test_overlap_suffix_prefix_property(spark):
    """Consecutive chunks share chunk-stride tokens: chunk i's tokens from
    position stride onward are a prefix of chunk i+1."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    ch = chunk_documents(docs, 12, 8).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in ch:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk_text"].split(" ")
    for chunks in by_doc.values():
        assert sorted(chunks) == list(range(len(chunks)))  # contiguous idx
        for i in range(len(chunks) - 1):
            tail = chunks[i][8:]
            assert chunks[i + 1][: len(tail)] == tail


def test_fanout_row_count(spark):
    """ceil(n/stride) rows per non-empty doc."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_chunks = chunk_documents(docs, 32, 24).count()
    toks = docs.select(
        F.size(
            F.filter(
                F.split("text", r"[ \t\n\r\f\x0B]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("n")
    )
    expected = toks.where("n > 0").select(
        F.sum(F.ceil(F.col("n") / 24)).alias("s")
    ).collect()[0]["s"]
    assert n_chunks == expected


def test_plan_has_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = chunk_documents(docs, 64, 48)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize("chunk,stride", [(0, 1), (1, 0), (-2, 4)])
def test_invalid_params_raise(spark, chunk, stride):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk, stride)
