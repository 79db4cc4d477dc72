"""Streaming ingest: micro-batch drain, exactly-once re-delivery, parity
with batch ingest counts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clp_spark.plans import pipeline as P
from clp_spark.sources.transcripts import load_transcripts
from clp_spark.streaming.ingest import process_batch, stream_ingest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    inp, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    t = load_transcripts(spark, SF_DIR)
    # several input files -> several potential micro-batches
    t.repartition(4).write.parquet(inp)
    q = stream_ingest(spark, inp, out, ckpt, schema=t.schema, max_files_per_trigger=2)
    q.awaitTermination(120)
    return inp, out, ckpt


def test_stream_drains_all_rows(spark, streamed):
    _, out, _ = streamed
    t = load_transcripts(spark, SF_DIR)
    msgs = spark.read.parquet(os.path.join(out, "messages"))
    assert msgs.count() == t.count()
    # multiple micro-batches actually happened
    assert msgs.select("batch_id").distinct().count() >= 2


def test_stream_counts_match_batch_semantics(spark, streamed):
    _, out, _ = streamed
    t = load_transcripts(spark, SF_DIR)
    parsed = P.parse_encode(t)
    direct = {r["logtype"]: r["cnt"] for r in P.per_logtype_counts(parsed).collect()}
    merged = {
        r["logtype"]: r["cnt"]
        for r in spark.read.parquet(os.path.join(out, "counts_logtype")).collect()
    }
    assert merged == direct
    vd = spark.read.parquet(os.path.join(out, "var_dict"))
    direct_vd = P.build_var_dict(parsed)
    assert sorted(map(tuple, vd.collect())) == sorted(map(tuple, direct_vd.collect()))


def test_redelivered_batch_is_idempotent(spark, streamed):
    """Replaying an already-committed batch id must not change any sink."""
    _, out, _ = streamed
    t = load_transcripts(spark, SF_DIR)
    before_msgs = spark.read.parquet(os.path.join(out, "messages")).count()
    before_counts = sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "counts_logtype")).collect())
    )
    fn = process_batch(spark, out)
    fn(t.limit(100), 0)  # batch 0 was already processed by the stream
    assert spark.read.parquet(os.path.join(out, "messages")).count() == before_msgs
    after_counts = sorted(
        map(tuple, spark.read.parquet(os.path.join(out, "counts_logtype")).collect())
    )
    assert after_counts == before_counts
