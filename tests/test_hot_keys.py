"""Streaming Misra-Gries hot-key tracking (streaming/hot_keys.py):
exactness below capacity, per-shard bounds under pressure, multi-batch
state continuity, snapshot semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clp_spark.sources.transcripts import load_transcripts
from clp_spark.plans import pipeline as P
from clp_spark.streaming.hot_keys import (
    hot_keys_stream,
    latest_emissions,
    latest_snapshot,
)

SF_DIR = "/root/testdata/sf0.001"


def _run_stream(spark, src_df, tmp, key_col, **kw):
    """Write src as several files, stream them in >= 2 micro-batches into a
    memory-style parquet sink, return the accumulated emissions."""
    inp = os.path.join(tmp, "in")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    src_df.repartition(4).write.parquet(inp)
    stream = spark.readStream.schema(src_df.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(inp)
    em = hot_keys_stream(stream, key_col=key_col, **kw)
    q = (
        em.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not drain in time"
    return spark.read.parquet(out)


@pytest.fixture(scope="module")
def logtyped(spark):
    t = load_transcripts(spark, SF_DIR)
    return P.parse_encode(t).select("logtype", "ts")


def test_exact_and_multibatch_below_capacity(spark, logtyped, tmp_path_factory):
    """capacity above the distinct-logtype count: the final snapshot equals
    the exact batch groupBy counts with zero undercount, with state carried
    across >= 2 micro-batches."""
    tmp = str(tmp_path_factory.mktemp("hot_exact"))
    em = _run_stream(
        spark, logtyped, tmp, "logtype", n_shards=4, capacity=4096, k=4096
    )
    assert em.select("emit_seq").distinct().count() >= 2  # real batches
    snap = latest_snapshot(em, k=10_000).collect()
    got = {r["key"]: r["est_count"] for r in snap}
    exact = {
        r["logtype"]: r["n"]
        for r in logtyped.groupBy("logtype").agg(F.count("*").alias("n")).collect()
    }
    assert got == exact
    assert all(r["shard_undercount"] == 0 for r in snap)


def test_bounds_under_pressure(spark, logtyped, tmp_path_factory):
    """capacity 2 per shard forces decrements; for every emitted key
    est <= true and true - est <= that shard's undercount, and every key
    with true > its shard's undercount appears in the shard's summary
    (k = capacity so the full summary is emitted)."""
    import hashlib

    tmp = str(tmp_path_factory.mktemp("hot_pressure"))
    # ONE shard: the corpus has only 7 distinct logtypes, so multi-shard
    # splits would leave every shard under its capacity (no decrements)
    n_shards = 1
    em = _run_stream(
        spark, logtyped, tmp, "logtype", n_shards=n_shards, capacity=2, k=2
    )
    # bounds come from the sentinel-bearing latest emissions (present even
    # for a shard whose summary is empty); keys from the snapshot
    final = latest_emissions(em).collect()
    err_by_shard = {
        r["shard"]: r["shard_undercount"] for r in final if r["key"] is None
    }
    got = {
        r["key"]: (r["shard"], r["est_count"])
        for r in final
        if r["key"] is not None
    }
    exact = {
        r["logtype"]: r["n"]
        for r in logtyped.groupBy("logtype").agg(F.count("*").alias("n")).collect()
    }
    shard_of = {
        r["logtype"]: r["s"]
        for r in logtyped.select("logtype")
        .distinct()
        .select(
            "logtype",
            F.pmod(F.xxhash64("logtype"), F.lit(n_shards)).alias("s"),
        )
        .collect()
    }
    assert any(e > 0 for e in err_by_shard.values())  # pressure was real
    for key, (shard, est) in got.items():
        assert est <= exact[key]
        assert exact[key] - est <= err_by_shard[shard], (key, est, exact[key])
    for key, true in exact.items():
        s = shard_of[key]
        if s in err_by_shard and true > err_by_shard[s]:
            assert key in got, (key, true, err_by_shard[s])


def test_snapshot_picks_latest_emission(spark):
    rows = [
        (0, "a", 5, 0, 1),
        (0, None, 0, 0, 1),  # sentinels never surface in the snapshot
        (0, "a", 9, 1, 2),  # newer emission supersedes
        (0, "b", 7, 1, 2),
        (0, None, 0, 1, 2),
        (1, "c", 8, 0, 1),
        (1, None, 0, 0, 1),
    ]
    em = spark.createDataFrame(
        rows, "shard long, key string, est_count long, shard_undercount long, emit_seq long"
    )
    snap = latest_snapshot(em, k=2).collect()
    assert [(r["key"], r["est_count"]) for r in snap] == [("a", 9), ("c", 8)]


def test_wiped_summary_still_reports_current_bound(spark, tmp_path_factory):
    """The review-found edge: a batch whose trim wipes EVERY counter must
    still advance the sink (sentinel row), so latest_snapshot never serves
    a stale hot set with a stale undercount. capacity=1 with two
    2-distinct-key files wipes the summary in every batch: the final
    snapshot is legitimately EMPTY and the sentinel carries the full
    accumulated bound."""
    import datetime as dt

    tmp = str(tmp_path_factory.mktemp("hot_wipe"))
    ts = dt.datetime(2026, 1, 1)
    f1 = [("x", ts), ("x", ts), ("y", ts), ("y", ts)]
    f2 = [("z", ts), ("z", ts), ("w", ts), ("w", ts)]
    import os as _os

    inp = _os.path.join(tmp, "in")
    spark.createDataFrame(f1, "logtype string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    spark.createDataFrame(f2, "logtype string, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    out, ckpt = _os.path.join(tmp, "out"), _os.path.join(tmp, "ckpt")
    stream = spark.readStream.schema("logtype string, ts timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(inp)
    q = (
        hot_keys_stream(stream, key_col="logtype", n_shards=1, capacity=1, k=5)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)
    em = spark.read.parquet(out)
    assert em.where("emit_seq = 2").count() >= 1  # batch 2 DID reach the sink
    fin = latest_emissions(em).collect()
    sent = [r for r in fin if r["key"] is None]
    assert sent and sent[0]["shard_undercount"] == 4  # d=2 per wiped batch
    assert latest_snapshot(em, 5).count() == 0  # empty, not stale


def test_param_validation(spark, logtyped):
    with pytest.raises(ValueError):
        hot_keys_stream(logtyped, n_shards=0)
    with pytest.raises(ValueError):
        hot_keys_stream(logtyped, capacity=0)
