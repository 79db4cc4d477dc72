"""Structured Streaming ingest: micro-batch parse -> encode -> route ->
merge, exactly-once.

Reference analog (SURVEY.md §2.9): the Rust log-ingestor's S3/SQS listener +
buffered compression submission (log-ingestor/src/ingestion_job/
sqs_listener.rs, compression/buffer.rs) and clp_s's real-time KV-IR
compression (clp_s/JsonParser.hpp:82-96). The reference has no watermarks /
late-data semantics — late rows simply land in the currently-open archive —
so a plain file-source stream with `Trigger.AvailableNow` + `foreachBatch`
reproduces the model exactly.

Exactly-once: Spark's streaming checkpoint guarantees each micro-batch id is
delivered at least once; we make the sink idempotent per batch id —
  * messages append as out/messages/batch_id=<id>/ via staging + atomic
    rename (a re-delivered batch overwrites itself, never double-appends);
  * dictionaries and counts are re-merged from scratch-plus-delta with the
    batch id recorded in the stream manifest; a batch already recorded is
    skipped entirely.
This is the same no-append-on-retry discipline as the batch ingest manifest
(clp_spark/plans/ingest.py), which the north rule requires for exact
per-sink count parity.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import pipeline as P
from ..plans.ingest import MESSAGE_COLUMNS


def _stream_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "_stream_manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"batches": {}}


def _write_stream_manifest(out_dir: str, m: dict) -> None:
    p = os.path.join(out_dir, "_stream_manifest.json")
    tmp = f"{p}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=2, sort_keys=True)
    os.replace(tmp, p)


def _staged_write(df: DataFrame, final: str, partition_by: list[str] | None = None):
    staging = final + ".staging"
    shutil.rmtree(staging, ignore_errors=True)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(staging, final)


def _merge_dict(spark: SparkSession, delta: DataFrame, final: str, keys: list[str], cnt: str):
    """Merge a batch's partial dictionary/count into the sink
    (foreachBatch + MERGE pattern; reducer upsert analog,
    reducer/reducer_server.cpp:21-69)."""
    if os.path.isdir(final):
        merged = (
            spark.read.parquet(final)
            .unionByName(delta)
            .groupBy(*keys)
            .agg(F.sum(cnt).alias(cnt))
        )
    else:
        merged = delta
    _staged_write(merged, final)


def process_batch(spark: SparkSession, out_dir: str, n_buckets: int = 16):
    """Returns the foreachBatch callback for stream_ingest."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        manifest = _stream_manifest(out_dir)
        key = str(batch_id)
        if key in manifest["batches"]:
            return  # re-delivered batch: already fully committed

        parsed = P.parse_encode(batch_df).persist()
        try:
            msgs = parsed.withColumn(
                "logtype_bucket",
                F.pmod(F.col("logtype_id"), F.lit(n_buckets)).cast("int"),
            ).select(*MESSAGE_COLUMNS, "logtype_bucket")
            n = msgs.count()
            _staged_write(
                msgs.sortWithinPartitions("logtype_bucket"),
                os.path.join(out_dir, "messages", f"batch_id={batch_id}"),
                ["logtype_bucket"],
            )
            _merge_dict(
                spark,
                P.build_logtype_dict(parsed),
                os.path.join(out_dir, "logtype_dict"),
                ["logtype_id", "logtype", "var_kinds"],
                "n_messages",
            )
            _merge_dict(
                spark,
                P.build_var_dict(parsed),
                os.path.join(out_dir, "var_dict"),
                ["var_id", "var_str"],
                "n_occurrences",
            )
            _merge_dict(
                spark,
                P.per_logtype_counts(parsed),
                os.path.join(out_dir, "counts_logtype"),
                ["logtype"],
                "cnt",
            )
        finally:
            parsed.unpersist()

        manifest["batches"][key] = {"n_turns": n}
        _write_stream_manifest(out_dir, manifest)

    return fn


def stream_ingest(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    schema=None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingest query over a parquet file source.

    With available_now=True the query drains all currently-visible files and
    stops (the ingestion-job model: scan, compress, finish); leave it False
    for a continuous tail. Returns the StreamingQuery.
    """
    os.makedirs(out_dir, exist_ok=True)
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true").schema(
            spark.read.parquet(input_path).schema
        )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch(spark, out_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
