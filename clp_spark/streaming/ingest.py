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
delivered at least once; EVERY sink write is idempotent per batch id —
  * messages append as out/messages/batch_id=<id>/ via staging + atomic
    rename (a re-delivered batch overwrites itself, never double-appends);
  * dictionaries and counts are DELTA-LOG sinks: each batch writes only its
    own partial aggregate under <sink>/_deltas/batch_id=<id>/ (staged +
    atomic rename — a redelivered batch overwrites its own delta, so there
    is NO crash window between sink commits and the manifest: the manifest
    is bookkeeping, not a correctness fence); reads aggregate
    base ∪ live deltas; periodic compaction writes a NEW uuid-named base dir
    and commits it with one atomic rename of _base_meta.json, which names
    both the current base dir and the batch ids it folds — so a crash at any
    point leaves a consistent (base, merged-set) pair and can neither double
    count a folded delta nor lose the base. Prior bases stay on disk as a
    SNAPSHOT LOG (the Iceberg snapshot-list analog): read_dict_sink(
    as_of_batch=N) time-travels to any unexpired micro-batch;
    expire_snapshots() reclaims history behind a retention horizon.
Per-batch write cost is O(delta) — the previous design rewrote the WHOLE
dictionary every micro-batch (read-all ∪ delta -> overwrite), which goes
quadratic over a long-running stream; compaction amortizes the O(total)
rewrite over COMPACT_EVERY batches.
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


# (sink subdir, group keys, count column) for every delta-log sink
DICT_SINKS = {
    "logtype_dict": (["logtype_id", "logtype", "var_kinds"], "n_messages"),
    "var_dict": (["var_id", "var_str"], "n_occurrences"),
    "counts_logtype": (["logtype"], "cnt"),
}

# fold deltas into the base once this many live deltas accumulate
COMPACT_EVERY = 8

# snapshot bases retained for time travel before expiry (Iceberg
# history-retention analog); the streaming sink expires beyond this
SNAPSHOT_RETENTION = 4


def _base_meta(sink_dir: str) -> dict:
    """The sink's commit record: which dir is the current base parquet,
    which delta batch ids it already folds, plus the SNAPSHOT LOG — every
    retained historical base with the max batch id it folds (the Iceberg
    snapshot-list analog; `read_dict_sink(as_of_batch=...)` time-travels
    through it). Written atomically (os.replace) so base CONTENTS, the
    merged set and the snapshot list commit together."""
    p = os.path.join(sink_dir, "_base_meta.json")
    if os.path.exists(p):
        with open(p) as f:
            meta = json.load(f)
    else:
        meta = {"merged_batches": []}
    if "base_dir" not in meta:
        # pre-pointer layout (or no base yet): the base, if any, is ./_base
        meta["base_dir"] = (
            "_base" if os.path.isdir(os.path.join(sink_dir, "_base")) else None
        )
    if "snapshots" not in meta:
        # legacy meta: the current base is the only snapshot
        meta["snapshots"] = (
            [{"base_dir": meta["base_dir"], "max_batch": max(meta["merged_batches"], default=-1)}]
            if meta["base_dir"]
            else []
        )
    # smallest delta batch id still guaranteed on disk (raised by expiry)
    meta.setdefault("delta_floor", 0)
    return meta


def _write_base_meta(sink_dir: str, meta: dict) -> None:
    os.makedirs(sink_dir, exist_ok=True)
    p = os.path.join(sink_dir, "_base_meta.json")
    tmp = f"{p}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, p)


def _live_delta_ids(sink_dir: str, meta: dict | None = None) -> list[int]:
    """Delta batch ids NOT yet folded into the base."""
    ddir = os.path.join(sink_dir, "_deltas")
    if not os.path.isdir(ddir):
        return []
    merged = set((meta or _base_meta(sink_dir))["merged_batches"])
    out = []
    for d in os.listdir(ddir):
        if d.startswith("batch_id="):
            b = int(d.split("=", 1)[1])
            if b not in merged:
                out.append(b)
    return sorted(out)


def write_dict_delta(delta: DataFrame, sink_dir: str, batch_id: int) -> None:
    """O(delta) per-batch sink write, idempotent per batch id (staged +
    atomic rename: a redelivered batch overwrites its own delta)."""
    _staged_write(delta, os.path.join(sink_dir, "_deltas", f"batch_id={batch_id}"))


def _delta_ids_on_disk(sink_dir: str) -> list[int]:
    ddir = os.path.join(sink_dir, "_deltas")
    if not os.path.isdir(ddir):
        return []
    return sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(ddir) if d.startswith("batch_id=")
    )


def read_dict_sink(
    spark: SparkSession, sink_dir: str, as_of_batch: int | None = None
) -> DataFrame:
    """The sink's table: base ∪ live deltas, re-aggregated.

    With `as_of_batch=N`, TIME-TRAVEL: the table as of micro-batch N — the
    newest retained snapshot base folding ≤ N plus the retained deltas in
    between (Iceberg snapshot-read analog; the time-travel path reads
    O(#batches-since-snapshot) small files, it is not the hot path).
    Raises ValueError when N predates the expiry horizon
    (`expire_snapshots`). Sink subdir name determines (keys, cnt) via
    DICT_SINKS."""
    name = os.path.basename(sink_dir.rstrip("/"))
    keys, cnt = DICT_SINKS[name]
    # One meta read gives a CONSISTENT (base, merged-set, snapshots) view.
    meta = _base_meta(sink_dir)
    parts = []
    if as_of_batch is None:
        if meta["base_dir"]:
            base = os.path.join(sink_dir, meta["base_dir"])
            if os.path.isdir(base):
                parts.append(spark.read.parquet(base))
        delta_ids = _live_delta_ids(sink_dir, meta)
    else:
        snaps = [s for s in meta["snapshots"] if s["max_batch"] <= as_of_batch]
        floor = -1
        if snaps:
            best = max(snaps, key=lambda s: s["max_batch"])
            parts.append(spark.read.parquet(os.path.join(sink_dir, best["base_dir"])))
            floor = best["max_batch"]
        elif meta["delta_floor"] > 0:
            raise ValueError(
                f"snapshot as of batch {as_of_batch} expired from {sink_dir} "
                f"(delta floor {meta['delta_floor']}, no retained base ≤ it)"
            )
        delta_ids = [b for b in _delta_ids_on_disk(sink_dir) if floor < b <= as_of_batch]
    for b in delta_ids:
        parts.append(spark.read.parquet(os.path.join(sink_dir, "_deltas", f"batch_id={b}")))
    if not parts:
        raise FileNotFoundError(f"empty dict sink {sink_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(F.sum(cnt).alias(cnt))


def compact_dict_sink(spark: SparkSession, sink_dir: str) -> int:
    """Fold live deltas into the base (amortized O(total) every
    COMPACT_EVERY batches; the streaming analog of the reference's
    dictionary snapshot writes). The commit point is ONE atomic meta rename
    (_write_base_meta) that simultaneously points reads at the new base dir
    AND records the folded batch ids — a crash anywhere leaves either the
    old (base, merged) view or the new one, never a state where a folded
    delta double counts or the base is missing. Returns #deltas folded."""
    meta = _base_meta(sink_dir)
    live = _live_delta_ids(sink_dir, meta)
    if not live:
        return 0
    merged_df = read_dict_sink(spark, sink_dir)
    new_base = f"_base.{uuid.uuid4().hex}"
    merged_df.write.mode("overwrite").parquet(os.path.join(sink_dir, new_base))
    _write_base_meta(
        sink_dir,
        {
            "base_dir": new_base,
            "merged_batches": sorted(set(meta["merged_batches"]) | set(live)),
            # prior bases and their folded deltas are RETAINED as snapshots
            # (time travel via read_dict_sink(as_of_batch=...));
            # expire_snapshots() reclaims them
            "snapshots": meta["snapshots"] + [{"base_dir": new_base, "max_batch": max(live)}],
            "delta_floor": meta["delta_floor"],
        },
    )
    return len(live)


def expire_snapshots(sink_dir: str, keep_last: int = 2) -> int:
    """Reclaim history: keep the newest `keep_last` snapshot bases, drop
    older bases and the folded deltas at-or-below the oldest retained
    snapshot (Iceberg expire_snapshots analog). The commit point is the ONE
    atomic meta rename — a crash after it only leaves unreferenced dirs that
    readers ignore. Time travel to batches older than the new horizon then
    raises ValueError. Returns #snapshots dropped."""
    meta = _base_meta(sink_dir)
    snaps = meta["snapshots"]
    if len(snaps) <= keep_last:
        return 0
    drop, keep = snaps[:-keep_last], snaps[-keep_last:]
    floor = keep[0]["max_batch"] + 1
    _write_base_meta(
        sink_dir,
        {
            **meta,
            "snapshots": keep,
            "delta_floor": max(meta["delta_floor"], floor),
            # prune folded ids below the floor (their delta dirs are deleted
            # right below, so no read path consults them again) — without
            # this the meta grows one id per micro-batch FOREVER and every
            # batch re-writes the full list (ADVICE r3). Unfolded ids below
            # the floor are kept: their deltas stay on disk and stay live.
            "merged_batches": sorted(
                b for b in meta["merged_batches"] if b >= floor
            ),
        },
    )
    for s in drop:
        shutil.rmtree(os.path.join(sink_dir, s["base_dir"]), ignore_errors=True)
    merged = set(meta["merged_batches"])
    for b in _delta_ids_on_disk(sink_dir):
        if b < floor and b in merged:  # never delete a live (unfolded) delta
            shutil.rmtree(
                os.path.join(sink_dir, "_deltas", f"batch_id={b}"), ignore_errors=True
            )
    return len(drop)


def compact_all(spark: SparkSession, out_dir: str) -> None:
    for name in DICT_SINKS:
        compact_dict_sink(spark, os.path.join(out_dir, name))


def _sink_parsed_batch(
    spark: SparkSession,
    out_dir: str,
    parsed: DataFrame,
    batch_id: int,
    n_buckets: int,
    compact_every: int,
) -> int:
    """Route one parsed micro-batch into all sinks (messages + delta-log
    dictionaries/counts), idempotently per batch id. `parsed` must carry the
    parse_encode output columns. Returns the batch's turn count."""
    parsed = parsed.persist()
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
        deltas = {
            "logtype_dict": P.build_logtype_dict(parsed),
            "var_dict": P.build_var_dict(parsed),
            "counts_logtype": P.per_logtype_counts(parsed),
        }
        for name, delta in deltas.items():
            sink = os.path.join(out_dir, name)
            write_dict_delta(delta, sink, batch_id)
            if len(_live_delta_ids(sink)) >= compact_every:
                compact_dict_sink(spark, sink)
                expire_snapshots(sink, keep_last=SNAPSHOT_RETENTION)
    finally:
        parsed.unpersist()
    return n


def process_batch(
    spark: SparkSession,
    out_dir: str,
    n_buckets: int = 16,
    compact_every: int = COMPACT_EVERY,
):
    """Returns the foreachBatch callback for stream_ingest."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        manifest = _stream_manifest(out_dir)
        key = str(batch_id)
        if key in manifest["batches"]:
            return  # re-delivered batch: already fully committed

        n = _sink_parsed_batch(
            spark, out_dir, P.parse_encode(batch_df), batch_id, n_buckets, compact_every
        )
        manifest["batches"][key] = {"n_turns": n}
        _write_stream_manifest(out_dir, manifest)

    return fn


def process_ir_batch(
    spark: SparkSession,
    out_dir: str,
    n_buckets: int = 16,
    compact_every: int = COMPACT_EVERY,
):
    """foreachBatch callback for stream_ingest_ir: decode each IR file
    (either encoding) and route through the SAME exactly-once sinks as the
    text stream. Stream identity is xxhash64(file path) — stable across
    re-delivery, so a replayed batch rewrites identical rows."""
    from ..sources.ir_stream import ir_messages, read_clp_ir

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        manifest = _stream_manifest(out_dir)
        key = str(batch_id)
        if key in manifest["batches"]:
            return  # re-delivered batch: already fully committed

        frames = batch_df.select(
            F.xxhash64("path").alias("stream_idx"),
            F.col("content").alias("payload"),
        )
        n = _sink_parsed_batch(
            spark,
            out_dir,
            ir_messages(read_clp_ir(frames)),
            batch_id,
            n_buckets,
            compact_every,
        )
        manifest["batches"][key] = {"n_turns": n}
        _write_stream_manifest(out_dir, manifest)

    return fn


def stream_ingest_ir(
    spark: SparkSession,
    input_path: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    glob_filter: str | None = None,
):
    """Real-time CLP IR compression as ONE streaming call (VERDICT r2 item
    8; reference clp_s/JsonParser.hpp:82-96 parse_from_ir + the Rust
    log-ingestor's listener): a binaryFile stream of IR files (eight- OR
    four-byte encoding, auto-detected per stream) -> foreachBatch decode ->
    the delta-log dictionary/count sinks and bucketed message store, with
    the same per-batch-id idempotence as the text stream. Each IR file
    decodes in one task (a stream is inherently sequential — the
    reference's unit of parallelism too); many files parallelize."""
    os.makedirs(out_dir, exist_ok=True)
    # binaryFile's schema is fixed but the streaming source requires it
    # stated explicitly
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_path)

    writer = (
        stream.writeStream.foreachBatch(process_ir_batch(spark, out_dir))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
