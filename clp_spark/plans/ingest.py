"""The end-to-end CLP-style ingest job: parse -> encode -> enrich -> route ->
aggregate, with checkpoint/resume, per-partition lineage, and metrics.

Reference shape (SURVEY.md §3.1): clp's compression path writes an archive =
{encoded messages, logtype dictionary, variable dictionary} plus metadata;
the distributed package adds resumable per-task state in a metadata DB
(scheduler/compress/compression_scheduler.py:230+, partition.py:16-107) and
the reducer aggregates counts (reducer/CountOperator.cpp:4-41).

Spark-first re-expression — one ingest() call produces SINKS:

  out/messages/        encoded turns, hash-partitioned by logtype_bucket
                       (glt-style per-logtype routing, glt/.../LogtypeTable.hpp)
  out/logtype_dict/    (logtype_id, logtype, n_messages)
  out/var_dict/        (var_id, var_str, n_occurrences)
  out/counts_logtype/  per-logtype counts     (north-star aggregate parity)
  out/counts_tool/     per-tool counts
  out/counts_conv/     per-conversation counts
  out/lineage/         per-bucket row/file lineage for the messages sink
  out/_manifest.json   completed-step checkpoint + metrics

Design-for-scale notes:
  * The messages write is SHUFFLE-FREE: rows get a logtype_bucket column and
    each task writes its own per-bucket files (sortWithinPartitions groups a
    task's rows so each task opens one file per bucket at a time). A hot
    logtype therefore spreads across ALL input tasks instead of hammering
    one reducer — routing skew simply cannot happen, which beats
    repartition+AQE for a Zipfian logtype distribution. Small files are
    handled by compact_bucket() (size-tiered merge, the analog of glt's
    combined tables, glt/.../GLTSegment.hpp:83-113).
  * Dictionary builds are groupBys with map-side partial aggregation — the
    shuffle carries only per-partition distinct partials (tiny), like the
    reference's inter-stage vs intra-stage CountOperator split.
  * Each step commits via staging-dir + atomic rename and is recorded in
    the manifest; re-running ingest() skips completed steps (idempotent,
    no append-on-retry double counting). This is the filesystem analog of
    Iceberg snapshot/WAP commits — swap _commit() for an Iceberg
    `writeTo(...).overwritePartitions()` on a real cluster.
  * Metrics come from pyspark.sql.Observation on the messages scan (row
    counts observed during the write, no extra pass) and land in the
    manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import pipeline as P

MANIFEST = "_manifest.json"

MESSAGE_COLUMNS = [
    "conv_id", "turn_idx", "ts", "role", "tool", "logtype_id", "encoded_vars",
]

# Parquet BLOOM FILTER on logtype_id for the messages sink: the
# segment-index prune the reference keeps per segment (clp Query.cpp
# make_sub_queries_relevant_to_segment; SURVEY §4.1 "covered via table
# properties"). search() probes messages with logtype_id.isin(candidates)
# and ids are content HASHES — no clustering, so row-group min/max can
# never skip for them. parquet-mr's skip ladder then is: row groups whose
# chunk is fully dictionary-encoded are skipped via the dictionary page
# itself (exact membership — the small-corpus regime, asserted in tests);
# once cardinality outgrows the dictionary (the 100-TB regime) the writer
# falls back to plain pages and THIS bloom (~6 KiB/row group) takes over
# the row-group skip. Same option surface works for any engine reading the
# archive.
MESSAGES_PARQUET_OPTIONS = {
    "parquet.bloom.filter.enabled#logtype_id": "true",
    "parquet.bloom.filter.expected.ndv#logtype_id": "32768",
}


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def read_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"steps": {}, "metrics": {}}


def _write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def _commit(df_writer_fn, out_dir: str, step: str, step_secs: dict | None = None) -> str:
    """Write a step to a staging dir, then atomically rename into place.

    Filesystem stand-in for an Iceberg snapshot commit: a crashed write
    leaves only staging garbage, never a half-visible sink; retries are
    idempotent (stale staging dirs are removed first).
    """
    t0 = time.time()
    final = os.path.join(out_dir, step)
    staging = os.path.join(out_dir, "_staging", step)
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    df_writer_fn(staging)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(staging, final)
    if step_secs is not None:
        step_secs[step] = round(time.time() - t0, 3)
    return final


def ingest(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    *,
    dim_role: DataFrame | None = None,
    dim_tool: DataFrame | None = None,
    n_buckets: int = 16,
    resume: bool = True,
    cache_parsed: bool = True,
    only_steps: set[str] | None = None,
    dataset: str = "default",
    tags: tuple[str, ...] = (),
    codec: str | None = None,
) -> dict:
    """Run the full ingest job. Returns the manifest (steps + metrics).

    `codec` selects the archive compression codec per job (the reference's
    --compression knob, clp/streaming_compression/: zstd default, lzma,
    passthrough). Parquet codecs here: zstd (default, the reference's
    default too), gzip (the high-ratio/slow slot lzma occupies there —
    parquet-mr has no lzma/xz codec), snappy/lz4 (fast), uncompressed
    (= the reference's passthrough). Applied to every sink of this job via
    the per-write option, not session config.

    Resumable: completed steps recorded in out/_manifest.json are skipped
    (pass resume=False to force a full rebuild). `cache_parsed` persists the
    parsed DataFrame across the sink jobs — right for memory-sized runs; at
    cluster scale prefer StorageLevel.DISK_ONLY or accept a second parse
    pass (both keep parallel efficiency; see bench.py). `only_steps`
    restricts the run to a subset of steps (e.g. {"messages"} for the
    parsed+routed scaling probe).
    """
    os.makedirs(out_dir, exist_ok=True)
    codec_opts = {"compression": codec} if codec else {}
    manifest = read_manifest(out_dir) if resume else {"steps": {}, "metrics": {}}
    manifest["dataset"] = dataset
    manifest["tags"] = sorted(tags)
    steps = manifest["steps"]
    resumed_steps = set(steps)
    step_secs = manifest["metrics"].setdefault("step_secs", {})
    t_start = time.time()

    # The pipeline is shuffle-free after this point, so task parallelism ==
    # input splits. A narrow source (one small file, an exploded literal)
    # would otherwise serialize the whole job on one core; widen it up front.
    # The repartition moves RAW text rows once — far cheaper than shuffling
    # encoded rows later, and a no-op on well-split cluster inputs.
    target = spark.sparkContext.defaultParallelism
    if transcripts.rdd.getNumPartitions() < target:
        transcripts = transcripts.repartition(target)

    # Messages-only runs (the parsed+routed hot path / scaling probe) never
    # need template or variable STRINGS — use the ids-only Arrow parse (the
    # reference message layout, File.hpp:257-259). Dictionary steps need the
    # strings, so full runs use the full parse.
    needs_strings = only_steps is None or bool(
        {"logtype_dict", "var_dict"} & only_steps
    )
    parsed = P.parse_encode(transcripts) if needs_strings else P.parse_encode_ids(transcripts)
    enriched = None
    if dim_role is not None and dim_tool is not None:
        enriched = P.enrich(parsed, dim_role, dim_tool)
    # Only the columns the dictionary builds still need after the messages
    # write; everything else is either in the sink (count sinks re-read it
    # column-pruned — cheaper than scanning a fat cache) or derivable.
    dict_src = (
        parsed.select("logtype", "logtype_id", "dict_vars", "dict_var_ids")
        if needs_strings
        else None
    )
    cache_parsed = cache_parsed and needs_strings
    if cache_parsed:
        dict_src = dict_src.persist()

    msgs_dir = os.path.join(out_dir, "messages")

    def sink(*cols):
        return spark.read.parquet(msgs_dir).select(*cols)

    def want(step):
        return (only_steps is None or step in only_steps) and step not in steps

    try:
        if want("messages"):
            obs = Observation("ingest_messages")
            src = enriched if enriched is not None else parsed
            msgs = (
                src.withColumn(
                    "logtype_bucket",
                    F.pmod(F.col("logtype_id"), F.lit(n_buckets)).cast("int"),
                )
                .withColumn("_text_bytes", F.octet_length("text"))
                .select(*MESSAGE_COLUMNS, "logtype_bucket", "_text_bytes")
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n_turns"),
                    F.sum("_text_bytes").alias("uncompressed_bytes"),
                )
                .drop("_text_bytes")
            )
            _commit(
                lambda d: msgs.sortWithinPartitions("logtype_bucket")
                .write.mode("overwrite")
                .options(**MESSAGES_PARQUET_OPTIONS, **codec_opts)
                .partitionBy("logtype_bucket")
                .parquet(d),
                out_dir,
                "messages",
                step_secs,
            )
            steps["messages"] = {"n_turns": obs.get["n_turns"]}
            manifest["metrics"]["n_turns"] = obs.get["n_turns"]
            manifest["metrics"]["uncompressed_bytes"] = obs.get["uncompressed_bytes"]
            _write_manifest(out_dir, manifest)

        if want("logtype_dict"):
            _commit(
                lambda d: P.build_logtype_dict(dict_src)
                .write.mode("overwrite")
                .options(**codec_opts)
                .parquet(d),
                out_dir,
                "logtype_dict",
                step_secs,
            )
            steps["logtype_dict"] = True
            _write_manifest(out_dir, manifest)

        if want("var_dict"):
            _commit(
                lambda d: P.build_var_dict(dict_src)
                .write.mode("overwrite")
                .options(**codec_opts)
                .parquet(d),
                out_dir,
                "var_dict",
                step_secs,
            )
            steps["var_dict"] = True
            _write_manifest(out_dir, manifest)

        # Count sinks + lineage are derived from the MESSAGES SINK with
        # column-pruned scans (the reducer re-expressed: partial agg on
        # executors, final agg after a tiny shuffle).
        lt_dict = (
            spark.read.parquet(os.path.join(out_dir, "logtype_dict"))
            if want("counts_logtype")
            else None
        )

        builders = {
            "counts_logtype": lambda: sink("logtype_id")
            .groupBy("logtype_id")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .join(F.broadcast(lt_dict.select("logtype_id", "logtype")), "logtype_id")
            .select("logtype", "cnt"),
            "counts_tool": lambda: sink("tool")
            .groupBy("tool")
            .agg(F.count(F.lit(1)).alias("cnt")),
            "counts_conv": lambda: sink("conv_id", "ts")
            .groupBy("conv_id")
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.min(P.ts_millis("ts")).alias("first_ts_ms"),
                F.max(P.ts_millis("ts")).alias("last_ts_ms"),
            ),
            # per-bucket rows/files plus the min/max-ts range index that
            # drives archive pruning in the reference
            # (clp_s/TimestampEntry.hpp:58-93, EvaluateTimestampIndex)
            "lineage": lambda: sink("logtype_bucket", "ts")
            .groupBy("logtype_bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min(P.ts_millis("ts")).alias("begin_ts_ms"),
                F.max(P.ts_millis("ts")).alias("end_ts_ms"),
            )
            .withColumn("n_files", _bucket_file_counts_udf(msgs_dir)("logtype_bucket")),
        }
        for step, build in builders.items():
            if not want(step):
                continue
            df = build()
            _commit(
                lambda d, df=df: df.write.mode("overwrite").options(**codec_opts).parquet(d),
                out_dir,
                step,
                step_secs,
            )
            steps[step] = True
            _write_manifest(out_dir, manifest)
    finally:
        if cache_parsed:
            dict_src.unpersist()

    # archive-level ts range for selection pruning (reference archives
    # table begin/end_timestamp, clp_metadata_db_utils.py:27-95)
    lineage_dir = os.path.join(out_dir, "lineage")
    if os.path.isdir(lineage_dir):
        rng = (
            spark.read.parquet(lineage_dir)
            .agg(F.min("begin_ts_ms").alias("b"), F.max("end_ts_ms").alias("e"))
            .first()
        )
        manifest["metrics"]["begin_ts_ms"] = rng["b"]
        manifest["metrics"]["end_ts_ms"] = rng["e"]

    # archive size + compression ratio (reference ArchiveMetadata's
    # compressed/uncompressed running sizes, clp/streaming_archive/
    # ArchiveMetadata.cpp)
    archive_bytes = 0
    for root, _dirs, files in os.walk(out_dir):
        if "_staging" in root:
            continue
        archive_bytes += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
    manifest["metrics"]["archive_bytes"] = archive_bytes
    unc = manifest["metrics"].get("uncompressed_bytes")
    if unc and archive_bytes:
        manifest["metrics"]["compression_ratio"] = round(unc / archive_bytes, 3)
    manifest["metrics"]["wall_sec"] = round(time.time() - t_start, 3)
    _write_manifest(out_dir, manifest)
    if set(steps) - resumed_steps:
        # Sinks changed: drop every session dictionary cache (collected rows
        # + broadcasts) so a re-ingest into the same paths can never serve
        # stale dictionaries to search()/decode (cache keys are plan-text /
        # path based and identical across a rewrite).
        from ..caching import invalidate_dict_caches

        invalidate_dict_caches()
    return manifest


def _bucket_file_counts_udf(msgs_dir: str):
    """File counts per bucket from a directory listing (driver-side
    metadata, no data scan) exposed as a tiny lookup udf."""
    counts = {}
    for d in os.listdir(msgs_dir):
        if d.startswith("logtype_bucket="):
            b = int(d.split("=", 1)[1])
            counts[b] = sum(
                1 for f in os.listdir(os.path.join(msgs_dir, d)) if f.endswith(".parquet")
            )

    def make(col):
        mapping = F.create_map(
            *[F.lit(x) for kv in counts.items() for x in kv]
        ) if counts else F.create_map()
        return mapping[F.col(col)]

    return make


def compact_bucket(
    spark: SparkSession, out_dir: str, bucket: int, target_files: int = 1
) -> None:
    """Size-tiered compaction of one logtype bucket (analog of glt packing
    small per-logtype tables into combined tables). Rewrites the bucket's
    files into `target_files` files via staging + atomic rename."""
    bucket_dir = os.path.join(out_dir, "messages", f"logtype_bucket={bucket}")
    staging = bucket_dir + ".compact"
    shutil.rmtree(staging, ignore_errors=True)
    (
        spark.read.parquet(bucket_dir)
        .coalesce(target_files)
        .write.mode("overwrite")
        .parquet(staging)
    )
    old = bucket_dir + ".old"
    os.replace(bucket_dir, old)
    os.replace(staging, bucket_dir)
    shutil.rmtree(old)


def decode_archive(spark: SparkSession, out_dir: str) -> DataFrame:
    """Round-trip decode of an ingested archive back to original text
    (reference FileDecompressor / JsonConstructor analog) ->
    (conv_id, turn_idx, text); stable (conv_id, turn_idx) ordering restored
    by the caller's sort. Uses the shuffle-free in-memory-dictionary decode
    when the var dictionary is collectible (the reference decompressor's
    model: dictionaries load fully before reading segments), else the
    broadcast-join decode."""
    from .grep import DICT_BROADCAST_LIMIT

    msgs = spark.read.parquet(os.path.join(out_dir, "messages"))
    lt = spark.read.parquet(os.path.join(out_dir, "logtype_dict"))
    vd = spark.read.parquet(os.path.join(out_dir, "var_dict"))
    sample = vd.select("var_id", "var_str").limit(DICT_BROADCAST_LIMIT + 1).collect()
    if len(sample) <= DICT_BROADCAST_LIMIT:
        return P.decode_messages_dictmap(
            spark,
            msgs,
            [(r["logtype_id"], r["logtype"]) for r in lt.select("logtype_id", "logtype").collect()],
            [(r["var_id"], r["var_str"]) for r in sample],
        )
    return P.decode_messages(msgs, lt, vd)


from ..caching import RowsCache

_DICT_CACHE = RowsCache(max_items=8)


def select_archives(
    archive_dirs: list[str],
    *,
    dataset: str | None = None,
    tags: list[str] | None = None,
    begin_ts_ms: int | None = None,
    end_ts_ms: int | None = None,
) -> list[str]:
    """Archive selection: dataset/tag restriction + ts-range overlap, newest
    first (reference query_scheduler.py:396-434: SQL over the archives
    metadata table with tag IN-subquery and `ORDER BY end_timestamp DESC`).
    Driver-side over manifests — the control-table scan, not a data scan."""
    picked = []
    for d in archive_dirs:
        m = read_manifest(d)
        if dataset is not None and m.get("dataset") != dataset:
            continue
        if tags and not set(tags) & set(m.get("tags", [])):
            continue
        b = m.get("metrics", {}).get("begin_ts_ms")
        e = m.get("metrics", {}).get("end_ts_ms")
        if begin_ts_ms is not None and e is not None and e < begin_ts_ms:
            continue
        if end_ts_ms is not None and b is not None and b > end_ts_ms:
            continue
        picked.append((e if e is not None else 0, d))
    return [d for _, d in sorted(picked, reverse=True)]


def search_archives(
    spark: SparkSession,
    archive_dirs: list[str],
    query: str,
    *,
    tags: list[str] | None = None,
    begin_ts_ms: int | None = None,
    end_ts_ms: int | None = None,
    **search_kw,
) -> DataFrame:
    """Wildcard search across selected archives (the clg-over-many-archives
    path). Content-hash ids are globally deterministic, so unioned messages
    join unioned (deduplicated) dictionaries directly."""
    from .grep import search

    dirs = select_archives(
        archive_dirs, tags=tags, begin_ts_ms=begin_ts_ms, end_ts_ms=end_ts_ms
    )
    if not dirs:
        raise ValueError("no archive matches the selection")
    from functools import reduce

    def union_read(sub: str) -> DataFrame:
        # per-archive reads + union: each partitioned root keeps its own
        # partition discovery (one multi-root read would conflict)
        parts = [spark.read.parquet(os.path.join(d, sub)) for d in dirs]
        return reduce(DataFrame.unionByName, parts)

    msgs = union_read("messages")
    lt = (
        union_read("logtype_dict")
        .select("logtype_id", "logtype", "var_kinds")
        .dropDuplicates(["logtype_id"])
    )
    vd = union_read("var_dict").select("var_id", "var_str").dropDuplicates(["var_id"])

    # Per-archive-set dictionary cache: archives are immutable snapshots, so
    # repeated queries skip the collect (the reference keeps per-archive
    # dictionaries resident across searches too). Shared RowsCache — cleared
    # automatically when ingest() rewrites an archive in-session.
    def load_rows():
        from .grep import _TOO_BIG, DICT_BROADCAST_LIMIT

        lt_rows = [(r["logtype_id"], r["logtype"]) for r in lt.collect()]
        sample = vd.limit(DICT_BROADCAST_LIMIT + 1).collect()
        vd_rows = (
            [(r["var_id"], r["var_str"]) for r in sample]
            if len(sample) <= DICT_BROADCAST_LIMIT
            else _TOO_BIG  # search() then uses DISTRIBUTED dict lookups
        )
        return (lt_rows, vd_rows)

    lt_rows, vd_rows = _DICT_CACHE.get_or_load(tuple(dirs), load_rows)

    return search(
        msgs, lt, vd, query,
        begin_ts_ms=begin_ts_ms, end_ts_ms=end_ts_ms,
        lt_rows=lt_rows, vd_rows=vd_rows, **search_kw,
    )


def compact_archive(
    spark: SparkSession, out_dir: str, max_files_per_bucket: int = 4
) -> dict:
    """Lineage-driven size-tiered compaction: rewrite every bucket whose
    file count exceeds the limit (the glt combined-table policy,
    glt/.../GLTSegment.hpp:83-113 — many small per-logtype tables get
    packed together). Refreshes the lineage sink afterwards. Returns
    {bucket: files_before} for the compacted buckets."""
    lineage_dir = os.path.join(out_dir, "lineage")
    rows = spark.read.parquet(lineage_dir).collect()
    compacted = {}
    for r in rows:
        if r["n_files"] > max_files_per_bucket:
            compact_bucket(spark, out_dir, int(r["logtype_bucket"]), target_files=1)
            compacted[int(r["logtype_bucket"])] = int(r["n_files"])
    if compacted:
        sink = spark.read.parquet(os.path.join(out_dir, "messages"))
        lineage = (
            sink.select("logtype_bucket", "ts")
            .groupBy("logtype_bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min(P.ts_millis("ts")).alias("begin_ts_ms"),
                F.max(P.ts_millis("ts")).alias("end_ts_ms"),
            )
            .withColumn(
                "n_files",
                _bucket_file_counts_udf(os.path.join(out_dir, "messages"))("logtype_bucket"),
            )
        )
        staging = lineage_dir + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        lineage.coalesce(1).write.mode("overwrite").parquet(staging)
        shutil.rmtree(lineage_dir)
        os.replace(staging, lineage_dir)
    return compacted


def readable_dictionaries(spark: SparkSession, out_dir: str):
    """Human-readable dictionary views, deterministically ordered
    (reference make_dictionaries_readable/): placeholder bytes rendered as
    \\x11/\\x12/\\x13 markers so templates print safely."""
    lt = (
        spark.read.parquet(os.path.join(out_dir, "logtype_dict"))
        .withColumn(
            "logtype_readable",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("logtype", "\x11", "<int>"), "\x12", "<dict>"
                ),
                "\x13",
                "<float>",
            ),
        )
        .select("logtype_id", "logtype_readable", "n_messages")
        .orderBy("logtype_readable")
    )
    vd = (
        spark.read.parquet(os.path.join(out_dir, "var_dict"))
        .select("var_id", "var_str", "n_occurrences")
        .orderBy("var_str")
    )
    return lt, vd
