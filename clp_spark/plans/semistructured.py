"""Semi-structured (JSON) ingestion — the clp_s analog, Spark-first.

Reference model (SURVEY.md §1.2): clp_s parses JSON records into a dynamic
schema tree of typed nodes (clp_s/SchemaTree.hpp:32-46); each record's set
of leaf nodes is its *schema*, interned to a dense id by SchemaMap
(clp_s/SchemaMap.hpp:10-23); records are routed to one columnar table per
schema id (clp_s/ArchiveWriter.cpp:257-268).

Spark re-expression:
  * the schema TREE is Spark's own StructType, grown by schema inference
    over the corpus (`spark.read.json` merge — the MST analog);
  * a record's SCHEMA is the set of present (non-null) leaf paths, computed
    as a codegen'd array expression — no Python;
  * the schema id is a content hash of that path set (the same
    deterministic-id choice as the logtype dictionary: embarrassingly
    parallel, stable across retries, no global ordered shuffle);
  * per-schema tables = `partitionBy(schema_id)` on write (same shuffle-free
    fan-out as the messages sink in plans/ingest.py);
  * KQL over typed columns works directly: nested paths are Column
    references into the struct (Catalyst resolves `err.code`), so the
    reference's per-schema filter evaluators (QueryRunner.hpp:179-282)
    collapse into one Catalyst filter over the routed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union-merge two schema trees (the schema-registry pattern: new
    batches widen the known tree, like clp_s's MST absorbing new nodes).
    On a type conflict the wider/string type wins."""
    fields: dict[str, T.StructField] = {f.name: f for f in a.fields}
    for f in b.fields:
        prev = fields.get(f.name)
        if prev is None:
            fields[f.name] = f
        elif isinstance(prev.dataType, T.StructType) and isinstance(f.dataType, T.StructType):
            fields[f.name] = T.StructField(
                f.name, merge_schemas(prev.dataType, f.dataType), True
            )
        elif prev.dataType != f.dataType:
            fields[f.name] = T.StructField(f.name, T.StringType(), True)
    return T.StructType([fields[k] for k in sorted(fields)])


def infer_json_schema(
    spark: SparkSession,
    df: DataFrame,
    json_col: str,
    sample_rows: int = 2048,
    prior: T.StructType | None = None,
) -> T.StructType:
    """Grow the schema tree (clp_s MST analog) — RDD-free and sample-based.

    A LIMIT collects up to `sample_rows` raw JSON strings to the driver
    (at scale this touches only the first file splits, never the corpus),
    Spark's JSON inference runs over that driver-local sample, and the
    result is union-merged with `prior` (maintain the prior in a registry
    table across batches: rare keys missing from one sample stay known).
    The earlier implementation round-tripped the ENTIRE corpus through a
    Python RDD purely to infer a schema — a full extra pass at Python
    speed at 100 TB.

    Coverage assumption: every key appears within the first `sample_rows`
    rows of the input (or is supplied via `prior`). For archive ingest —
    where a silently-dropped late key would be data loss in the on-disk
    sink — use :func:`infer_json_schema_partitioned`, which samples every
    partition.
    """
    sample = [r[0] or "{}" for r in df.select(json_col).limit(sample_rows).collect()]
    inferred = spark.read.json(
        spark.sparkContext.parallelize(sample or ["{}"], 1)
    ).schema
    return merge_schemas(prior, inferred) if prior is not None else inferred


def infer_json_schema_partitioned(
    spark: SparkSession,
    df: DataFrame,
    json_col: str,
    per_partition: int = 1024,
    prior: T.StructType | None = None,
) -> T.StructType:
    """Distributed schema-tree growth: per-PARTITION sampling + merge.

    One narrow Arrow pass takes the first `per_partition` raw JSON strings
    from EVERY partition (schema drift usually arrives with new
    files/partitions over time, which a single global LIMIT never sees),
    Spark's JSON inference runs over the union of samples, and the result
    union-merges with `prior`. Coverage assumption (documented, per the
    archive-ingest contract): every key appears within the first
    `per_partition` rows of at least one partition; corpora with rarer keys
    must pass an explicit schema or maintain a `prior` registry across
    batches (the reference MST absorbs every record during its native parse
    — clp_s/SchemaTree.hpp:32-46)."""

    def run(batches):
        import pyarrow as pa

        left = per_partition  # mapInArrow: one generator per PARTITION
        for b in batches:
            if left <= 0:
                return
            m = min(left, b.num_rows)
            left -= m
            yield pa.RecordBatch.from_arrays([b.column(0).slice(0, m)], ["j"])

    sampled = df.select(F.col(json_col).alias("j")).mapInArrow(run, "j string")
    rows = [r["j"] or "{}" for r in sampled.collect()]
    inferred = spark.read.json(
        spark.sparkContext.parallelize(rows or ["{}"], max(1, len(rows) // 8192))
    ).schema
    return merge_schemas(prior, inferred) if prior is not None else inferred


def leaf_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    """Dotted paths of all leaf nodes (schema-tree leaves)."""
    out: list[str] = []
    for f in schema.fields:
        p = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(leaf_paths(f.dataType, p + "."))
        else:
            out.append(p)
    return out


def parse_json(
    df: DataFrame, json_col: str, schema: T.StructType, parsed_col: str = "rec"
) -> DataFrame:
    """Typed parse of the JSON column (from_json — JVM-side, no Python)."""
    return df.withColumn(parsed_col, F.from_json(F.col(json_col), schema))


def with_schema_id(
    df: DataFrame, schema: T.StructType, parsed_col: str = "rec"
) -> DataFrame:
    """Attach schema_keys (sorted present-leaf-path set) and schema_id.

    Analog of SchemaMap::get_schema_id (clp_s/SchemaMap.hpp:10-23) with
    content-hash ids instead of first-seen dense ids.
    """
    paths = leaf_paths(schema)
    present = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"{parsed_col}.{p}").isNotNull(), F.lit(p))
                for p in paths
            ]
        )
    )
    return df.withColumn("schema_keys", F.array_join(present, ",")).withColumn(
        "schema_id", F.xxhash64("schema_keys")
    )


def ingest_json(
    spark: SparkSession,
    df: DataFrame,
    json_col: str = "json",
    schema: T.StructType | None = None,
) -> DataFrame:
    """Full clp_s-style parse: typed records + schema ids, ready for
    per-schema routing (`.write.partitionBy('schema_id')`) or direct query."""
    if schema is None:
        schema = infer_json_schema(spark, df, json_col)
    return with_schema_id(parse_json(df, json_col, schema), schema)


def schema_table(parsed: DataFrame, schema_keys: str, parsed_col: str = "rec") -> DataFrame:
    """One schema's columnar table: only its leaf columns, non-null
    (SchemaReader view of a routed table)."""
    rows = parsed.filter(F.col("schema_keys") == schema_keys)
    cols = [c for c in schema_keys.split(",") if c]
    return rows.select(
        "event_id", *[F.col(f"{parsed_col}.{p}").alias(p.replace(".", "_")) for p in cols]
    )


def with_schema_id_structurized(
    df: DataFrame, schema: T.StructType, parsed_col: str = "rec", max_elems: int = 64
) -> DataFrame:
    """`--structurize-arrays` analog (reference StructuredArray node type,
    clp_s/SchemaTree.hpp:32-46 + JsonParser structurize mode): each array
    ELEMENT becomes its own schema node `path[i]`, so records with
    different array lengths land in different schemas. Non-array leaves
    contribute their path as before; schema_keys is sorted for a canonical
    set representation."""
    parts = []
    for p in leaf_paths(schema):
        col = F.col(f"{parsed_col}.{p}")
        dt = _leaf_type(schema, p)
        if isinstance(dt, T.ArrayType):
            parts.append(
                F.when(
                    col.isNotNull(),
                    F.expr(
                        f"transform(sequence(0, least(size({parsed_col}.{p}), {max_elems}) - 1), "
                        f"i -> concat('{p}[', i, ']'))"
                    ),
                ).otherwise(F.expr("cast(array() as array<string>)"))
            )
        else:
            parts.append(
                F.when(col.isNotNull(), F.array(F.lit(p))).otherwise(
                    F.expr("cast(array() as array<string>)")
                )
            )
    present = F.array_sort(F.flatten(F.array(*parts)))
    return df.withColumn("schema_keys", F.array_join(present, ",")).withColumn(
        "schema_id", F.xxhash64("schema_keys")
    )


def _leaf_type(schema: T.StructType, dotted: str) -> T.DataType:
    cur: T.DataType = schema
    for part in dotted.split("."):
        assert isinstance(cur, T.StructType), dotted
        cur = cur[part].dataType
    return cur


# --------------------------------------------------------------------------
# clp_s string-column encoding (ClpString / VarString)
#
# Reference typing rule (clp_s/JsonParser.cpp:557-583): a JSON string value
# under a timestamp key becomes a date; a string CONTAINING A SPACE becomes
# a ClpString — recursively CLP-encoded into logtype + variables with
# dictionaries (clp_s/ColumnWriter.cpp:95-105, ClpStringColumnWriter) — and
# any other string a VarString stored through the variable dictionary
# (VariableStringColumnWriter). This is THE clp-json compression story:
# free-text fields inside JSON records compress like log messages, and
# wildcard search reaches inside them through the same dictionary pruning.
#
# Spark re-expression: one narrow (row, path, value) store for all string
# leaves; ClpString rows run the SAME parse UDF as the log pipeline;
# VarString rows are represented uniformly as a one-placeholder template
# "\x12" whose single dictionary variable is the whole value. Both kinds
# then share ONE logtype dictionary + ONE variable dictionary, and decode /
# search reuse the message-store machinery verbatim (key_cols generalizes
# the (conv_id, turn_idx) keys to (row id, path)).
# --------------------------------------------------------------------------

from ..functions.hash64 import hash64_str as _hash64_str

TIMESTAMP_KEYS = frozenset({"ts", "timestamp", "@timestamp", "datetime", "date"})

# the VarString pseudo-template: one dictionary placeholder, nothing else
VARSTRING_LOGTYPE = "\x12"
VARSTRING_LOGTYPE_ID = _hash64_str(VARSTRING_LOGTYPE)


def string_leaf_paths(schema: T.StructType) -> list[str]:
    """String-typed leaf paths subject to the clp_s string typing rule
    (timestamp-named keys are excluded — they type as dates)."""
    out = []
    for p in leaf_paths(schema):
        if p.rsplit(".", 1)[-1].lower() in TIMESTAMP_KEYS:
            continue
        if isinstance(_leaf_type(schema, p), T.StringType):
            out.append(p)
    return out


def json_string_store(
    parsed: DataFrame,
    schema: T.StructType,
    id_col: str = "event_id",
    parsed_col: str = "rec",
) -> DataFrame:
    """Narrow store of every non-null string leaf: (id, path, value).

    One codegen'd explode — rows fan out by #string-leaves-present, carrying
    only the string payloads (never the full record)."""
    paths = string_leaf_paths(schema)
    if not paths:
        return parsed.sparkSession.createDataFrame(
            [], f"{id_col} long, path string, value string"
        )
    pairs = F.array(
        *[
            F.struct(F.lit(p).alias("path"), F.col(f"{parsed_col}.{p}").alias("value"))
            for p in paths
        ]
    )
    return (
        parsed.select(F.col(id_col), F.explode(pairs).alias("kv"))
        .select(id_col, F.col("kv.path").alias("path"), F.col("kv.value").alias("value"))
        .filter(F.col("value").isNotNull())
    )


def encode_json_strings(store: DataFrame, id_col: str = "event_id") -> DataFrame:
    """Apply the clp_s string typing rule and encode — in ONE pass.

    ClpString rows (value contains a space) run the full CLP parse;
    VarString rows become the "\\x12" pseudo-template with the whole value
    as a single dictionary variable (id = content hash — the same var-dict
    id space as ClpString variables, so one dictionary serves both).
    Output columns: (id, path, kind, logtype, logtype_id, var_types,
    dict_vars, dict_var_ids, encoded_vars).

    The typing split happens INSIDE one mapInArrow pass (each input batch
    yields a ClpString output batch and a VarString output batch), so the
    upstream store — typically an un-persisted from_json parse of the whole
    corpus — is scanned exactly once. The previous design unioned two
    filtered branches, which recomputed that parse twice on materialization.
    Row order changes (irrelevant: every consumer aggregates or joins).
    """
    in_names = [f.name for f in store.schema.fields]
    id_idx = in_names.index(id_col)
    path_idx = in_names.index("path")
    val_idx = in_names.index("value")
    out_schema = T.StructType(
        [
            store.schema[id_col],
            T.StructField("path", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("logtype", T.StringType()),
            T.StructField("logtype_id", T.LongType()),
            T.StructField("var_types", T.ArrayType(T.IntegerType())),
            T.StructField("dict_vars", T.ArrayType(T.StringType())),
            T.StructField("dict_var_ids", T.ArrayType(T.LongType())),
            T.StructField("encoded_vars", T.ArrayType(T.LongType())),
        ]
    )
    names = [f.name for f in out_schema.fields]

    def run(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from clp_spark.functions.hash64 import hash64_spans
        from clp_spark.functions.tokenizer_vec import encode_full_arrow

        for b in batches:
            value = b.column(val_idx)
            if len(value) == 0:
                continue
            mask = pc.fill_null(pc.match_substring(value, " "), False).to_numpy(
                zero_copy_only=False
            )

            idx_clp = np.flatnonzero(mask)
            if len(idx_clp):
                take = pa.array(idx_clp)
                enc = encode_full_arrow(pc.take(value, take))
                yield pa.RecordBatch.from_arrays(
                    [
                        pc.take(b.column(id_idx), take),
                        pc.take(b.column(path_idx), take),
                        pa.array(np.full(len(idx_clp), "clp", dtype=object)),
                        enc["logtype"],
                        enc["logtype_id"],
                        enc["var_types"],
                        enc["dict_vars"],
                        enc["dict_var_ids"],
                        enc["encoded_vars"],
                    ],
                    names,
                )

            idx_var = np.flatnonzero(~mask)
            if len(idx_var):
                take = pa.array(idx_var)
                vals = pc.take(value, take)
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
                # hash each value's UTF-8 bytes straight from the Arrow
                # buffers (no Python str objects)
                big = vals.cast(pa.large_string())
                bufs = big.buffers()
                raw = bufs[2]
                obuf = (
                    np.frombuffer(raw, dtype=np.uint8, count=raw.size)
                    if raw is not None
                    else np.zeros(0, dtype=np.uint8)
                )
                offs = np.frombuffer(bufs[1], dtype=np.int64)[
                    big.offset : big.offset + len(big) + 1
                ]
                vids = pa.array(hash64_spans(obuf, offs[:-1], offs[1:]), type=pa.int64())
                k = len(idx_var)
                offs1 = pa.array(np.arange(k + 1, dtype=np.int32))
                yield pa.RecordBatch.from_arrays(
                    [
                        pc.take(b.column(id_idx), take),
                        pc.take(b.column(path_idx), take),
                        pa.array(np.full(k, "var", dtype=object)),
                        pa.array(np.full(k, VARSTRING_LOGTYPE, dtype=object)),
                        pa.array(np.full(k, VARSTRING_LOGTYPE_ID, dtype=np.int64)),
                        pa.ListArray.from_arrays(
                            offs1, pa.array(np.full(k, 18, dtype=np.int32))
                        ),
                        pa.ListArray.from_arrays(offs1, vals.cast(pa.string())),
                        pa.ListArray.from_arrays(offs1, vids),
                        pa.ListArray.from_arrays(offs1, vids),
                    ],
                    names,
                )

    return store.mapInArrow(run, schema=out_schema)


def json_string_dicts(encoded: DataFrame):
    """(logtype_dict, var_dict) for an encoded string store — the JSON
    archive's own dictionaries (reference: per-archive var.dict/log.dict
    shared by all ClpString/VarString columns)."""
    from . import pipeline as P

    return P.build_logtype_dict(encoded), P.build_var_dict(encoded)


def decode_json_strings(
    spark: SparkSession,
    encoded: DataFrame,
    lt_rows,
    vd_rows,
    id_col: str = "event_id",
) -> DataFrame:
    """Round-trip decode: (id, path, text) — byte-exact against the store."""
    from . import pipeline as P

    return P.decode_messages_dictmap(
        spark,
        encoded.select(id_col, "path", "logtype_id", "encoded_vars"),
        lt_rows,
        vd_rows,
        key_cols=(id_col, "path"),
    )


def search_json_strings(
    encoded: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    query: str,
    id_col: str = "event_id",
    **kw,
) -> DataFrame:
    """Wildcard search INSIDE JSON string values (the clp_s ClpString search
    path, reference test-clp_s-search.cpp:205-330): same dictionary pruning
    + confirm staging as message search, keyed by (id, path)."""
    from .grep import search

    return search(
        encoded.select(id_col, "path", "logtype_id", "encoded_vars"),
        logtype_dict,
        var_dict,
        query,
        key_cols=(id_col, "path"),
        **kw,
    )


def resolve_projection(schema: T.StructType, patterns: list[str]) -> list[tuple[str, ...]]:
    """clp_s search-level projection resolution (reference
    clp_s/search/Projection.cpp, wired in clp_s/clp-s.cpp:197-228): each
    (possibly wildcarded, possibly escaped) column pattern resolves against
    the schema tree to concrete leaf paths; a non-wildcard pattern that
    matches nothing is an error, exactly like the reference's
    invalid-projection failure. Duplicates are dropped, order preserved."""
    from .kql import KqlError, _parse_column, _resolve_paths

    out: list[tuple[str, ...]] = []
    seen: set[tuple[str, ...]] = set()
    for pat in patterns:
        col = _parse_column(pat, quoted=False)
        paths = _resolve_paths(schema, col)
        if not paths and not any("*" in t or "?" in t for t in col.tokens):
            raise KqlError(f"projection column {pat!r} resolves to nothing")
        for p in paths:
            if p not in seen:
                seen.add(p)
                out.append(p)
    return out


def project_json(
    parsed: DataFrame,
    patterns: list[str],
    parsed_col: str = "rec",
    id_cols: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Return only the selected JSON paths (the clp_s --projection search
    option): id columns + one output column per resolved leaf, aliased with
    '_'-joined path segments. Column pruning reaches the scan (Catalyst
    prunes the from_json struct to the referenced fields)."""
    rec_schema = parsed.schema[parsed_col].dataType
    assert isinstance(rec_schema, T.StructType)
    paths = resolve_projection(rec_schema, patterns)
    cols = [F.col(c) for c in id_cols]
    for p in paths:
        c = F.col(parsed_col)
        for seg in p:
            c = c.getField(seg)
        cols.append(c.alias("_".join(p)))
    return parsed.select(*cols)


def schema_subset(schema: T.StructType, patterns: list[str]) -> T.StructType:
    """Prune the schema tree to the leaves matching `patterns` (wildcards
    allowed) — explicit clp_s-style projection pushdown for from_json.

    Catalyst's JSON expression optimization does not reliably narrow a
    from_json that feeds multiple consumers, and at 100 TB parsing unused
    JSON fields is pure waste: parse_json(df, col, schema_subset(schema,
    needed)) makes the pruning part of the declared plan."""
    paths = resolve_projection(schema, patterns)
    root: dict = {}
    for p in paths:
        cur = root
        for seg in p[:-1]:
            cur = cur.setdefault(seg, {})
        cur.setdefault(p[-1], None)

    def build(node: dict, sch: T.StructType) -> T.StructType:
        fields = []
        for f in sch.fields:
            if f.name not in node:
                continue
            sub = node[f.name]
            if sub is None:
                fields.append(f)
            else:
                assert isinstance(f.dataType, T.StructType)
                fields.append(
                    T.StructField(f.name, build(sub, f.dataType), f.nullable)
                )
        return T.StructType(fields)

    return build(root, schema)


def ingest_json_archive(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    json_col: str = "json",
    id_col: str = "event_id",
    schema: T.StructType | None = None,
    n_buckets: int = 16,
) -> dict:
    """On-disk clp_s archive analog: typed records routed to per-schema
    buckets + the encoded string store + shared dictionaries + a manifest
    (reference ArchiveWriter.cpp:257-268 per-schema tables;
    ColumnWriter.cpp ClpString/VarString dictionaries).

    Sinks under out_dir:
      records/        typed rows, partitioned by schema_bucket
                      (pmod(schema_id, n_buckets) — clp_s's one-table-per-
                      schema becomes hash-bucketed partitions, same
                      shuffle-free fan-out as the message store)
      json_strings/   (id, path, kind, logtype_id, encoded_vars)
      logtype_dict/ var_dict/
      _manifest.json  row/schema counts
    Same staging + atomic-rename commit discipline as plans/ingest.py.
    """
    import json as _json
    import os
    import shutil as _sh

    if schema is None:
        # archive ingest: a key the sample misses is silently ABSENT from
        # the on-disk records table and string store — use the per-partition
        # sampler (coverage assumption documented there), not the global
        # first-N sample.
        schema = infer_json_schema_partitioned(spark, df, json_col)
    parsed = with_schema_id(parse_json(df, json_col, schema), schema)
    store = json_string_store(parsed, schema, id_col=id_col)
    encoded = encode_json_strings(store, id_col=id_col).persist()
    lt, vd = json_string_dicts(encoded)

    os.makedirs(out_dir, exist_ok=True)

    def commit(write_fn, step):
        staging = os.path.join(out_dir, "_staging", step)
        final = os.path.join(out_dir, step)
        _sh.rmtree(staging, ignore_errors=True)
        _sh.rmtree(final, ignore_errors=True)
        write_fn(staging)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        os.replace(staging, final)

    records = parsed.withColumn(
        "schema_bucket", F.pmod(F.col("schema_id"), F.lit(n_buckets)).cast("int")
    )
    commit(
        lambda d: records.sortWithinPartitions("schema_bucket")
        .write.mode("overwrite").partitionBy("schema_bucket").parquet(d),
        "records",
    )
    commit(
        lambda d: encoded.select(
            id_col, "path", "kind", "logtype_id", "encoded_vars"
        ).write.mode("overwrite").parquet(d),
        "json_strings",
    )
    commit(lambda d: lt.write.mode("overwrite").parquet(d), "logtype_dict")
    commit(lambda d: vd.write.mode("overwrite").parquet(d), "var_dict")
    encoded.unpersist()

    n_records = spark.read.parquet(os.path.join(out_dir, "records")).count()
    n_schemas = (
        spark.read.parquet(os.path.join(out_dir, "records"))
        .select("schema_id").distinct().count()
    )
    manifest = {"n_records": n_records, "n_schemas": n_schemas}
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=2, sort_keys=True)
    # sinks rewritten: stale collected/broadcast dictionaries must not
    # survive a same-path re-ingest within this session
    from ..caching import invalidate_dict_caches

    invalidate_dict_caches()
    return manifest


def search_json_archive(spark: SparkSession, out_dir: str, query: str, **kw) -> DataFrame:
    """Wildcard search inside a written JSON archive's encoded strings."""
    import os

    enc = spark.read.parquet(os.path.join(out_dir, "json_strings"))
    lt = spark.read.parquet(os.path.join(out_dir, "logtype_dict"))
    vd = spark.read.parquet(os.path.join(out_dir, "var_dict"))
    from .grep import search

    return search(
        enc.select("event_id", "path", "logtype_id", "encoded_vars"),
        lt, vd, query, key_cols=("event_id", "path"), **kw,
    )
