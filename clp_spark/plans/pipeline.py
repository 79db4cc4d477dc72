"""The parse -> encode -> enrich -> route -> aggregate plan.

Spark-first re-expression of CLP's compression path
(reference walk: clp/clp/FileCompressor.cpp -> clp/streaming_archive/writer/
Archive.cpp:299-316 write_msg -> EncodedVariableInterpreter.hpp:317-336):

  raw turns --pandas_udf(tokenize+encode+hash)--> parsed  (ids born in-UDF)
      parsed --groupBy--> logtype dictionary, var dictionary (content-hash ids)
      parsed --broadcast join--> role/tool enrichment
      parsed --repartition(bucket, salt)--> per-logtype-bucket sinks
      parsed --groupBy--> per-logtype / per-tool / per-conversation counts

Design-for-scale notes:
  * dictionary IDs are content hashes (functions/hash64.py, computed inside
    the parse UDF over the flat byte buffers), not first-seen dense ids —
    dense assignment needs a global ordered shuffle; content hashing is
    embarrassingly parallel, deterministic across retries/executors, and
    collision-safe to ~1e9 distinct entries (birthday p < 3%); the dictionary
    tables keep (id, string) so round-trip decode never depends on luck.
    Hashing in-UDF (not JVM xxhash64) lets the ids-only hot path
    (parse_encode_ids) skip materializing template/variable strings through
    Arrow entirely.
  * per-turn work happens once in ONE Arrow-batched UDF; everything after is
    whole-stage-codegen column ops (no Python in the agg/join/route path).
  * the logtype distribution is Zipfian (one hot template >= 40% of rows) —
    routed writes salt the partition key so a hot logtype spreads over
    `n_salts` tasks instead of one straggler; AQE skew-join covers the read
    side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

def ts_millis(ts_col: str) -> Column:
    """Epoch millis from a timestamp column. The cast normalizes
    TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) to session-tz instants;
    the session is pinned to UTC (clp_spark/session.py) so this matches
    DuckDB's naive-as-UTC epoch_ms semantics."""
    return F.unix_millis(F.col(ts_col).cast("timestamp"))


PARSED_EXTRA_FIELDS = [
    StructField("logtype", StringType()),
    StructField("var_types", ArrayType(IntegerType())),
    StructField("dict_vars", ArrayType(StringType())),
    StructField("logtype_id", LongType()),
    StructField("dict_var_ids", ArrayType(LongType())),
    StructField("encoded_vars", ArrayType(LongType())),
]

_ENCODED_STRUCT = StructType(PARSED_EXTRA_FIELDS)


@F.pandas_udf(_ENCODED_STRUCT)
def _encode_udf(texts: pd.Series) -> pd.DataFrame:
    # import inside the worker so --py-files deployment works
    from clp_spark.functions.tokenizer import encode_series

    pdf = encode_series(texts)
    return pdf[["logtype", "var_types", "dict_vars", "logtype_id", "dict_var_ids", "encoded_vars"]]


def parse_encode_scalar(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar-pandas-UDF variant of parse_encode — use when downstream MIGHT
    not consume the parse outputs: a scalar UDF in a Project is ELIDED by
    Catalyst column pruning when nothing references its struct (a declared-
    then-unused parse costs zero), whereas the mapInArrow node in
    parse_encode is a black-box barrier Catalyst cannot remove. When the
    outputs ARE consumed, prefer parse_encode: its Arrow-native
    marshalling is faster than this path's pandas object columns."""
    return transcripts.withColumn("_enc", _encode_udf(F.col(text_col))).select(
        "*", "_enc.*"
    ).drop("_enc")


def parse_encode(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenize + encode every turn's text (one Arrow-NATIVE pass).

    mapInArrow: input text bytes come straight from the Arrow string
    buffers, outputs (template strings, dict-var strings, id/encoded
    arrays) are built as Arrow arrays from numpy buffers, and passthrough
    columns are copied at the Arrow level — NO pandas object columns
    anywhere ("vectorized pandas/Arrow UDFs ... never per-row Python").
    Adds: logtype, var_types, dict_vars (slot-ordered), and the
    content-hash ids logtype_id / dict_var_ids / encoded_vars (dict slots
    filled with ids — the ragged-array layout of reference
    File.hpp:257-259, kept per row). Ids are hashed INSIDE the UDF over
    the flat byte buffers (functions/hash64.py) — hashing JVM-side would
    only re-read the very strings whose transfer the ids exist to avoid.
    For the messages-only path use parse_encode_ids, which skips
    materializing template/variable strings entirely.
    """
    import pyarrow as pa

    out_schema = StructType(
        [f for f in transcripts.schema.fields] + PARSED_EXTRA_FIELDS
    )
    names = [f.name for f in out_schema.fields]
    in_names = [f.name for f in transcripts.schema.fields]
    text_idx = in_names.index(text_col)

    def run(batches):
        from clp_spark.functions.tokenizer_vec import encode_full_arrow

        for b in batches:
            enc = encode_full_arrow(b.column(text_idx))
            arrays = [b.column(i) for i in range(b.num_columns)] + [
                enc["logtype"], enc["var_types"], enc["dict_vars"],
                enc["logtype_id"], enc["dict_var_ids"], enc["encoded_vars"],
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return transcripts.mapInArrow(run, schema=out_schema)


def parse_encode_ids(transcripts: DataFrame, text_col: str = "text") -> DataFrame:
    """Ids-only parse for the parsed+routed hot path: adds ONLY
    (logtype_id, encoded_vars) via an Arrow-native mapInArrow pass.

    Exactly the reference message layout (File.hpp:257-259): the message
    store never carries template/variable STRINGS — those belong to the
    dictionaries. Avoiding their materialization cuts the parse stage's
    Arrow traffic by ~an order of magnitude, which is what keeps N->4N
    scaling efficient on bandwidth-bound executors. Passthrough columns are
    copied at the Arrow level (no Python objects)."""
    import pyarrow as pa

    out_schema = StructType(
        [f for f in transcripts.schema.fields]
        + [
            StructField("logtype_id", LongType()),
            StructField("encoded_vars", ArrayType(LongType())),
        ]
    )
    names = [f.name for f in out_schema.fields]
    in_names = [f.name for f in transcripts.schema.fields]

    def run(batches):
        from clp_spark.functions.tokenizer_vec import encode_ids_arrow

        for b in batches:
            lid, ev = encode_ids_arrow(b.column(in_names.index(text_col)))
            arrays = [b.column(i) for i in range(b.num_columns)] + [lid, ev]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return transcripts.mapInArrow(run, schema=out_schema)


@F.pandas_udf(ArrayType(IntegerType()))
def _var_kinds_udf(logtypes: pd.Series) -> pd.Series:
    """Placeholder-kind sequence of each template (0x11/0x12/0x13 per var)."""
    from clp_spark.functions.tokenizer import _template_parts

    return logtypes.map(lambda lt: [ord(k) for k in _template_parts(lt or "")[1]])


def build_logtype_dict(parsed: DataFrame) -> DataFrame:
    """Logtype dictionary: (logtype_id, logtype, var_kinds, n_messages).

    Analog of reference LogTypeDictionaryWriter (clp/LogTypeDictionaryWriter.hpp:37)
    — Spark's partial+final hash aggregate replaces the intern map.
    `var_kinds` (the template's placeholder types, reference
    LogTypeDictionaryEntry::get_placeholder_info) lets the message store
    drop its per-row dict_var_ids column: dict ids are recoverable from
    encoded_vars + the template, exactly like the reference's ragged layout.
    The udf runs over dictionary ENTRIES (tiny), not rows.
    """
    return (
        parsed.groupBy("logtype_id", "logtype")
        .agg(F.count("*").alias("n_messages"))
        .withColumn("var_kinds", _var_kinds_udf("logtype"))
    )


def build_var_dict(parsed: DataFrame) -> DataFrame:
    """Variable dictionary: (var_id, var_str, n_occurrences).

    Analog of reference VariableDictionaryWriter (clp/VariableDictionaryWriter.cpp:11-41).
    """
    return (
        parsed.select(
            F.explode(F.arrays_zip("dict_var_ids", "dict_vars")).alias("v")
        )
        .groupBy(
            F.col("v.dict_var_ids").alias("var_id"),
            F.col("v.dict_vars").alias("var_str"),
        )
        .agg(F.count("*").alias("n_occurrences"))
        .select("var_id", "var_str", "n_occurrences")
    )


def dense_ids(dict_df: DataFrame, id_col: str, order_col: str) -> DataFrame:
    """Optional dense 0..N-1 ids (reference first-seen-wins analog,
    deterministic here by ordering on content). Single-partition window —
    only for small dictionaries / parity debugging; hashes are the scale path."""
    w = Window.orderBy(order_col)
    return dict_df.withColumn(id_col, F.row_number().over(w) - F.lit(1))


def enrich(parsed: DataFrame, dim_role: DataFrame, dim_tool: DataFrame) -> DataFrame:
    """Broadcast-hash enrich (analog of CLP var-dict lookup joins,
    SURVEY.md §2.3; dims are tiny, never shuffled)."""
    return parsed.join(F.broadcast(dim_role), "role", "left").join(
        F.broadcast(dim_tool), "tool", "left"
    )


def route(parsed: DataFrame, n_buckets: int = 16, n_salts: int = 8) -> DataFrame:
    """Assign fan-out bucket + skew salt for per-logtype-bucket sinks.

    Analog of glt's per-logtype tables (glt/.../LogtypeTable.hpp:13-76) as
    hash-bucketed partitions. `repartition(bucket, salt)` spreads a hot
    logtype over n_salts writer tasks (salting per SURVEY.md §4.2).
    """
    routed = parsed.withColumn(
        "logtype_bucket", F.pmod(F.col("logtype_id"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        "salt",
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_salts)).cast("int"),
    )
    return routed.repartition("logtype_bucket", "salt")


def encoded_messages(parsed: DataFrame) -> DataFrame:
    """The encoded-message store — exactly the reference 3-column layout
    (ts, logtype_id, vars[]; File.hpp:257-259) plus transcript keys. No
    per-row type/id metadata: variable kinds live in the logtype dictionary
    (one entry per template), so dict ids are recovered by zipping
    encoded_vars with the template's var_kinds at decode."""
    return parsed.select(
        "conv_id", "turn_idx", "ts", "role", "tool", "logtype_id", "encoded_vars",
    )


def decode_messages(
    messages: DataFrame,
    logtype_dict: DataFrame,
    var_dict: DataFrame,
    *,
    broadcast_dicts: bool = True,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Decode join: messages ⋈ logtype_dict ⋈ var_dict -> original text.

    Analog of reference decode_variables_into_message
    (clp/EncodedVariableInterpreter.hpp:480-556). Dict-var strings are
    recovered by exploding dict_var_ids with position, joining the var
    dictionary, and re-collecting in slot order; the final render is one
    Arrow-batched UDF.
    """
    if "var_kinds" in logtype_dict.columns:
        lt = logtype_dict.select("logtype_id", "logtype", "var_kinds")
    else:  # dictionary from an older layout: derive kinds from the template
        lt = logtype_dict.select(
            "logtype_id", "logtype", _var_kinds_udf("logtype").alias("var_kinds")
        )
    vd = var_dict.select("var_id", "var_str")
    if broadcast_dicts:
        lt, vd = F.broadcast(lt), F.broadcast(vd)

    with_lt = messages.join(lt, "logtype_id", "left")
    if "dict_var_ids" not in with_lt.columns:
        # recover the dict-id subsequence from the template's placeholder
        # kinds (reference ragged-array semantics; VT_DICT = 0x12 = 18)
        with_lt = with_lt.withColumn(
            "dict_var_ids",
            F.expr(
                "transform(filter(arrays_zip(encoded_vars, var_kinds),"
                " p -> p.var_kinds = 18), p -> p.encoded_vars)"
            ),
        )

    # Recover slot-ordered dict var strings in ONE branch: posexplode_outer
    # keeps rows with no dict vars (pos=null), and the CASE inside
    # collect_list drops those null markers — no union, so the messages
    # input is scanned exactly once (a union would recompute an un-cached
    # upstream parse twice). The regroup key is a per-row surrogate id, not
    # (conv_id, turn_idx): callers without the key-uniqueness invariant
    # (e.g. the same rows ingested into two archives then unioned) must not
    # silently collapse rows / interleave two rows' pos lists.
    has_ts = "ts" in messages.columns and "ts" not in key_cols
    passthrough = list(key_cols) + (["ts"] if has_ts else [])
    combined = (
        with_lt.withColumn("_row_id", F.monotonically_increasing_id())
        .select(
            "_row_id", *passthrough, "logtype", "encoded_vars",
            F.posexplode_outer("dict_var_ids").alias("pos", "var_id"),
        )
        .join(vd, "var_id", "left")
        .groupBy("_row_id")
        .agg(
            *[F.first(c).alias(c) for c in passthrough],
            F.first("logtype").alias("logtype"),
            F.first("encoded_vars").alias("encoded_vars"),
            F.expr(
                "transform(array_sort(collect_list("
                "CASE WHEN pos IS NOT NULL THEN struct(pos, var_str) END"
                ")), s -> s.var_str)"
            ).alias("dict_vars"),
        )
    )

    # ts rides through the render (it is needed by every downstream
    # count-by-time / latest-N handler; re-joining the message store to
    # recover it would be a full shuffle join).
    render_schema = StructType(
        [messages.schema[c] for c in passthrough] + [StructField("text", StringType())]
    )
    out_names = passthrough + ["text"]
    comb_names = combined.columns
    pass_idx = [comb_names.index(c) for c in passthrough]
    i_lt, i_ev, i_dv = (
        comb_names.index(c) for c in ("logtype", "encoded_vars", "dict_vars")
    )

    def render(batches):
        import pyarrow as pa

        from clp_spark.functions.render_vec import render_joined_batch

        for b in batches:
            texts = render_joined_batch(b.column(i_lt), b.column(i_ev), b.column(i_dv))
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in pass_idx] + [texts], out_names
            )

    return combined.mapInArrow(render, schema=render_schema)


def per_logtype_counts(parsed: DataFrame) -> DataFrame:
    return parsed.groupBy("logtype").agg(F.count("*").alias("cnt"))


def per_tool_counts(enriched: DataFrame) -> DataFrame:
    return enriched.groupBy("tool", "tool_family", "cost_class").agg(
        F.count("*").alias("cnt")
    )


def per_conversation_counts(parsed: DataFrame) -> DataFrame:
    return parsed.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.min(ts_millis("ts")).alias("first_ts_ms"),
        F.max(ts_millis("ts")).alias("last_ts_ms"),
    )


def count_by_time(df: DataFrame, bucket_ms: int = 3_600_000, ts_col: str = "ts") -> DataFrame:
    """Tumbling count-by-time with reference bucket semantics
    bucket = (ts_ms / B) * B, integer division
    (reference clp/clo/OutputHandler.hpp:271-273)."""
    bucket = F.expr(f"unix_millis(cast({ts_col} as timestamp)) div {bucket_ms}") * F.lit(bucket_ms)
    return df.groupBy(bucket.alias("bucket_ms")).agg(F.count("*").alias("cnt"))


def count_logtype_vars(logtype: str) -> int:
    """Number of variable placeholders in a logtype template (escape-aware)."""
    n = 0
    i = 0
    while i < len(logtype):
        c = logtype[i]
        if c == "\\":
            i += 2
            continue
        if c in ("\x11", "\x12", "\x13"):
            n += 1
        i += 1
    return n


def logtype_table(messages: DataFrame, logtype_dict: DataFrame, logtype: str) -> DataFrame:
    """glt-style per-logtype pivot: one table per template with the ragged
    variable array pivoted to real columns (ts, keys, var_0..var_{n-1}) —
    the Spark analog of glt's LogtypeTable
    (reference glt/streaming_archive/writer/LogtypeTable.hpp:13-76).

    The template string resolves to its content-hash id driver-side (no
    scan); the filter + array-index projection is pure codegen, and on a
    bucket-partitioned messages sink the logtype_id filter prunes files via
    parquet min-max/dictionary stats.
    """
    n_vars = count_logtype_vars(logtype)
    lid_row = logtype_dict.filter(F.col("logtype") == logtype).select("logtype_id").first()
    if lid_row is None:
        base = messages.filter(F.lit(False))
    else:
        base = messages.filter(F.col("logtype_id") == lid_row["logtype_id"])
    return base.select(
        "conv_id",
        "turn_idx",
        "ts",
        *[F.col("encoded_vars").getItem(i).alias(f"var_{i}") for i in range(n_vars)],
    )


def parse_encode_with_schema(
    transcripts: DataFrame, schema, text_col: str = "text"
) -> DataFrame:
    """Schema-file (grok) variant of parse_encode: user variable patterns
    instead of the built-in heuristic (reference write_msg_using_schema,
    clp/streaming_archive/writer/Archive.cpp:318-451). Same output columns,
    same downstream pipeline."""

    @F.pandas_udf(_ENCODED_STRUCT)
    def schema_udf(texts: pd.Series) -> pd.DataFrame:
        from clp_spark.functions.grok import encode_batch_schema
        from clp_spark.functions.hash64 import add_id_columns

        pdf = add_id_columns(encode_batch_schema(texts, schema))
        return pdf[
            ["logtype", "var_types", "dict_vars", "logtype_id", "dict_var_ids", "encoded_vars"]
        ]

    return transcripts.withColumn("_enc", schema_udf(F.col(text_col))).select(
        "*", "_enc.*"
    ).drop("_enc")


# Bounded broadcast cache for the dictmap decode: repeated searches in one
# session reuse the shipped dictionary maps instead of leaking one broadcast
# per query. Keyed by a content fingerprint (sizes + boundary ids) — cheap,
# and collision-safe in practice since dictionaries are content-hashed.
# Registered with the shared cache registry: cleared (broadcasts unpersisted)
# when ingest() rewrites sinks in-session.
_BC_CACHE: dict = {}
_BC_CACHE_MAX = 4


def _clear_bc_cache() -> None:
    while _BC_CACHE:
        _, old = _BC_CACHE.popitem()
        old.unpersist()


from ..caching import register_dict_cache as _register_dict_cache  # noqa: E402

_register_dict_cache(_clear_bc_cache)


def _dict_broadcast(spark, logtype_rows, var_rows):
    """Broadcast pre-built decode structures (templates split once, var
    dictionary as sorted arrays) — executors never re-derive them per task."""
    from ..functions.render_vec import DictLookup, TemplateTable

    def fp(rows):
        head = tuple(int(r[0]) for r, _ in zip(iter(rows), range(3)))
        return (len(rows), head, sum(int(r[0]) for r in rows) & ((1 << 64) - 1))

    key = (fp(logtype_rows), fp(var_rows))
    hit = _BC_CACHE.get(key)
    if hit is not None:
        return hit
    if len(_BC_CACHE) >= _BC_CACHE_MAX:
        _, old = _BC_CACHE.popitem()
        old.unpersist()
    bc = spark.sparkContext.broadcast(
        (TemplateTable(logtype_rows), DictLookup(var_rows))
    )
    _BC_CACHE[key] = bc
    return bc


def decode_messages_dictmap(
    spark,
    messages: DataFrame,
    logtype_rows,
    var_rows,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """Shuffle-free decode: dictionaries travel to executors as ONE Spark
    broadcast (templates pre-split, var dictionary as sorted arrays) and the
    render happens in one Arrow pass over the messages — no explode, no
    join, no groupBy, and no per-row Python: the batch is grouped by
    template, each variable slot renders as one numpy/Arrow column op, and
    the final strings assemble with Arrow's varargs concat kernel
    (functions/render_vec.py — the tokenizer_vec playbook in reverse).

    This mirrors the reference decompressor exactly: it loads logtype.dict
    and var.dict fully into memory before reading segments
    (clp/streaming_archive/reader/Archive.cpp:163-195). Use when the
    dictionaries fit in executor memory (CLP's own operating assumption);
    otherwise use decode_messages (broadcast-join based).

    logtype_rows: iterable of (logtype_id, logtype);
    var_rows: iterable of (var_id, var_str).
    """
    bc = _dict_broadcast(spark, list(logtype_rows), list(var_rows))

    has_ts = "ts" in messages.columns and "ts" not in key_cols
    passthrough = list(key_cols) + (["ts"] if has_ts else [])
    schema = StructType(
        [messages.schema[c] for c in passthrough] + [StructField("text", StringType())]
    )
    names = passthrough + ["text"]
    n_pass = len(passthrough)

    def render(batches):
        import numpy as np
        import pyarrow as pa

        from clp_spark.functions.render_vec import list_column_parts, render_groups

        templates, vd = bc.value
        for b in batches:
            lids = np.asarray(
                b.column(n_pass).to_numpy(zero_copy_only=False), dtype=np.int64
            )
            offs, vals = list_column_parts(b.column(n_pass + 1))
            texts = render_groups(lids, offs[:-1], vals, templates, vd=vd)
            yield pa.RecordBatch.from_arrays(
                [b.column(i) for i in range(n_pass)] + [texts], names
            )

    cols = passthrough + ["logtype_id", "encoded_vars"]
    return messages.select(*cols).mapInArrow(render, schema=schema)


def roundtrip_mismatch_count(
    spark,
    messages: DataFrame,
    logtype_rows,
    var_rows,
    text_col: str = "text",
) -> DataFrame:
    """Round-trip verify with the compare FOLDED INTO the decode pass.

    The decode measured at the Python-Arrow BRIDGE floor (an identity
    mapInArrow is slower than the decode itself — BASELINE.md r3), so the
    only way left to go faster is to ship fewer bytes: here only
    (text, logtype_id, encoded_vars) crosses into Python, the rendered
    strings are compared against the originals INSIDE the batch (one Arrow
    kernel), and a single int64 per partition crosses back — decoded
    strings, key and ts columns never ride the bridge at all. This is the
    co-streamed verify the reference decompressor does against its input
    (clp/streaming_archive/reader/Archive.cpp:163-195 order guarantee).
    Returns a 1-row DataFrame (mismatches bigint)."""
    bc = _dict_broadcast(spark, list(logtype_rows), list(var_rows))
    out_schema = StructType([StructField("mismatches", LongType())])

    def run(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from clp_spark.functions.render_vec import list_column_parts, render_groups

        templates, vd = bc.value
        total = 0
        for b in batches:
            lids = np.asarray(
                b.column(1).to_numpy(zero_copy_only=False), dtype=np.int64
            )
            offs, vals = list_column_parts(b.column(2))
            texts = render_groups(lids, offs[:-1], vals, templates, vd=vd)
            # null orig vs rendered text counts as a mismatch (fill True)
            neq = pc.fill_null(pc.invert(pc.equal(texts, b.column(0))), True)
            total += pc.sum(pc.cast(neq, pa.int64())).as_py() or 0
        yield pa.RecordBatch.from_arrays(
            [pa.array([total], type=pa.int64())], ["mismatches"]
        )

    per_part = messages.select(text_col, "logtype_id", "encoded_vars").mapInArrow(
        run, schema=out_schema
    )
    return per_part.agg(F.sum("mismatches").alias("mismatches"))
