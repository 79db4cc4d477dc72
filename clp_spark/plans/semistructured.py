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


def infer_json_schema(spark: SparkSession, df: DataFrame, json_col: str) -> T.StructType:
    """Grow the schema tree over the corpus (clp_s MST analog).

    Uses Spark's JSON schema inference with merging across all records.
    Scale note: at 10^12 rows infer over a sample (`df.sample(...)`) or
    maintain a registry table; inference itself is a distributed pass.
    """
    return spark.read.json(df.select(json_col).rdd.map(lambda r: r[0] or "")).schema


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
