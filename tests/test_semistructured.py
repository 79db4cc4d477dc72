"""clp_s analog: schema inference, schema-id routing, structural round trip
(reference test-clp_s-end_to_end.cpp:187-259 compress->extract->structural
JSON equality)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from clp_spark.plans.semistructured import (
    infer_json_schema,
    ingest_json,
    leaf_paths,
    schema_table,
)
from clp_spark.sources.jsonlogs import load_jsonlogs

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def parsed(spark):
    return ingest_json(spark, load_jsonlogs(spark, SF_DIR)).persist()


def test_schema_ids_partition_records(spark, parsed):
    groups = parsed.groupBy("schema_id", "schema_keys").count().collect()
    assert len(groups) == 4  # four record shapes in the corpus
    # id is a pure function of the key set
    assert len({g["schema_id"] for g in groups}) == 4


def test_schema_table_projects_only_its_leaves(spark, parsed):
    keys = parsed.select("schema_keys").distinct().collect()
    some = sorted(r["schema_keys"] for r in keys)[0]
    tbl = schema_table(parsed, some)
    assert set(tbl.columns) == {"event_id"} | {c.replace(".", "_") for c in some.split(",")}
    assert tbl.count() > 0
    # no null leaves inside a schema's own table
    for c in tbl.columns:
        assert tbl.filter(F.col(c).isNull()).count() == 0


def _strip_nulls(d):
    if isinstance(d, dict):
        return {k: _strip_nulls(v) for k, v in d.items() if v is not None}
    if isinstance(d, list):
        return [_strip_nulls(x) for x in d]
    return d


def test_structural_roundtrip(spark, parsed):
    """to_json(from_json(x)) must be structurally identical to x (key order
    and float formatting normalized via python json)."""
    back = parsed.select("event_id", "json", F.to_json("rec").alias("rejson")).collect()
    for r in back:
        a = _strip_nulls(json.loads(r["json"]))
        b = _strip_nulls(json.loads(r["rejson"]))
        assert a == b, (r["event_id"], a, b)


def test_inference_merges_all_shapes(spark):
    df = load_jsonlogs(spark, SF_DIR)
    schema = infer_json_schema(spark, df, "json")
    assert set(leaf_paths(schema)) == {
        "component", "err.code", "err.msg", "host", "latency_ms",
        "level", "metric", "tags", "value",
    }
