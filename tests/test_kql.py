"""KQL compiler unit tests (coverage modeled on reference test-kql.cpp)."""

from __future__ import annotations

import pytest

from clp_spark.plans.kql import KqlError, kql_filter, parse_kql


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "ERROR", 5, ["slow", "io"], {"code": 3, "msg": "timeout"}),
        (2, "INFO", 1, ["fast"], {"code": 0, "msg": "ok"}),
        (3, "WARN", 9, [], None),
        (4, "ERROR", 2, None, {"code": 7, "msg": "conn reset"}),
    ]
    from pyspark.sql.types import (
        ArrayType, IntegerType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType()),
        StructField("level", StringType()),
        StructField("latency", IntegerType()),
        StructField("tags", ArrayType(StringType())),
        StructField("err", StructType([
            StructField("code", IntegerType()),
            StructField("msg", StringType()),
        ])),
    ])
    return spark.createDataFrame(rows, schema)


def ids(df_, q):
    return sorted(r["id"] for r in kql_filter(df_, q).collect())


def test_basic_ops(spark, df):
    assert ids(df, "level: ERROR") == [1, 4]
    assert ids(df, "latency > 4") == [1, 3]
    assert ids(df, "latency >= 5 AND level: ERROR") == [1]
    assert ids(df, "level: ERROR OR level: WARN") == [1, 3, 4]
    assert ids(df, "NOT level: INFO") == [1, 3, 4]
    assert ids(df, "*") == [1, 2, 3, 4]


def test_nested_paths(spark, df):
    assert ids(df, "err.code >= 3") == [1, 4]
    assert ids(df, 'err.msg: "conn reset"') == [4]
    assert ids(df, "err.msg: *") == [1, 2, 4]  # EXISTS


def test_wildcard_value(spark, df):
    assert ids(df, "err.msg: conn*") == [4]
    assert ids(df, "level: ERR?R") == [1, 4]


def test_array_filters(spark, df):
    assert ids(df, "tags: slow") == [1]
    assert ids(df, "tags: f*") == [2]
    assert ids(df, "tags: *") == [1, 2, 3]  # exists (empty array is not null)


def test_wildcard_keys(spark, df):
    assert ids(df, "err.*: timeout") == [1]
    assert ids(df, '*: "conn reset"') == [4]
    assert ids(df, "zzz*: x") == []  # no matching column -> matches nothing


def test_implicit_and_and_parens(spark, df):
    assert ids(df, "level: ERROR err.code > 5") == [4]
    assert ids(df, "(level: WARN OR level: INFO) AND latency < 5") == [2]


def test_errors(spark, df):
    with pytest.raises(KqlError):
        parse_kql("")
    with pytest.raises(KqlError):
        parse_kql("level:")
    with pytest.raises(Exception):
        kql_filter(df, "nosuchcol: 5").collect()


def test_timestamp_comparisons(spark):
    from clp_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    got = kql_filter(t, 'ts >= "2024-01-02 00:00:00" AND ts < "2024-01-05 00:00:00"')
    import pyspark.sql.functions as F

    direct = t.filter(
        (F.col("ts") >= "2024-01-02 00:00:00") & (F.col("ts") < "2024-01-05 00:00:00")
    )
    assert got.count() == direct.count() > 0
