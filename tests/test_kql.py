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


def test_neq_quoted_numeric_excludes_null(spark, df):
    """ADVICE r2: NEQ of a QUOTED numeric literal against a numeric column
    must keep NEQ-requires-existence semantics — row 3 (err is null) stays
    excluded, matching the unquoted branch's (col != lit) null handling."""
    assert ids(df, 'NOT err.code: "3"') == [1, 2, 4]
    assert ids(df, 'err.code: "3"') == []  # quoted lit has no numeric reading


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


def test_neq_from_not(spark, df):
    """NOT over a filter folds to NEQ (reference Expression::invert,
    FilterOperation.hpp NEQ; test-kql.cpp:94)."""
    ast = parse_kql("NOT level: INFO")
    assert ast[0] == "filter" and ast[2] == "!="
    assert ids(df, "NOT level: INFO") == [1, 3, 4]
    # NEQ requires existence: a null err.msg row (3) does not match
    assert ids(df, "NOT err.msg: timeout") == [2, 4]
    # De Morgan over AND/OR like invert()
    ast2 = parse_kql("NOT (level: INFO OR latency > 4)")
    assert ast2[0] == "and" and ast2[1][2] == "!=" and ast2[2][2] == "<="


def test_escaped_keys(spark):
    """Literal dots / specials in keys via backslash escapes
    (test-kql.cpp:216-260)."""
    from clp_spark.plans.kql import parse_kql as p

    ast = p(r"a\.b.c: 1")
    assert ast[1].tokens == ("a.b", "c")
    ast = p(r"a\:b: 1")
    assert ast[1].tokens == ("a:b",)
    # resolution against a real field containing a dot
    rows = [(1, "x"), (2, "y")]
    d = spark.createDataFrame(rows, ["id", "a.b"])
    got = sorted(r["id"] for r in kql_filter(d, r"a\.b: x").collect())
    assert got == [1]


def test_namespaces(spark):
    """Leading @ $ ! # is the column namespace (test-kql.cpp:282-330)."""
    from clp_spark.plans.kql import parse_kql as p

    for ns in "@$!#":
        ast = p(f"{ns}column : *")
        assert ast[1].namespace == ns and ast[1].tokens == ("column",)
    # escaped namespace char is part of the key, not a namespace
    ast = p(r"\@column : *")
    assert ast[1].namespace == "" and ast[1].tokens == ("@column",)
    d = spark.createDataFrame([(1, "v")], ["id", "@column"])
    assert [r["id"] for r in kql_filter(d, "@column: v").collect()] == [1]


def test_nested_query(spark, df):
    """col: {sub} prefixes sub-filters (visitNestedQuery)."""
    assert ids(df, "err: {code >= 3 OR msg: ok}") == [1, 2, 4]
    assert ids(df, "err: {code >= 3 AND msg: timeout}") == [1]


def test_list_of_values(spark, df):
    assert ids(df, "level: (ERROR WARN)") == [1, 3, 4]  # default OR
    assert ids(df, "level: (OR ERROR WARN)") == [1, 3, 4]
    assert ids(df, "tags: (AND slow io)") == [1]
    assert ids(df, "level: (NOT INFO WARN)") == [1, 4]


def test_bare_value_searches_all_columns(spark, df):
    assert ids(df, "timeout") == [1]
    assert ids(df, '"conn reset"') == [4]


def test_date_literal(spark):
    from clp_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    import pyspark.sql.functions as F

    direct = t.filter(F.col("ts") >= "2024-01-03 00:00:00").count()
    got = kql_filter(t, 'ts >= date("2024-01-03 00:00:00")').count()
    assert got == direct > 0


def test_narrow_types_branch_dropping(spark, df):
    """NarrowTypes semantics: impossible type combinations evaluate to
    constant False instead of Catalyst cast-coercion (NarrowTypes.cpp)."""
    # range op on a string column -> False
    assert ids(df, "level > 3") == []
    # range op with a non-numeric literal -> False
    assert ids(df, "latency > abc") == []
    # quoted (string-typed) literal against a numeric column -> False
    assert ids(df, 'latency: "5"') == []
    # unquoted numeric literal against numeric column still matches
    assert ids(df, "latency: 5") == [1]


def test_implicit_timestamp_conditions(spark):
    """AddTimestampConditions analog (clp-s.cpp:123-147)."""
    from clp_spark.sources.transcripts import load_transcripts

    t = load_transcripts(spark, "/root/testdata/sf0.001")
    n_all = kql_filter(t, "tool: search").count()
    n_win = kql_filter(
        t, "tool: search",
        begin_ts_ms=1704067200000, end_ts_ms=1704672000000,
    ).count()
    assert 0 < n_win < n_all
    # no timestamp column + bounds -> error (reference EmptyExpr fast-fail)
    d = spark.createDataFrame([(1, "x")], ["id", "v"])
    with pytest.raises(KqlError):
        kql_filter(d, "v: x", begin_ts_ms=0)


def test_filename_pseudo_column(spark):
    """$_filename metadata pseudo-column (reference range-index filters)."""
    from clp_spark.plans.textlogs import with_filename_pseudo_column

    d = spark.createDataFrame(
        [(1, "a.log"), (2, "b.txt")], ["id", "file_id"]
    )
    d2 = with_filename_pseudo_column(d)
    got = [r["id"] for r in kql_filter(d2, '$_filename: *.log').collect()]
    assert got == [1]


def test_kql_keywords_case_insensitive(spark):
    """Keywords match any case, like the reference grammar's [Aa][Nn][Dd]
    lexer rules (clp_s/search/kql/Kql.g4) — lowercase `and` must combine,
    not search for the literal word."""
    from clp_spark.plans.kql import kql_filter

    df = spark.createDataFrame(
        [("ERROR", 5), ("INFO", 5), ("ERROR", 1)], "level string, code int"
    )
    assert kql_filter(df, 'level: "ERROR" and code >= 3').count() == 1
    assert kql_filter(df, 'level: "INFO" or code >= 3').count() == 2
    assert kql_filter(df, 'not level: "ERROR"').count() == 1


def test_sql_grammar_stub_parity():
    """Reference test-sql.cpp: empty string -> EmptyExpr; the grammar
    accepts nothing else (Sql.g4 is `start: EOF` upstream)."""
    from clp_spark.plans.kql import parse_sql_expression

    assert parse_sql_expression("") == ("none",)
    assert parse_sql_expression("   ") == ("none",)
    assert parse_sql_expression("SELECT * FROM t") is None


def test_oversized_int_literal_falls_back_to_double(spark):
    """An integer literal that cannot fit int64 must not crash the planner
    (F.lit(big python int) raises NumberFormatException in py4j; CPython
    refuses int() past 4300 digits). NarrowTypes semantics: the failed int
    conversion drops to float (double literal), so comparisons stay
    meaningful — nothing int64-valued equals 1e20, everything is < 1e20."""
    from clp_spark.plans.kql import kql_filter

    df = spark.createDataFrame([(1, 5), (2, 18)], "id long, size long")
    assert kql_filter(df, "size: 99999999999999999999").count() == 0
    assert kql_filter(df, "size > 18446744073709551616").count() == 0
    assert kql_filter(df, "size < 99999999999999999999").count() == 2
    assert kql_filter(df, "size < " + "9" * 5000).count() == 2  # double inf
    # in-range literals still compare as exact int64
    assert kql_filter(df, "size: 18").count() == 1
    assert kql_filter(df, "size >= 9223372036854775807").count() == 0
