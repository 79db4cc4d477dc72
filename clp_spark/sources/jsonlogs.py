"""Deterministic semi-structured (JSON) log corpus, synthesized from the
driver's `events` table with SQL that runs identically in Spark SQL and
DuckDB (same trick as sources/transcripts.py).

This is the test corpus for the clp_s analog (clp_spark/plans/
semistructured.py): four record shapes with different key sets and types so
schema inference / schema-id interning / per-schema routing all have work to
do, mirroring the reference's test_search.jsonl corpus
(reference components/core/tests/test_log_files/test_search.jsonl).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# NOTE: no backslashes in literals (Spark escapes them, DuckDB does not).
JSONLOGS_SQL = """
SELECT
  event_id,
  ts,
  CASE cast(event_id % 5 as int)
    WHEN 0 THEN '{"level": "INFO", "component": "sched", "latency_ms": '
                || cast(cast(floor(value) as bigint) as string) || '}'
    WHEN 1 THEN '{"level": "INFO", "component": "io", "latency_ms": '
                || cast(cast(floor(value) as bigint) as string) || '}'
    WHEN 2 THEN '{"level": "ERROR", "err": {"code": '
                || cast(cast(event_id % 7 as int) as string)
                || ', "msg": "timeout"}, "host": "h'
                || cast(cast(user_id % 20 as int) as string)
                || '", "note": "retry ' || cast(cast(event_id % 4 as int) as string)
                || ' of 5 from host h' || cast(cast(user_id % 20 as int) as string) || '"}'
    WHEN 3 THEN '{"level": "WARN", "tags": ["slow", "io"], "latency_ms": '
                || cast(cast(floor(value) as bigint) as string) || '}'
    ELSE '{"metric": "mem_mb", "value": '
                || cast(cast(event_id % 4096 as int) as string) || '.'
                || cast(cast(event_id % 10 as int) as string) || '}'
  END AS json
FROM events
"""


def jsonlogs_cte() -> str:
    """CTE prelude defining `jsonlogs`, valid in Spark SQL and DuckDB."""
    return f"WITH jsonlogs AS ({JSONLOGS_SQL})\n"


def load_jsonlogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(f"{jsonlogs_cte()} SELECT * FROM jsonlogs")


# --- raw text-log lines corpus (for the MessageParser/stitching analog) ----
# Timestamps are embedded as 13-digit epoch-millis literals derived from
# event_id by integer arithmetic — the only timestamp rendering that is
# byte-identical across Spark SQL and DuckDB.
TEXTLINES_SQL = """
SELECT
  'file-' || cast(cast(event_id % 50 as int) as string) AS file_id,
  cast(floor(event_id / 50) as bigint) AS line_idx,
  CASE WHEN event_id % 3 = 0
       THEN cast(1462692845000 + event_id as string)
            || ' job step ' || cast(event_id % 7 as string)
       ELSE 'continuation ' || cast(event_id % 5 as string)
  END AS line
FROM events
"""


def textlines_cte() -> str:
    return f"WITH lines AS ({TEXTLINES_SQL})\n"


def load_textlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(f"{textlines_cte()} SELECT * FROM lines")


# --- multi-format timestamp corpus (exercises the extended pattern table:
# ids 19/22/25/26/27/28 — slash-date+ms, "01 Jan 2016 ...,085",
# "[yyyymmdd-hh:mm:ss]", double-space, %k space-padded hour, %l 12-hour).
# Lines are built by string concatenation only, so the SAME SQL runs in
# Spark and DuckDB; the ORACLE (DuckDB-only) recomputes epochs with
# make_timestamp arithmetic.
TEXTLINES_MULTI_SQL = """
SELECT
  'mf-' || cast(cast(event_id % 20 as int) as string) AS file_id,
  cast(floor(event_id / 20) as bigint) AS line_idx,
  CASE cast(event_id % 8 as int)
    WHEN 0 THEN '2016/05/' || lpad(cast(1 + cast(event_id % 28 as int) as string), 2, '0')
                || ' 07:34:05.' || lpad(cast(cast(event_id % 1000 as int) as string), 3, '0')
                || ' start job'
    WHEN 1 THEN '01 Jan 2016 15:50:' || lpad(cast(cast(event_id % 60 as int) as string), 2, '0')
                || ',085 gc pause'
    WHEN 2 THEN '[20170106-16:56:' || lpad(cast(cast(event_id % 60 as int) as string), 2, '0')
                || '] poll tick'
    WHEN 3 THEN 'Jan ' || lpad(cast(1 + cast(event_id % 28 as int) as string), 2, '0')
                || ', 2016 3:50:' || lpad(cast(cast(event_id % 60 as int) as string), 2, '0')
                || ' PM user login'
    WHEN 4 THEN '150131  9:50:' || lpad(cast(cast(event_id % 60 as int) as string), 2, '0')
                || ' kernel msg'
    WHEN 5 THEN 'Start-Date: 2016-01-' || lpad(cast(1 + cast(event_id % 28 as int) as string), 2, '0')
                || '  15:50:45 apt begin'
    ELSE 'continuation seg ' || cast(cast(event_id % 5 as int) as string)
  END AS line
FROM events
"""


def textlines_multi_cte() -> str:
    return f"WITH lines AS ({TEXTLINES_MULTI_SQL})\n"


def load_textlines_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(f"{textlines_multi_cte()} SELECT * FROM lines")

# --- JSON corpus with a timestamp-named string key (DateString typing) -----
# Every value renders identically in Spark SQL and DuckDB: fixed date, two
# lpad'd arithmetic-derived time fields; every 11th record carries an
# unparseable placeholder to exercise the raw-string fallback.
JSONDATES_SQL = """
SELECT
  event_id,
  '{"msg": "job ' || cast(cast(event_id % 9 as int) as string)
  || '", "meta": {"timestamp": "'
  || CASE WHEN event_id % 11 = 3 THEN 'pending'
     ELSE '2016-05-08 07:'
       || lpad(cast(cast(event_id % 60 as int) as string), 2, '0') || ':'
       || lpad(cast(cast((event_id * 7) % 60 as int) as string), 2, '0')
     END
  || '", "level": "' || CASE WHEN event_id % 4 = 0 THEN 'ERROR' ELSE 'INFO' END
  || '"}}' AS json
FROM events
"""


def jsondates_cte() -> str:
    """CTE prelude defining `jsondates`, valid in Spark SQL and DuckDB."""
    return f"WITH jsondates AS ({JSONDATES_SQL})\n"


def load_jsondates(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    return spark.sql(f"{jsondates_cte()} SELECT * FROM jsondates")
