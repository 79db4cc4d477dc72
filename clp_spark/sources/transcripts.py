"""Deterministic transcript corpus, synthesized from the driver's `events`
table with SQL that runs IDENTICALLY in Spark SQL and DuckDB.

BASELINE.json:input_hint mandates the input shape
  (conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp).
There is no transcripts parquet in /root/testdata, so we derive one
deterministically from events.parquet using only cross-dialect SQL — both the
Spark pipeline and the DuckDB oracle regenerate byte-identical corpora, which
lets the driver verify the whole parse->encode->aggregate path end to end.

Template pool mirrors FIXTURES.md §2 (each template exercises a specific CLP
tokenizer/encoder rule; see tests/test_encoding.py for the per-rule vectors).
Template T3 is hot (40% of rows) to exercise skew handling, per FIXTURES.md.

NOTE: no backslashes inside SQL string literals (Spark treats them as C-style
escapes, DuckDB does not — the one dialect divergence we must avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TURNS_PER_CONV = 8

# Columns: canonical six + synthesis internals (tid, event_id, user_id, iv, fv)
# kept so oracles can recompute expected outputs analytically.
BASE_SQL = f"""
SELECT
  'conv-' || lpad(cast(cast(floor(event_id / {TURNS_PER_CONV}) as bigint) as string), 6, '0') AS conv_id,
  cast(event_id % {TURNS_PER_CONV} as int) AS turn_idx,
  CASE cast(event_id % 4 as int) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
       WHEN 2 THEN 'system' ELSE 'tool' END AS role,
  CASE WHEN user_id % 10 < 6 THEN 'none' WHEN user_id % 10 < 7 THEN 'search'
       WHEN user_id % 10 < 8 THEN 'bash' WHEN user_id % 10 < 9 THEN 'editor'
       ELSE 'browser' END AS tool,
  ts,
  cast(event_id % 10 as int) AS tid,
  event_id,
  user_id,
  cast(floor(value) as bigint) AS iv,
  cast(event_id % 97 as string) || '.' || cast(event_id % 10 as string) AS fv
FROM events
"""

# text generation per template id; applied on top of BASE_SQL.
TEXT_SQL = """
SELECT conv_id, turn_idx, role, tool, ts, tid, event_id, user_id, iv, fv,
  CASE
    WHEN tid < 4 THEN 'used ' || cast(iv as string) || ' of ' || fv || ' GB in 1.9 seconds'
    WHEN tid = 4 THEN 'Task MyDog' || cast(event_id % 50 as string)
                   || ' started by user' || cast(user_id as string)
                   || ' from APet4123_test.txt'
    WHEN tid = 5 THEN 'statictext and more static text'
    WHEN tid = 6 THEN 'value=abc' || cast(event_id % 100 as string) || ' mode=fast'
    WHEN tid = 7 THEN 'hash abcdef commit BEEF' || cast(event_id % 10 as string)
    WHEN tid = 8 THEN 'retcode -' || cast(1 + event_id % 30 as string)
                   || ' offset 0x1F pad 007'
    ELSE 'tool search latency ' || cast(event_id % 200 as string)
                   || ' ms conv ' || conv_id
  END AS text
FROM base
"""

# Expected logtype per template id — the ORACLE side of the tokenizer.
# chr(17)=Integer, chr(18)=Dictionary, chr(19)=Float placeholders
# (reference clp/ir/types.hpp:17-22). DuckDB-only (Spark computes logtypes
# with the real tokenizer UDF; the driver compares the two).
ORACLE_LOGTYPE_SQL = """
  CASE
    WHEN tid < 4 THEN 'used ' || chr(17) || ' of ' || chr(19) || ' GB in ' || chr(19) || ' seconds'
    WHEN tid = 4 THEN 'Task ' || chr(18) || ' started by ' || chr(18) || ' from ' || chr(18)
    WHEN tid = 5 THEN 'statictext and more static text'
    WHEN tid = 6 THEN 'value=' || chr(18) || ' mode=' || chr(18)
    WHEN tid = 7 THEN 'hash ' || chr(18) || ' commit ' || chr(18)
    WHEN tid = 8 THEN 'retcode ' || chr(17) || ' offset ' || chr(18) || ' pad ' || chr(18)
    ELSE 'tool search latency ' || chr(17) || ' ms conv ' || chr(18)
  END
"""

# Per-template dictionary variables (slot order), for the var-dict oracle.
ORACLE_DICT_VARS_UNION_SQL = """
  SELECT 'MyDog' || cast(event_id % 50 as string) AS var FROM base WHERE tid = 4
  UNION ALL SELECT 'user' || cast(user_id as string) FROM base WHERE tid = 4
  UNION ALL SELECT 'APet4123_test.txt' FROM base WHERE tid = 4
  UNION ALL SELECT 'abc' || cast(event_id % 100 as string) FROM base WHERE tid = 6
  UNION ALL SELECT 'fast' FROM base WHERE tid = 6
  UNION ALL SELECT 'abcdef' FROM base WHERE tid = 7
  UNION ALL SELECT 'BEEF' || cast(event_id % 10 as string) FROM base WHERE tid = 7
  UNION ALL SELECT '0x1F' FROM base WHERE tid = 8
  UNION ALL SELECT '007' FROM base WHERE tid = 8
  UNION ALL SELECT conv_id FROM base WHERE tid = 9
"""

# Broadcast-enrich dimension tables (FIXTURES.md §3), inline VALUES in both
# dialects (analog of CLP's var-dict lookup joins, SURVEY.md §2.3).
DIM_ROLE_SQL = """
SELECT * FROM (VALUES
  ('user', 'human', true), ('assistant', 'model', false),
  ('system', 'control', false), ('tool', 'machine', false)
) AS t(role, role_group, is_human)
"""

DIM_TOOL_SQL = """
SELECT * FROM (VALUES
  ('none', 'no_tool', 0), ('search', 'retrieval', 2), ('bash', 'exec', 3),
  ('editor', 'exec', 1), ('browser', 'retrieval', 4)
) AS t(tool, tool_family, cost_class)
"""


def transcripts_cte() -> str:
    """CTE prelude defining `base` and `transcripts`, valid in both dialects.

    Usage: f"{transcripts_cte()} SELECT ... FROM transcripts ..."
    Requires an `events` view to exist (the driver pre-registers it for
    DuckDB; load_transcripts registers it for Spark).
    """
    return (
        f"WITH base AS ({TEXT_SQL.replace('FROM base', f'FROM ({BASE_SQL}) AS b')}),\n"
        "transcripts AS (SELECT conv_id, turn_idx, role, text, tool, ts FROM base)\n"
    )


def load_transcripts(spark: SparkSession, sf_dir: str, *, with_internals: bool = False) -> DataFrame:
    """Synthesize the transcript table from `{sf_dir}/events.parquet`."""
    spark.read.parquet(f"{sf_dir}/events.parquet").createOrReplaceTempView("events")
    df = spark.sql(f"{transcripts_cte()} SELECT * FROM base")
    if with_internals:
        return df
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def dim_role(spark: SparkSession) -> DataFrame:
    return spark.sql(DIM_ROLE_SQL)


def dim_tool(spark: SparkSession) -> DataFrame:
    return spark.sql(DIM_TOOL_SQL)
