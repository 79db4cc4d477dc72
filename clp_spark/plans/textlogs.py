"""Raw text-log ingestion: line stream -> timestamped multi-line messages.

Reference semantics (clp/MessageParser.cpp:84-165): a line that parses a
known timestamp STARTS a new message; lines without a timestamp glue onto
the previous message; leading non-timestamped lines form an untimestamped
message. The timestamp is cut out of the message content and stored as
(pattern_id, epoch_ms) so decode re-renders the original bytes
(clp/streaming_archive/reader/Archive.cpp:163-195).

Spark-first: timestamp detection is one vectorized pandas UDF over the line
column (clp_spark/functions/timestamps.py); message assembly is a window
running-count plus groupBy — no per-row Python, no shuffle beyond the
groupBy on (file, message) whose partial aggregation is map-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

TS_STRUCT = StructType(
    [
        StructField("pattern_id", LongType()),
        StructField("ts_ms", LongType()),
        StructField("ts_start", LongType()),
        StructField("ts_end", LongType()),
    ]
)


@F.pandas_udf(TS_STRUCT)
def _ts_udf(lines: pd.Series) -> pd.DataFrame:
    from clp_spark.functions.timestamps import search_timestamp_batch

    return search_timestamp_batch(lines)


def detect_timestamps(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Add pattern_id / ts_ms / ts span columns (-1 pattern_id = no ts)."""
    return lines.withColumn("_ts", _ts_udf(F.col(line_col))).select("*", "_ts.*").drop("_ts")


def stitch_messages(
    lines: DataFrame,
    file_col: str = "file_id",
    idx_col: str = "line_idx",
    line_col: str = "line",
) -> DataFrame:
    """Group lines into messages by the reference boundary rule.

    Returns (file_id, msg_idx, pattern_id, ts_ms, content) where `content`
    is the message text with the timestamp of its first line cut out
    (newline-joined for multi-line messages) — ready for parse_encode.

    Scale note: the window runs per file ordered by line index — the same
    per-file sequential dependency the reference has; files are the unit of
    parallelism (clp compresses files independently too).
    """
    with_ts = detect_timestamps(lines, line_col)
    w = Window.partitionBy(file_col).orderBy(idx_col)
    numbered = with_ts.withColumn(
        "msg_idx",
        F.sum(F.when(F.col("pattern_id") >= 0, 1).otherwise(0)).over(w),
    )
    # strip the timestamp span from ts-bearing (first) lines
    content_line = F.when(
        F.col("pattern_id") >= 0,
        F.concat(
            F.expr(f"substring({line_col}, 1, ts_start)"),
            F.expr(f"substring({line_col}, ts_end + 1)"),
        ),
    ).otherwise(F.col(line_col))
    numbered = numbered.withColumn("_content_line", content_line)
    return (
        numbered.groupBy(file_col, "msg_idx")
        .agg(
            F.max(F.when(F.col("pattern_id") >= 0, F.col("pattern_id"))).alias("pattern_id"),
            F.max(F.when(F.col("pattern_id") >= 0, F.col("ts_ms"))).alias("ts_ms"),
            F.max(F.when(F.col("pattern_id") >= 0, F.col("ts_start"))).alias("ts_start"),
            F.array_join(
                F.expr(
                    f"transform(array_sort(collect_list(struct({idx_col} as i, "
                    "_content_line as l))), s -> s.l)"
                ),
                "\n",
            ).alias("content"),
        )
        .withColumn("pattern_id", F.coalesce("pattern_id", F.lit(-1)))
    )


def render_messages(messages: DataFrame) -> DataFrame:
    """Round-trip: re-insert the rendered timestamp at position ts_start of
    the first line (reference insert_formatted_timestamp)."""
    import pandas as pd

    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def rerender(
        content: pd.Series, pattern_id: pd.Series, ts_ms: pd.Series, ts_start: pd.Series
    ) -> pd.Series:
        from clp_spark.functions.timestamps import render_timestamp

        out = []
        for c, pid, ms, pos in zip(content, pattern_id, ts_ms, ts_start):
            if pid < 0:
                out.append(c)
            else:
                p = int(pos)
                out.append(c[:p] + render_timestamp(int(pid), int(ms)) + c[p:])
        return pd.Series(out)

    return messages.withColumn(
        "text", rerender("content", "pattern_id", "ts_ms", "ts_start")
    )


def read_text_logs(spark, paths) -> DataFrame:
    """FS text-file scan -> (file_id, line_idx, line), the stitch input
    (reference file enumeration + line reading, clp/clp/run.cpp:46-99).

    Line order: spark.read.text preserves order within a split, and
    monotonically_increasing_id is ascending per partition, so line_idx
    orders correctly as long as one file maps to one split — size
    spark.sql.files.maxPartitionBytes above the largest file (the reference
    has the same sequential-per-file constraint: clp compresses each file as
    one stream). For larger files, pre-split them or carry explicit line
    numbers in the source.
    """
    lines = (
        spark.read.text(paths)
        .withColumn("file_id", F.input_file_name())
        .withColumn("line_idx", F.monotonically_increasing_id())
        .withColumnRenamed("value", "line")
    )
    return lines.select("file_id", "line_idx", "line")


def ingest_text_logs(spark, paths) -> DataFrame:
    """Raw log files -> parse_encode-ready messages: scan, stitch multi-line
    messages, cut timestamps. Returns (file_id, msg_idx, pattern_id, ts_ms,
    ts_start, content)."""
    return stitch_messages(read_text_logs(spark, paths))
