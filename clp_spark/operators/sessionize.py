"""Gap-based sessionization over event/telemetry streams.

The canonical log-pipeline windowing op the reference has no equivalent for
(CLP stops at count-by-time buckets — components/core/src/clp/Grep.cpp
aggregation hooks); every telemetry/transcript pipeline needs it: group a
user's (or conversation's) events into sessions separated by inactivity
gaps, then aggregate per session.

Scale notes (100 TB / 10^12 events):
  * ONE shuffle on the entity key; the session boundary (lag + comparison)
    and the running session index (cumulative sum) both run inside the same
    sort-based window — Catalyst plans a single Sort + Window, whole-stage
    codegen, zero Python.
  * Ordering is (ts, id_col): deterministic under timestamp ties, so
    results are stable across runs/partitionings — the same invariant
    discipline as the ingest pipeline's (conv_id, turn_idx) ordering.
  * Hot entities (one user with millions of events) serialize within their
    partition by construction — sessionization is order-dependent per
    entity, so that's inherent to the semantics, not a plan defect; AQE
    coalescing keeps the surrounding partitions balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats"]


def _us(col) -> F.Column:
    """Microseconds since epoch, timezone-independent for TIMESTAMP_NTZ
    inputs (computed as an NTZ-frame difference from the epoch — identical
    to DuckDB's epoch_us over parquet naive timestamps, so oracles align
    bit-exactly). TIMESTAMP inputs are first rendered in the session zone."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.expr("TIMESTAMP_NTZ '1970-01-01 00:00:00'"),
        c.cast("timestamp_ntz"),
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-entity session index to every event.

    A new session starts at the entity's first event and whenever the gap
    from the previous event exceeds `gap_minutes`. Adds `session_col`
    (1-based within the entity) to the input rows.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    # microsecond-integer arithmetic: exact, engine-portable (DuckDB
    # epoch_us computes the identical value, so the oracle boundary is
    # bit-identical — no float-epoch or second-truncation drift)
    gap_us = _us(ts_col) - _us(F.lag(ts_col).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > F.lit(int(round(gap_minutes * 60 * 1e6)))), 1
    ).otherwise(0)
    return events.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    gap_minutes: float = 30.0,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: (entity, session_id, n_events, start/end ts,
    duration_s). One window shuffle + one map-side-combinable groupBy that
    reuses the window's (entity) partitioning — AQE elides the second
    exchange where it can."""
    s = sessionize(events, gap_minutes, entity_col, ts_col, id_col)
    return s.groupBy(entity_col, "session_id").agg(
        F.count("*").alias("n_events"),
        _us(F.min(ts_col)).alias("start_us"),
        _us(F.max(ts_col)).alias("end_us"),
        (_us(F.max(ts_col)) - _us(F.min(ts_col))).alias("duration_us"),
    )
