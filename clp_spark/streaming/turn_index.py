"""Streaming turn-index assignment: a monotonic per-conversation counter
across micro-batches, via `applyInPandasWithState`.

The ingest contract everywhere in this engine is stable `(conv_id,
turn_idx)` ordering (the per-turn text-equality invariant verifies against
it). A real-time transcript stream often arrives WITHOUT turn indexes —
just (conv_id, ts, text) events — and no Spark built-in can assign them: a
window's row_number restarts every micro-batch, and session/dedup state
operators keep the wrong state shape. This is the genuine
`applyInPandasWithState` case: custom state = one int64 per live
conversation (the next index), updated batch-by-batch.

Semantics:
* Within a micro-batch, a conversation's rows are ordered by (ts, then the
  tiebreak columns) before numbering — deterministic for replays.
* Across micro-batches, the counter continues from state, so turn_idx is
  globally dense per conversation in arrival order.
* Conversations idle longer than `timeout` are evicted (event-time timeout
  against the watermark) — state is bounded by live conversations, the
  at-scale requirement. A conversation resuming after eviction restarts at
  0 (documented trade; keep the timeout above the max conversation gap).

Exactly-once: state lives in the streaming state store under the
checkpoint; a replayed micro-batch reloads the pre-batch state version and
assigns the SAME indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["assign_turn_index"]


def assign_turn_index(
    events: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
    watermark_delay: str = "1 hour",
    timeout: str = "24 hours",
    out_col: str = "turn_idx",
) -> DataFrame:
    """events (streaming) -> events + dense per-conversation `turn_idx`."""
    import pandas as pd

    out_schema = StructType(
        list(events.schema) + [StructField(out_col, LongType())]
    )
    state_schema = StructType([StructField("next_idx", LongType())])
    sort_cols = [ts_col, *tiebreak_cols]
    timeout_ms = _duration_ms(timeout)

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (next_idx,) = state.get if state.exists else (0,)
        max_ts = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(sort_cols, kind="stable").reset_index(drop=True)
            pdf[out_col] = range(next_idx, next_idx + len(pdf))
            next_idx += len(pdf)
            t = pdf[ts_col].max()
            max_ts = t if max_ts is None else max(max_ts, t)
            yield pdf
        state.update((next_idx,))
        if max_ts is not None:
            # evict when the WATERMARK (not wall clock) passes last_ts+timeout
            state.setTimeoutTimestamp(
                int(pd.Timestamp(max_ts).value // 1_000_000) + timeout_ms
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(conv_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def _duration_ms(s: str) -> int:
    n, unit = s.split()
    unit = unit.rstrip("s")
    scale = {"millisecond": 1, "second": 1000, "minute": 60_000,
             "hour": 3_600_000, "day": 86_400_000}[unit]
    return int(n) * scale
