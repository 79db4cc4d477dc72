"""Streaming exact deduplication: the streaming leg of the dedup family
(`operators/dedup.py` is the batch side).

A training-data ingest stream must drop re-sent / re-crawled documents as
they arrive, not in a nightly batch pass. The idiomatic Structured
Streaming shape is watermark + `dropDuplicates` over the content key:
Spark keeps one state row per key seen inside the watermark horizon and
suppresses every later arrival — no custom stateful operator needed (the
built-in dedup state IS `applyInPandasWithState`'s bookkeeping, maintained
in the JVM).

Two horizons, both real at scale:

* `dedup_stream(..., within=None)` — ALL-TIME dedup: unbounded state, one
  row per distinct key forever. Correct, but at 10^12 docs the state store
  is the corpus; use only behind a compacted key space.
* `dedup_stream(..., within="24 hours")` — WINDOWED dedup
  (`dropDuplicatesWithinWatermark`): state is bounded by the watermark
  horizon, the operating mode for re-crawl/re-delivery suppression where
  duplicates cluster in time. This is the 100-TB default.

Content keys: pass an existing id column, or `content_key=True` to key on
xxhash64(text) computed in-plan (whole-stage codegen; the same 8-byte
hash-shuffle discipline as the batch `dedup_exact`).

Exactly-once: downstream sinks receive only first-seen rows; pair with the
delta-log foreachBatch sinks (`streaming/ingest.py`) for replay-safe
counts — a redelivered micro-batch re-emits the SAME first-seen rows
(state holds), and the staged-rename sink overwrites itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dedup_stream"]


def dedup_stream(
    docs: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    *,
    content_key: bool = False,
    text_col: str = "text",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """First-seen filter over a (streaming or batch) docs frame.

    within=None: exact all-time dedup on `key_cols` (unbounded state).
    within="24 hours": duplicates are suppressed only while their key is
    inside the watermark horizon — bounded state, the at-scale mode.
    """
    df = docs
    keys = list(key_cols)
    if content_key:
        df = df.withColumn("_content_key", F.xxhash64(F.col(text_col)))
        keys = ["_content_key"]
    if within is None:
        out = df.dropDuplicates(keys)
    else:
        out = df.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(keys)
    return out.drop("_content_key") if content_key else out
