"""Streaming hot-key tracking: Misra-Gries heavy hitters over a live
stream, per-shard bounded state via `applyInPandasWithState`.

The streaming leg of `operators/sketch.py` (batch Misra-Gries), and the
live-ingest use case CLP's real-time IR stream motivates: "which logtype
templates are hot RIGHT NOW across the fleet" — answered continuously,
with state that never grows past `n_shards x capacity` counters no matter
how many distinct keys the stream has seen. Reference anchor:
clp/streaming_archive writes per-logtype tables whose hot set operators
watch; this operator answers that question without materializing any
table.

Design — why shards, and why the math stays exact:

* Keys are hash-partitioned into `n_shards` DISJOINT key spaces
  (`xxhash64(key) % n_shards`), and each shard keeps its own MG summary
  as per-group state. Because shards never share keys, no cross-shard
  decrement interplay exists: a key's undercount is bounded by ITS
  shard's running decrement total, which the state tracks exactly and
  every emission carries (`shard_undercount`). A global snapshot is the
  plain union of the latest per-shard emissions — no merge step.
* Work and state distribute: each micro-batch shuffles rows once (the
  groupBy on the shard id), every shard's update is O(batch rows in
  shard) via pandas value_counts, and the state rows are (keys[],
  counts[], decrement, emit_seq) arrays bounded by `capacity`.
* Per batch, each shard emits its current top-`k` with a monotonically
  increasing `emit_seq`; the consumer's "current hot set" is the rows
  with each shard's max emit_seq (one small window over the sink table).
  State never times out — it is bounded by construction, so eviction
  would only destroy accuracy (timeoutConf="NoTimeout").
* Exactly-once: state lives in the state store under the checkpoint; a
  replayed micro-batch reloads the pre-batch state version and emits the
  SAME snapshot rows.

The MG guarantee per shard, identical to the batch operator's: for every
key in the shard, `true - shard_undercount <= est_count <= true`, and any
key with `true > shard_undercount` is present in the shard's summary
(though it may sit below the top-k emission cut — raise `k` toward
`capacity` when the full guaranteed set must be visible).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clp_spark.operators.sketch import mg_trim
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["hot_keys_stream", "latest_emissions", "latest_snapshot"]


def hot_keys_stream(
    df: DataFrame,
    key_col: str = "logtype",
    n_shards: int = 32,
    capacity: int = 1024,
    k: int = 20,
) -> DataFrame:
    """streaming df -> per-batch per-shard top-k emissions:
    (shard, key, est_count, shard_undercount, emit_seq). STREAMING ONLY:
    `applyInPandasWithState` rejects batch frames at execution time — use
    `operators/sketch.heavy_hitters` for the batch leg.

    est_count is exact while a shard's distinct keys fit `capacity` (then
    shard_undercount is 0); under pressure the batch operator's MG bounds
    hold per shard. NULL keys are ignored. Every emission additionally
    carries one null-key sentinel row, so the shard's CURRENT undercount
    and emit_seq survive even a batch whose trim wipes every counter
    (without it, latest_snapshot would fall back to a stale emission and
    the 'true > shard_undercount implies present' guarantee would silently
    break).
    """
    if n_shards < 1 or capacity < 1 or k < 1:
        raise ValueError("n_shards, capacity and k must all be >= 1")

    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("key", StringType()),
            StructField("est_count", LongType()),
            StructField("shard_undercount", LongType()),
            StructField("emit_seq", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("keys", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
            StructField("decremented", LongType()),
            StructField("emit_seq", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        (shard,) = key
        if state.exists:
            keys, counts, decremented, emit_seq = state.get
            cnt = Counter(dict(zip(keys, counts)))
        else:
            cnt, decremented, emit_seq = Counter(), 0, 0
        for pdf in pdfs:
            vals = pdf["_k"].dropna()
            if len(vals):
                cnt.update(vals.value_counts().to_dict())
            decremented += mg_trim(cnt, capacity)
        emit_seq += 1
        state.update(
            (list(cnt.keys()), [int(v) for v in cnt.values()], decremented, emit_seq)
        )
        tops = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        # + the null-key sentinel: the shard's current undercount/emit_seq
        # must reach the sink even when tops is empty (all counters wiped)
        yield pd.DataFrame(
            {
                "shard": [shard] * (len(tops) + 1),
                "key": [t for t, _ in tops] + [None],
                "est_count": [int(c) for _, c in tops] + [0],
                "shard_undercount": [decremented] * (len(tops) + 1),
                "emit_seq": [emit_seq] * (len(tops) + 1),
            }
        )

    keyed = df.select(
        F.col(key_col).alias("_k"),
        (F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))).alias("_shard"),
    ).where(F.col("_k").isNotNull())
    # outputMode "append": each batch's emission rows are new rows (tagged
    # with a fresh emit_seq), never retractions — append is the accurate
    # mode and composes with file sinks (parquet rejects update mode).
    return keyed.groupBy("_shard").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def latest_emissions(emissions: DataFrame) -> DataFrame:
    """Sink-table helper: each shard's max-emit_seq rows (sentinels
    included — the row with key NULL carries the shard's current
    undercount even when its summary is empty). Runs on the (small) sink
    table, not the stream."""
    from pyspark.sql import Window

    w = Window.partitionBy("shard")
    return (
        emissions.withColumn("_mx", F.max("emit_seq").over(w))
        .where(F.col("emit_seq") == F.col("_mx"))
        .drop("_mx")
    )


def latest_snapshot(emissions: DataFrame, k: int = 20) -> DataFrame:
    """The CURRENT hot set: latest per-shard emissions, sentinels dropped,
    global top-k by est_count (key tiebreak)."""
    return (
        latest_emissions(emissions)
        .where(F.col("key").isNotNull())
        .orderBy(F.desc("est_count"), "key")
        .limit(k)
    )
