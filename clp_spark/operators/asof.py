"""As-of (point-in-time / SCD-2) dimension enrichment.

Joins each fact row to the LATEST dimension version whose effective
timestamp is <= the fact's timestamp (inclusive) — the lookup every
slowly-changing-dimension enrich, price-as-of-trade, config-as-of-event and
model-version-as-of-request pipeline needs, and one Spark has no built-in
operator for (Flink has temporal joins, DuckDB/pandas have ASOF JOIN /
merge_asof; Spark users hand-roll it).

Two strategies, same semantics (pytest pins their equivalence):

* ``broadcast`` — the SCD-2 fast path. Dimensions are almost always tiny
  next to facts (thousands of entities x tens of versions vs 10^12 facts),
  so collapse the dimension to ONE row per key holding a ts-sorted array of
  version structs, broadcast-join it on the key, and pick the effective
  version with ``element_at(filter(versions, v -> v.ts <= fact_ts), -1)``
  — pure Catalyst expressions, whole-stage codegen, and crucially ZERO
  shuffle of the fact table: at 100 TB of facts this is the difference
  between a map-only stage and a full-table sort.

* ``shuffle`` — the both-sides-huge path. Tag facts (1) and dim versions
  (0), union, hash-partition by key, and ONE window
  ``last(version_payload, ignorenulls=True)`` over
  ``orderBy(ts, tag)`` rows-to-current fills every fact with the newest
  dim version at-or-before it. Dim-before-fact at equal ts gives the
  inclusive (>=) ASOF semantics. One shuffle of facts+dim, no row
  explosion, no join — the sort-merge as-of published for MapReduce-era
  engines, expressed as a single Spark window.

Null-version correctness: dim value columns ride inside a non-null struct,
so a dimension version whose VALUE is legitimately NULL still supersedes
older versions (a bare ``last(value, ignorenulls=True)`` would skip it).

No counterpart in the reference repo (CLP has no temporal join;
components/core/src/clp/Grep.cpp stops at search/agg) — this operator is
part of the training-data-pipeline extension mandate, same as dedup/ANN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    dim_ts_col: str | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
    strategy: str = "broadcast",
    tolerance_micros: int | None = None,
) -> DataFrame:
    """Enrich `facts` with the latest `dim` version at-or-before each fact.

    Output = all fact columns + `<prefix><ts>` (the matched version's
    effective timestamp) + `<prefix><c>` for each dim value column; all
    NULL when no version exists at-or-before the fact (left semantics).

    Preconditions: `dim` has at most one row per (key, dim_ts) — ties
    between simultaneous versions are otherwise ambiguous in every engine's
    ASOF (DuckDB picks an arbitrary one); `ts` columns are non-null.
    `tolerance_micros` (like pandas merge_asof) drops matches older than
    the window: fact_ts - version_ts must be <= tolerance.
    """
    keys = [on] if isinstance(on, str) else list(on)
    dts = dim_ts_col or ts_col
    if value_cols is None:
        value_cols = [c for c in dim.columns if c not in (*keys, dts)]
    out_cols = [f"{prefix}{dts}"] + [f"{prefix}{c}" for c in value_cols]

    def _unpack(df: DataFrame, payload: Column) -> DataFrame:
        df = df.withColumn("_asof_payload", payload)
        if tolerance_micros is not None:
            # timestampdiff is frame-agnostic (works for NTZ and LTZ alike,
            # unlike unix_micros); the payload nulls out when the matched
            # version is older than the tolerance window
            # Column API (not an f-string expr): a fact ts column whose
            # name needs quoting must resolve like everywhere else
            age = F.timestamp_diff(
                "MICROSECOND", F.col("_asof_payload._ts"), F.col(ts_col)
            )
            df = df.withColumn(
                "_asof_payload",
                F.when(age <= F.lit(tolerance_micros), F.col("_asof_payload")),
            )
        for src, out in zip(["_ts", *value_cols], out_cols):
            df = df.withColumn(out, F.col("_asof_payload").getField(src))
        return df.drop("_asof_payload")

    payload_struct = F.struct(
        F.col(dts).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    # both strategies reorder columns internally (equi-join puts keys first,
    # union puts the fact side's layout through a window); pin the contract:
    final_cols = [*facts.columns, *out_cols]

    if strategy == "broadcast":
        # sort_array on structs orders by the leading field (_ts): the
        # version array is ascending by effective time, so the filtered
        # tail element is the latest at-or-before version
        vers = dim.groupBy(*keys).agg(
            F.sort_array(F.collect_list(payload_struct)).alias("_asof_vers")
        )
        joined = facts.join(F.broadcast(vers), keys, "left")
        # try_element_at: NULL (not an ANSI out-of-bounds error) when no
        # version is at-or-before the fact (filter leaves an empty array)
        eff = F.try_element_at(
            F.filter("_asof_vers", lambda v: v.getField("_ts") <= F.col(ts_col)),
            F.lit(-1),
        )
        return _unpack(joined, eff).select(*final_cols)

    if strategy == "shuffle":
        fact_side = facts.select(
            *facts.columns,
            F.lit(1).alias("_asof_tag"),
            F.lit(None).cast(
                dim.select(payload_struct.alias("p")).schema["p"].dataType
            ).alias("_asof_ver"),
        )
        dim_side = dim.select(
            *[F.col(k) for k in keys],
            F.col(dts).alias(ts_col),
            F.lit(0).alias("_asof_tag"),
            payload_struct.alias("_asof_ver"),
        )
        u = fact_side.unionByName(dim_side, allowMissingColumns=True)
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_asof_tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = u.withColumn(
            "_asof_eff", F.last("_asof_ver", ignorenulls=True).over(w)
        ).where(F.col("_asof_tag") == 1)
        out = _unpack(filled, F.col("_asof_eff"))
        return out.select(*final_cols)

    raise ValueError(f"unknown asof strategy: {strategy!r}")
