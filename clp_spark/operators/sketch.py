"""Bounded-memory frequency sketching: Misra-Gries heavy hitters over the
token stream.

No counterpart in the reference repo (CLP's aggregations are exact);
training-data-pipeline extension mandate, same as operators/curation.py.

Why a sketch when `groupBy(token).count()` exists: exact counting's
map-side combine holds one counter per DISTINCT token per partition — on
web text at 10^12-document scale the long tail (urls, hashes, typos) makes
that set effectively unbounded, so the combine spills and the shuffle
carries the whole tail just to find the head. A Misra-Gries summary caps
executor state at `capacity` counters per partition no matter how heavy
the tail, and the merge shuffles at most partitions x capacity rows total.
The price is a one-sided error: reported counts undercount by at most the
summary's total decrement, which the operator tracks EXACTLY and returns
with the result — every token whose true count exceeds that bound is
guaranteed present (the classic MG guarantee, with error <= n/capacity in
the worst case).

Plan shape: one mapInPandas pass emits each partition's (token, count)
summary plus one null-token row carrying that partition's decrement total;
a tiny exact aggregate over the summaries (<= partitions x capacity rows)
merges them. Inside the UDF, tokenization is pandas-vectorized
(str.findall + explode + value_counts); the decrement step is the batched
variant — subtract the (capacity+1)-th largest count from every counter
and drop the non-positive — which preserves the per-token undercount
bound (each step lowers any single counter by at most the subtracted
value, which is exactly what gets added to the tracked total).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters", "summaries", "mg_trim"]


def mg_trim(cnt: Counter, capacity: int) -> int:
    """The Misra-Gries decrement step, shared by the batch and streaming
    legs (this module and streaming/hot_keys.py) so the undercount
    accounting can never desynchronize between them: if more than
    `capacity` counters are held, subtract the (capacity+1)-th largest
    value from every counter, drop the non-positive, and return the
    subtracted amount (0 when no trim was needed). Each call lowers any
    single counter by at most the returned value, which is exactly what
    the caller adds to its tracked undercount total."""
    if len(cnt) <= capacity:
        return 0
    d = sorted(cnt.values(), reverse=True)[capacity]
    if not d:
        return 0
    for t in list(cnt):
        nv = cnt[t] - d
        if nv > 0:
            cnt[t] = nv
        else:
            del cnt[t]
    return d

# the lowercased-alnum token rule shared with curation.token_vocab, so
# sketch output is comparable with the exact vocabulary counts.
_TOKEN_RE = r"[a-z0-9]+"


def summaries(
    df: DataFrame, capacity: int = 4096, text_col: str = "text"
) -> DataFrame:
    """The merged sketch BEFORE presentation: (token nullable, est_count).
    One row per surviving token plus exactly one null-token row whose
    est_count is the total decrement (the undercount bound) — present even
    when every counter was wiped, so the bound is never lost. ONE corpus
    scan; the merge aggregate runs over <= partitions x (capacity + 1)
    rows."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        cnt: Counter = Counter()
        decremented = 0
        for pdf in batches:
            toks = (
                pdf[text_col]
                .fillna("")  # NULL text contributes no tokens (astype(str)
                # alone would mint literal "none" tokens)
                .astype(str)
                .str.lower()
                .str.findall(_TOKEN_RE)
                .explode()
                .dropna()
            )
            if len(toks):
                cnt.update(toks.value_counts().to_dict())
            decremented += mg_trim(cnt, capacity)
        yield pd.DataFrame(
            {
                "token": list(cnt) + [None],
                "cnt": list(cnt.values()) + [decremented],
            }
        )

    partials = df.select(text_col).mapInPandas(summarize, "token string, cnt long")
    # the null-token decrement rows merge into ONE null-token group here,
    # so the bound survives aggregation alongside the counts — one scan,
    # no second pass for the error total.
    return partials.groupBy("token").agg(F.sum("cnt").alias("est_count"))


def heavy_hitters(
    df: DataFrame,
    capacity: int = 4096,
    k: int | None = 50,
    text_col: str = "text",
) -> DataFrame:
    """-> (token, est_count, max_undercount): the top-k tokens by estimated
    count (all surviving tokens when k is None), where for every token
    `true - max_undercount <= est_count <= true`, and every token whose
    true count exceeds max_undercount is guaranteed to appear.
    max_undercount is the EXACT total decrement across all partition
    summaries (0 when no partition ever exceeded capacity — then the
    result equals the exact count), identical on every row.

    est_count (and hence which ties enter a top-k) depends on how rows are
    partitioned — inherent to any per-partition summary. The bounds above
    hold for EVERY partitioning; pin partitioning for bit-reproducibility.

    ONE corpus scan: the undercount bound is fanned onto every row by a
    single-partition window over the merged summary (<= partitions x
    capacity rows — deliberately tiny, which is why the all-rows window is
    safe here). Edge: the result is empty iff every counter was wiped
    (only possible when every token's true count <= the bound); use
    summaries() when the bound itself must survive that regime.
    """
    merged = summaries(df, capacity, text_col)
    from pyspark.sql import Window

    w = Window.partitionBy()
    out = (
        merged.withColumn(
            "max_undercount",
            F.coalesce(
                F.sum(
                    F.when(F.col("token").isNull(), F.col("est_count"))
                ).over(w),
                F.lit(0),
            ),
        )
        .where(F.col("token").isNotNull())
    )
    if k is not None:
        out = out.orderBy(F.desc("est_count"), "token").limit(k)
    return out
