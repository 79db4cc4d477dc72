"""Training-example assembly over the transcripts table: per-turn context
windows and whole-conversation flattening — the step that turns the raw
`(conv_id, turn_idx, role, text, tool, ts)` table into SFT-style training
examples.

No counterpart in the reference repo; training-data-pipeline extension
mandate, same as operators/curation.py. Operates on the exact input_hint
table shape.

Scale shape: both operators are ONE shuffle on conv_id (the window / group
partitioning); conversations are short (tens of turns), so per-partition
state is bounded and hot-conversation skew does not arise the way
hot-logtype skew does. Engine-portable expressions only — the same
semantics are valid DuckDB SQL, which is what makes oracle parity possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["context_windows", "flatten_conversations"]


def context_windows(
    df: DataFrame,
    n_turns: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Per-turn training pairs: (conv_id, turn_idx, context, target) where
    `context` is the previous `n_turns` turn texts IN ORDER and `target` is
    the turn's own text. The first turn of a conversation gets an empty
    context (not null), so every row is a usable example.

    One Sort+Window shuffle; the frame `rowsBetween(-n, -1)` keeps
    collect_list in turn order (window frames are consumed in orderBy
    order, and turn_idx is unique per conversation, so the order is total).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-n_turns, -1)
    )
    return df.select(
        conv_col,
        idx_col,
        F.coalesce(
            F.collect_list(text_col).over(w), F.array().cast("array<string>")
        ).alias("context"),
        F.col(text_col).alias("target"),
    )


def flatten_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Render each conversation as ONE role-tagged training document ->
    (conv_id, n_turns, doc): turns joined in turn_idx order as
    `<role>: <text>` lines. The standard chat-corpus flattening before
    packing/tokenization.

    Map-side shape: sort_array over collected (turn_idx, line) structs —
    the sort runs per group AFTER the single groupBy shuffle, and struct
    ordering on the leading int32 turn_idx makes it total and
    engine-reproducible.

    NULL role/text coalesce to '' BEFORE the join (concat_ws would
    silently SKIP a null operand — 'user: ' would collapse to 'user' —
    while engines that propagate NULL through || would drop the whole
    line; pinning '' keeps every turn present and oracle-portable).
    """
    line = F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(": "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    return (
        df.groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col(idx_col).alias("i"), line.alias("l")))
                    ),
                    lambda s: s["l"],
                ),
                sep,
            ).alias("doc"),
        )
    )
