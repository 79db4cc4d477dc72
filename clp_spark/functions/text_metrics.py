"""Text-analysis functions for training-data pipelines, built from JVM-side
pyspark.sql.functions only (no Python in the hot path) so every metric stays
inside whole-stage codegen and is cross-checkable with an ANSI-SQL oracle.

Operators: quality scoring (length / word / stopword ratios), token counting
(whitespace + regex word tokens), language ID (stopword-profile heuristic),
document fingerprinting (content hash + shingle sketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately small and deterministic.
LANG_PROFILES = {
    "en": ["the", "of", "and", "in", "to"],
    "es": ["el", "la", "de", "en", "y"],
    "fr": ["le", "la", "de", "et", "en"],
    "de": ["der", "die", "und", "in", "von"],
}

STOPWORDS = ("the", "a", "of", "in", "and", "to", "is")
WORD_RE = r"[A-Za-z0-9]+"


def words(col: str | Column) -> Column:
    return F.split(col if isinstance(col, Column) else F.col(col), " ")


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    stopword ratio. All codegen'd column ops — ~memory-bandwidth cost."""
    w = words(text_col)
    n_words = F.size(w)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), x -> x in ({stop_list})))")
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        F.round((F.length(text_col) - n_words + 1) / n_words, 4).alias("mean_word_len"),
        F.round(n_stop / n_words, 4).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + regex word tokens (BPE-ish proxy) per document."""
    return df.select(
        "doc_id",
        F.size(words(text_col)).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(WORD_RE), F.lit(0)))
        .cast("bigint")
        .alias("re_tokens"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language scorer: argmax over per-language hit counts.

    Pure column ops: one split, then a filter-count per profile (profiles are
    constant-folded literals; no shuffle, no UDF)."""
    w = words(text_col)
    scores = []
    for lang, stops in LANG_PROFILES.items():
        lst = ", ".join(f"'{s}'" for s in stops)
        scores.append(
            F.struct(
                F.expr(f"size(filter(split({text_col}, ' '), x -> x in ({lst})))").alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["hits"].cast("bigint").alias("hits"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", shingle_k: int = 3) -> DataFrame:
    """Document fingerprints: full-content hash + a rolling shingle sketch
    (min xxhash64 over word k-shingles — order-invariant content signature)."""
    shingles = F.expr(
        f"transform(sequence(0, greatest(size(split({text_col},' ')) - {shingle_k}, 0)), "
        f"i -> xxhash64(concat_ws(' ', slice(split({text_col},' '), i + 1, {shingle_k}))))"
    )
    return df.select(
        "doc_id",
        F.xxhash64(text_col).alias("content_hash"),
        F.array_min(shingles).alias("min_shingle_hash"),
    )
