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


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Gopher-style repetition filters per document (Rae et al. 2021,
    appendix A1.1): the share of text covered by the single most frequent
    word n-gram, and the share of n-gram characters sitting inside grams
    that occur two or more times. High values flag boilerplate / spam pages
    for removal from a training corpus.

    Shuffle-FREE by design: a per-document metric needs no groupBy — the
    obvious explode + count plan would shuffle every n-gram occurrence in a
    100 TB corpus just to re-group rows that already live together. Instead
    each row sorts its own gram array and scans runs inside JVM higher-order
    expressions (array_sort + aggregate), so the whole operator is a narrow
    projection.

    Outputs per doc_id:
      n_grams                 total n-gram occurrences (0 if < n words)
      top_gram                most frequent gram; ties -> lexicographically
                              smallest (the sorted scan's strict-> keeps the
                              first maximum it meets)
      top_gram_count          its occurrence count
      top_gram_char_fraction  top_gram_count * len(top_gram) / len(text)
      dup_gram_char_fraction  chars in grams occurring >= 2 times / chars in
                              all gram occurrences (self-normalized so the
                              metric is length-free)
    """
    toks = f"filter(split({text_col}, ' '), x -> x <> '')"
    # slice() is 1-based; guard < n tokens (sequence(1, 0) would DESCEND)
    grams = (
        f"IF(size({toks}) < {n}, array(), "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))))"
    )
    d = df.select("doc_id", F.col(text_col).alias("_t"), F.expr(grams).alias("_g"))
    d = d.withColumn("_s", F.expr("array_sort(_g)"))
    # ONE pass over the sorted grams (no array indexing — ANSI mode would
    # throw on any out-of-range subscript): track (prev, current run length,
    # best run, best gram, chars in finished duplicated runs). Strict > keeps
    # the FIRST maximal run = the lexicographically smallest gram on ties;
    # the finish lambda closes out the final run.
    scan = F.expr(
        "aggregate(_s, "
        "named_struct('prev', cast(null as string), 'run', 0, "
        "             'best', 0, 'bestg', '', 'dup', 0L), "
        "(a, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(a.prev <=> x, a.run + 1, 1), "
        "  'best', greatest(IF(a.prev <=> x, a.run + 1, 1), a.best), "
        "  'bestg', IF(IF(a.prev <=> x, a.run + 1, 1) > a.best, x, a.bestg), "
        "  'dup', a.dup + IF(NOT(a.prev <=> x) AND a.run >= 2, "
        "                    cast(a.run as bigint) * length(a.prev), 0L)), "
        "a -> named_struct("
        "  'best', a.best, 'bestg', a.bestg, "
        "  'dup', a.dup + IF(a.run >= 2, cast(a.run as bigint) * length(a.prev), 0L)))"
    )
    tot_chars = F.expr("aggregate(_s, 0L, (a, x) -> a + length(x))")
    # Materialize the scan struct in its own projection: CollapseProject
    # declines to merge expensive expressions referenced more than once, so
    # the O(grams) aggregate runs ONCE per row instead of once per output
    # column.
    d = d.select(
        "doc_id",
        "_t",
        F.expr("size(_s)").cast("bigint").alias("_m"),
        scan.alias("_scan"),
        tot_chars.alias("_tot"),
    )
    d = d.select(
        "doc_id",
        F.col("_m").alias("n_grams"),
        F.col("_scan")["bestg"].alias("top_gram"),
        F.col("_scan")["best"].cast("bigint").alias("top_gram_count"),
        F.when(
            F.length("_t") > 0,
            F.round(
                F.col("_scan")["best"] * F.length(F.col("_scan")["bestg"]) / F.length("_t"),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_gram_char_fraction"),
        F.when(F.col("_tot") > 0, F.round(F.col("_scan")["dup"] / F.col("_tot"), 4))
        .otherwise(F.lit(0.0))
        .alias("dup_gram_char_fraction"),
    )
    return d


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
