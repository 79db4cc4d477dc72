"""Training-corpus curation operators: deterministic splits, vocabulary
build, benchmark-contamination checks, PII scrubbing.

The curation steps every large-scale training-data pipeline runs between
ingest and export, expressed as pure `pyspark.sql.functions` plans (zero
UDFs, whole-stage codegen end to end) so Catalyst keeps filter pushdown and
map-side partial aggregation. Every operator here is engine-portable by
construction — the same expression is valid DuckDB SQL — which is what makes
the driver/pytest oracle parity possible.

No counterpart in the reference repo (CLP stops at search/agg over logs);
these belong to the training-data-pipeline extension mandate, same as
operators/dedup.py and operators/similarity.py.

Scale notes (10^12-row regime):
* hash_split is per-row independent (one md5 over the id, no shuffle, no
  state): adding documents NEVER reassigns existing ones, the property that
  makes incremental corpus growth safe; split fractions hold by the uniform
  distribution of md5 over hex prefixes.
* token_vocab is a map-side-combinable count + TakeOrderedAndProject: the
  shuffle carries one row per DISTINCT token per partition, not per
  occurrence.
* contamination builds the n-gram set of the (small) benchmark side,
  broadcasts it, and LEFT SEMI joins the training side's exploded n-grams —
  the training corpus is never shuffled, only scanned.
* pii_redact is one regexp_replace pass per pattern, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_split",
    "token_vocab",
    "word_ngrams",
    "contamination",
    "PII_PATTERNS",
    "pii_redact",
    "pii_stats",
]

# (split_name, exclusive upper bound on the 4-hex-digit md5 prefix); None =
# everything remaining. 0xcccc/0x10000 = 79.999%, 0xe666 = 89.999% — the
# boundaries are FIXED hex literals, not computed fractions, so the
# assignment is reproducible from the spec alone.
DEFAULT_SPLITS: tuple[tuple[str, str | None], ...] = (
    ("train", "cccc"),
    ("val", "e666"),
    ("test", None),
)

TOKEN_SEP_RE = "[^a-z0-9]+"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, str | None], ...] = DEFAULT_SPLITS,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic, stateless train/val/test assignment.

    bucket = first 4 hex digits of md5(cast(id as string)); each row takes
    the first split whose bound is lexicographically above its bucket.
    Per-row independent: no shuffle, no RNG, stable under repartitioning,
    under corpus growth, and across engines (md5 is md5 everywhere).
    """
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    expr = None
    for name, bound in reversed(splits):
        if bound is None:
            expr = F.lit(name)
        else:
            expr = F.when(bucket < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def _tokens(text_col: str):
    """Lowercased alphanumeric tokens of a text column (empties dropped) —
    the same expression DuckDB evaluates identically, which keeps vocab and
    n-gram operators oracle-portable."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), TOKEN_SEP_RE), lambda t: t != F.lit("")
    )


def token_vocab(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 100
) -> DataFrame:
    """Top-k corpus vocabulary: (token, n_occurrences, n_docs), ordered by
    frequency desc with token tiebreak (deterministic across engines).

    The BPE-prep / frequency-floor step of tokenizer training. Map-side
    partial aggregation collapses per-partition duplicates before the
    shuffle; the final top-k is a TakeOrderedAndProject, not a full sort.
    """
    tok = df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
    agg = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    return agg.orderBy(F.desc("n_occurrences"), "token").limit(k)


def word_ngrams(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ngram) pairs of word n-grams (space-joined, lowercased,
    DISTINCT per doc). Rows with fewer than n tokens produce none.

    The per-doc dedup is ROW-LOCAL (`array_distinct` before the explode):
    an (id, ngram) pair can only repeat within one document's own gram
    array, so this is exactly a `.distinct()` of the exploded pairs with
    ZERO shuffle — the difference between scanning and re-sorting the
    training corpus at 100 TB."""
    toks = _tokens(text_col)
    # guard: Spark's sequence(1, 0) yields DESCENDING [1, 0], not empty —
    # rows shorter than n tokens must produce an empty index list instead
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )
    return df.select(F.col(id_col).alias("id"), F.explode(grams).alias("ngram"))


def contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination report: training docs sharing at least one
    word n-gram with the benchmark set -> (id, n_hits) with n_hits = how
    many DISTINCT benchmark n-grams the doc contains.

    The decontamination step run before every serious training job (the
    GPT-3 paper's 13-gram filter, PaLM's n-gram dedup-vs-eval). The
    benchmark side is small by nature: its n-grams broadcast, and the
    training corpus is scanned once — no shuffle of the big side.

    ONE shuffle total: the bench side is broadcast WITHOUT a distinct()
    (word_ngrams is already per-doc distinct, so dup grams only come from
    distinct bench docs sharing a gram — a small constant inflation of the
    broadcast hash table), and the cross-bench-doc dedup folds into the
    final countDistinct, whose partial (id, ngram) dedup runs map-side.
    """
    bench_grams = word_ngrams(bench, n, text_col, id_col).select("ngram")
    train_grams = word_ngrams(train, n, text_col, id_col)
    hits = train_grams.join(F.broadcast(bench_grams), "ngram")
    return hits.groupBy("id").agg(F.countDistinct("ngram").alias("n_hits"))


# Portable PII regexes: the subset of syntax Java regex (Spark) and RE2
# (DuckDB) interpret identically — character classes, bounded repetition,
# alternation; no backreferences, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Replace each PII match with `<NAME>`; one regexp_replace pass per
    pattern, all JVM-side codegen. `out_col` defaults to in-place."""
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    for name, pat in pats.items():
        col = F.regexp_replace(col, pat, f"<{name.upper()}>")
    return df.withColumn(out_col or text_col, col)


def pii_stats(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Per-pattern corpus audit: docs containing the pattern + total
    mentions. One scan, all patterns at once."""
    pats = patterns or PII_PATTERNS
    aggs = []
    for name, pat in pats.items():
        cnt = F.regexp_count(F.col(text_col), F.lit(pat))
        aggs.append(F.sum(F.when(cnt > 0, 1).otherwise(0)).alias(f"docs_{name}"))
        aggs.append(F.sum(cnt).alias(f"mentions_{name}"))
    return df.agg(*aggs)
