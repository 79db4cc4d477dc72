"""BPE tokenizer training + encoding over a document corpus — the
tokenizer-training step of an LLM data pipeline (learn merge rules from
corpus statistics, then encode text into subword tokens).

No counterpart in the reference repo; training-data-pipeline extension
mandate, same as operators/curation.py.

Scale shape (100 TB corpus): classic BPE needs only the WORD-FREQUENCY
table, not the corpus — so training is ONE distributed scan (explode +
map-side-combinable groupBy count; the shuffle carries one row per distinct
word per partition) followed by merge iterations over the aggregated table.
Distinct-word counts grow ~O(corpus^0.5) (Heaps' law): ~10^7 distinct words
at web scale, which collects in seconds — the merge loop itself never
touches the corpus again. Encoding is embarrassingly parallel with per-batch
memoization over distinct words (Zipf: a few thousand distinct words cover
almost every batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_counts", "bpe_train", "bpe_encode"]

_TOKEN_SEP_RE = "[^a-z0-9]+"


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int = 1_000_000
) -> list[tuple[str, int]]:
    """Distributed (word, count) table, deterministic order (count desc,
    word asc), truncated to the `max_words` most frequent — the only
    corpus-wide pass BPE training needs. TakeOrderedAndProject, not a full
    sort."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), _TOKEN_SEP_RE), lambda t: t != F.lit("")
    )
    rows = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in rows]


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merge rules -> ordered [(left, right), ...].

    Standard frequency-table BPE (the Sennrich et al. 2016 algorithm):
    words start as character sequences; each iteration merges the
    most-frequent adjacent symbol pair, weighted by word frequency, with a
    DETERMINISTIC tie-break (lexicographic pair) so training is reproducible
    across runs and partitionings. Pair counts are maintained incrementally
    (only words containing the merged pair are re-scanned), so the loop is
    O(n_merges * affected-words), not O(n_merges * vocab).
    """
    from collections import Counter, defaultdict

    wc = word_counts(df, text_col, max_words)
    words: list[list[str]] = [list(w) for w, _ in wc]
    freqs = [c for _, c in wc]

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, c) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += c
            pair_words[(a, b)].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        # max count, lexicographically-smallest pair tiebreak
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words[best]):
            syms, c = words[i], freqs[i]
            # decrement this word's old pairs, apply the merge, increment new
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] -= c
                if pair_counts[(a, b)] <= 0:
                    del pair_counts[(a, b)]
                pair_words[(a, b)].discard(i)
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_counts[(a, b)] += c
                pair_words[(a, b)].add(i)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode each document's words with the learned merges -> (id,
    out_col: array<string>). Greedy lowest-rank-first application (the
    GPT-2 encoder's loop), memoized per distinct word within each Arrow
    batch; concatenating a word's tokens always reproduces the word
    (lossless by construction)."""
    import re as _re

    import pandas as pd
    from pyspark.sql import types as T

    rank = {p: i for i, p in enumerate(merges)}
    sep = _re.compile(_TOKEN_SEP_RE)

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        while len(syms) > 1:
            pairs = [(rank.get((a, b)), k) for k, (a, b) in enumerate(zip(syms, syms[1:]))]
            cand = [(r, k) for r, k in pairs if r is not None]
            if not cand:
                break
            r, k = min(cand)
            syms = syms[:k] + [syms[k] + syms[k + 1]] + syms[k + 2 :]
        return syms

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    id_field = src.schema["id"]
    out_schema = T.StructType(
        [id_field, T.StructField(out_col, T.ArrayType(T.StringType()))]
    )

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for t in pdf["text"]:
                toks: list[str] = []
                for w in sep.split((t or "").lower()):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w)
                        cache[w] = enc
                    toks.extend(enc)
                out.append(toks)
            yield pd.DataFrame({"id": pdf["id"], out_col: out})

    return src.mapInPandas(run, out_schema)
