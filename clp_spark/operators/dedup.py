"""Deduplication operators for training-data pipelines.

Scale notes (100 TB / 10^12 rows):
  * exact dedup is a single hash-shuffle on a 64-bit content hash — the
    canonical map-side-combinable groupBy; no driver state.
  * MinHash+LSH avoids the O(n^2) pair space: shingle -> minhash signature
    (one Arrow-batched pass) -> band buckets (explode) -> self-join only
    within buckets. Bucket join keys are (band_idx, band_hash) so the shuffle
    is uniform unless documents are literally identical (those collapse in
    exact dedup first).
  * SimHash gives near-dup via Hamming distance on a 64-bit sketch; candidate
    pairing by band-of-bits, same bucketing trick.
  * n-gram Jaccard is the exact verifier used on LSH candidates (and as the
    small-scale oracle-checkable path).
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (keeper_id, n_copies) per distinct text.

    Group key is xxhash64(text) so the shuffle moves 8-byte keys, not
    documents; keeper = min id (deterministic)."""
    return (
        df.groupBy(F.xxhash64(text_col).alias("content_hash"))
        .agg(F.min(id_col).alias("keeper_id"), F.count("*").alias("n_copies"))
        .select("keeper_id", "n_copies")
    )


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (process/run independent — Python's
    built-in hash() is salted and must never reach executor code)."""
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.split(" ")
    if len(toks) < k:
        return {" ".join(toks)} if toks != [""] else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (id_a < id_b, jaccard >= threshold).

    Expressed as shingle explode -> self-equi-join on shingle -> count
    intersections -> jaccard = inter / (|A| + |B| - inter). Distributed
    (no O(n^2) crossJoin): the join only touches docs sharing a shingle.
    """
    shingles = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(size(split({text_col},' ')) - {k - 1}, 1)), "
                        f"i -> concat_ws(' ', slice(split({text_col},' '), i, {k})))"
                    )
                )
            ).alias("sh"),
        )
    )
    sizes = shingles.groupBy("id").agg(F.count("*").alias("sz"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


_PRIME = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42):
    """Universal-hash coefficients sized so a*h32 + b fits int64:
    a < 2^30, h32 < 2^32 -> product < 2^62 (no bigint/object math)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 30, size=num_hashes).astype(np.int64)
    b = rng.randint(0, 1 << 30, size=num_hashes).astype(np.int64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures, batch-vectorized: ALL shingles of an Arrow batch
    hash through the universal-hash bank in one int64 numpy matrix, and
    per-doc minima come from np.minimum.reduceat — no per-doc Python work
    beyond the shingle split. Docs are processed in sub-chunks so the
    (shingles x num_hashes) matrix stays ~100 MB regardless of batch size."""
    a_params, b_params = _minhash_params(num_hashes, seed)
    schema = StructType(
        [StructField("id", LongType()), StructField("sig", ArrayType(LongType()))]
    )
    chunk_docs = 2000

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, sigs_out = [], []
            for lo in range(0, len(pdf), chunk_docs):
                sub = pdf.iloc[lo : lo + chunk_docs]
                shingle_lists = [sorted(shingle_set(t or "", k)) for t in sub[text_col]]
                counts = np.fromiter(
                    (len(s) for s in shingle_lists), dtype=np.int64, count=len(sub)
                )
                flat = [s for lst in shingle_lists for s in lst]
                nonempty = counts > 0
                if flat:
                    hv = np.fromiter(
                        (stable_hash64(s) & 0xFFFFFFFF for s in flat),
                        dtype=np.int64,
                        count=len(flat),
                    )
                    m = (hv[:, None] * a_params[None, :] + b_params[None, :]) % _PRIME
                    offs = np.zeros(int(nonempty.sum()), dtype=np.int64)
                    np.cumsum(counts[nonempty][:-1], out=offs[1:])
                    mins = np.minimum.reduceat(m, offs, axis=0)
                ids_out.extend(sub[id_col])
                mi = 0
                for ne in nonempty:
                    if ne:
                        sigs_out.append(mins[mi].tolist())
                        mi += 1
                    else:
                        sigs_out.append([0] * num_hashes)
            yield pd.DataFrame({"id": ids_out, "sig": sigs_out})

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    signature -> band buckets (explode) -> self-join within (band, hash) ->
    distinct candidate pairs -> exact shingle-Jaccard verify >= threshold.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, k, text_col, id_col)
    buckets = sigs.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(concat_ws(',', slice(sig, b * {rows_per_band} + 1, {rows_per_band}))))"
            )
        ).alias("band", "bucket"),
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # exact verify on the candidate set only
    docs = df.select(F.col(id_col).alias("vid"), F.col(text_col).alias("vtext"))
    verified = (
        cand.join(docs.withColumnRenamed("vid", "id_a").withColumnRenamed("vtext", "text_a"), "id_a")
        .join(docs.withColumnRenamed("vid", "id_b").withColumnRenamed("vtext", "text_b"), "id_b")
    )
    jac_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("jaccard_x10000", LongType()),
        ]
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ia, ib, ta, tb in zip(pdf["id_a"], pdf["id_b"], pdf["text_a"], pdf["text_b"]):
                sa, sb = shingle_set(ta or "", k), shingle_set(tb or "", k)
                union = len(sa | sb)
                jac = (len(sa & sb) / union) if union else 0.0
                out.append((ia, ib, int(round(jac * 10000))))
            yield pd.DataFrame(out, columns=["id_a", "id_b", "jaccard_x10000"])

    return (
        verified.mapInPandas(verify, schema=jac_schema)
        .filter(F.col("jaccard_x10000") >= int(threshold * 10000))
    )


def simhash_sketches(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document (word-feature majority vote), one
    Arrow-batched pass; near-dup = small Hamming distance between sketches."""
    schema = StructType([StructField("id", LongType()), StructField("simhash", LongType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)

        for pdf in batches:
            word_lists = [(t or "").split(" ") for t in pdf[text_col]]
            counts = np.fromiter((len(w) for w in word_lists), np.int64, len(pdf))
            flat = [w for lst in word_lists for w in lst]
            # batch-level: hash all words once, expand to a (words x 64)
            # ±1 bit matrix, then per-doc sums via add.reduceat
            hv = np.fromiter(
                (stable_hash64(w) for w in flat), dtype=np.uint64, count=len(flat)
            )
            bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            pm = 2 * bits - 1
            offs = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(counts[:-1], out=offs[1:])
            votes = np.add.reduceat(pm, offs, axis=0)  # every doc has >=1 word
            sh = ((votes > 0).astype(np.uint64) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "simhash": sh.view(np.int64)}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
