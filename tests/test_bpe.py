"""Tests for BPE training/encoding (operators/bpe.py): parity with an
independent from-scratch reference implementation, lossless round-trip,
determinism."""

from __future__ import annotations

import re
from collections import Counter

from clp_spark.operators import bpe as BPE

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 50


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _naive_bpe(word_freqs, n_merges):
    """Independent reference: recompute ALL pair counts from scratch each
    iteration (no incremental bookkeeping to share bugs with)."""
    words = {i: list(w) for i, (w, _) in enumerate(word_freqs)}
    freqs = [c for _, c in word_freqs]
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for i, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += freqs[i]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for i, syms in words.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
    return merges


def test_bpe_train_matches_naive_reference(spark):
    d = _docs(spark)
    wc = BPE.word_counts(d)
    got = BPE.bpe_train(d, n_merges=N_MERGES)
    want = _naive_bpe(wc, N_MERGES)
    assert got == want


def test_bpe_train_deterministic(spark):
    d = _docs(spark)
    assert BPE.bpe_train(d, n_merges=30) == BPE.bpe_train(
        d.repartition(16), n_merges=30
    )


def test_bpe_encode_roundtrip_and_compression(spark):
    d = _docs(spark)
    merges = BPE.bpe_train(d, n_merges=N_MERGES)
    enc = {r["id"]: r["bpe_tokens"] for r in BPE.bpe_encode(d, merges).collect()}
    texts = {r["doc_id"]: r["text"] for r in d.select("doc_id", "text").collect()}
    total_tokens = 0
    total_chars = 0
    for doc_id, text in texts.items():
        words = [w for w in re.split("[^a-z0-9]+", text.lower()) if w]
        toks = enc[doc_id]
        # lossless: concatenating the tokens reproduces the word stream
        assert "".join(toks) == "".join(words), doc_id
        total_tokens += len(toks)
        total_chars += sum(len(w) for w in words)
    # merges actually compress: fewer tokens than characters
    assert total_tokens < total_chars


def test_bpe_encode_applies_merges(spark):
    rows = [(1, "aaaa aaaa bbbb")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = BPE.bpe_encode(d, [("a", "a"), ("aa", "aa"), ("b", "b")]).collect()
    assert out[0]["bpe_tokens"] == ["aaaa", "aaaa", "bb", "bb"]
