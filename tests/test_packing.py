"""Invariant tests for sequence packing (operators/packing.py): exactly-once
assignment, budget respected, dense offsets, determinism, efficiency."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from clp_spark.operators import packing as PK

SF_DIR = "/root/testdata/sf0.001"
MAX_TOKENS = 64


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _packed(spark):
    return PK.pack_sequences(_docs(spark), MAX_TOKENS, n_shards=8).cache()


def test_pack_exactly_once_and_token_counts(spark):
    d = _docs(spark)
    p = _packed(spark)
    ids = [r["id"] for r in p.select("id").collect()]
    assert sorted(ids) == sorted(r["doc_id"] for r in d.select("doc_id").collect())
    # n_tokens matches the curation/text_metrics counting rule
    want = {
        r["doc_id"]: len([t for t in re.split("[^a-z0-9]+", r["text"].lower()) if t])
        for r in d.select("doc_id", "text").collect()
    }
    for r in p.collect():
        assert r["n_tokens"] == want[r["id"]], r["id"]
        assert r["truncated"] == (r["n_tokens"] > MAX_TOKENS)


def test_pack_budget_and_solo_oversize(spark):
    p = _packed(spark)
    rows = p.collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    assert any(len(v) > 1 for v in by_bin.values())  # packing actually packs
    for bin_id, docs in by_bin.items():
        total = sum(r["n_tokens"] for r in docs)
        if len(docs) > 1:
            # multi-doc bins NEVER exceed the budget
            assert total <= MAX_TOKENS, (bin_id, total)
            assert not any(r["truncated"] for r in docs)
        elif docs[0]["n_tokens"] > MAX_TOKENS:
            assert docs[0]["truncated"]
        # offsets dense 0..n-1
        assert sorted(r["offset"] for r in docs) == list(range(len(docs)))


def test_pack_deterministic(spark):
    a = sorted(map(tuple, PK.pack_sequences(_docs(spark), MAX_TOKENS, n_shards=8).collect()))
    b = sorted(map(tuple, PK.pack_sequences(_docs(spark), MAX_TOKENS, n_shards=8).collect()))
    assert a == b


def test_pack_default_shards_data_derived(spark):
    """The n_shards default derives from the ROW COUNT (ceil(n/2M)), not
    defaultParallelism, so bin ids reproduce across cluster widths; at test
    scale the default must equal an explicit n_shards=1."""
    d = _docs(spark)
    dflt = sorted(map(tuple, PK.pack_sequences(d, MAX_TOKENS).collect()))
    one = sorted(map(tuple, PK.pack_sequences(d, MAX_TOKENS, n_shards=1).collect()))
    assert dflt == one
    assert all(r[3].startswith("0-") for r in dflt)  # single shard prefix


def test_pack_bestfit_tiebreak_lowest_bin(spark):
    """Capacity ties select the LOWEST bin index (the documented BFD
    tie-break): two equal-capacity bins opened in order 0,1 — the next
    fitting doc must land in bin 0."""
    rows = [(1, "a " * 40), (2, "b " * 40), (3, "c " * 20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    p = {r["id"]: r for r in PK.pack_sequences(d, 64, n_shards=1).collect()}
    # docs 1 and 2 (40 tokens) open bins 0-0 and 0-1, each with 24 left;
    # doc 3 (20 tokens) fits both -> tie-break says bin 0-0
    assert p[1]["bin_id"] != p[2]["bin_id"]
    assert p[3]["bin_id"] == p[1]["bin_id"] == "0-0"


def test_packing_stats_efficiency(spark):
    p = _packed(spark)
    st = PK.packing_stats(p, MAX_TOKENS).collect()[0]
    assert st["n_docs"] == _docs(spark).count()
    # BFD on this corpus should beat one-doc-per-bin by a wide margin
    naive_bins = st["n_docs"]
    assert st["n_bins"] < naive_bins
    assert 0.5 <= st["efficiency"] <= 1.0
    # efficiency recomputed from the assignment itself
    rows = p.collect()
    used = sum(min(r["n_tokens"], MAX_TOKENS) for r in rows)
    bins = len({r["bin_id"] for r in rows})
    assert abs(st["efficiency"] - used / (bins * MAX_TOKENS)) < 1e-3
