"""Tests for the Misra-Gries heavy-hitter sketch (operators/sketch.py):
undercount bound, superset guarantee, exactness below capacity, and the
bounded shuffle shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from clp_spark.operators.sketch import heavy_hitters

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _exact_counts(spark):
    rows = _docs(spark).select("text").collect()
    from collections import Counter

    c = Counter()
    for r in rows:
        c.update(re.findall("[a-z0-9]+", r["text"].lower()))
    return c


def test_exact_when_capacity_exceeds_vocab(spark):
    """No partition ever decrements -> the sketch IS the exact count and
    max_undercount is 0."""
    got = {
        r["token"]: (r["est_count"], r["max_undercount"])
        for r in heavy_hitters(_docs(spark), capacity=4096, k=None).collect()
    }
    exact = _exact_counts(spark)
    assert {t: c for t, (c, _) in got.items()} == dict(exact)
    assert all(e == 0 for _, e in got.values())


@pytest.mark.parametrize("capacity", [4, 8, 16])
def test_bounds_and_superset_under_decrement_pressure(spark, capacity):
    """For every partitioning and tiny capacity: est <= true,
    true - est <= max_undercount, and every token with
    true > max_undercount is present."""
    exact = _exact_counts(spark)
    for d in (_docs(spark), _docs(spark).repartition(19)):
        rows = heavy_hitters(d, capacity=capacity, k=None).collect()
        assert rows
        err = rows[0]["max_undercount"]
        assert err > 0  # vocab > capacity: pressure was real
        got = {r["token"]: r["est_count"] for r in rows}
        for t, est in got.items():
            assert est <= exact[t]
            assert exact[t] - est <= err, (t, est, exact[t], err)
        for t, true in exact.items():
            if true > err:
                assert t in got, (t, true, err)


def test_topk_limits_output(spark):
    out = heavy_hitters(_docs(spark), capacity=4096, k=5).collect()
    assert len(out) == 5
    exact = _exact_counts(spark)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["est_count"]) for r in out] == want


def test_capacity_validation(spark):
    with pytest.raises(ValueError):
        heavy_hitters(_docs(spark), capacity=0)


def test_summary_rows_bounded_by_partitions_times_capacity(spark):
    """Each partition contributes <= capacity surviving tokens, so the
    merged result holds <= partitions x capacity distinct tokens — the
    scale contract that replaces the unbounded distinct-token shuffle."""
    d = _docs(spark).repartition(7)
    cap = 8
    n = heavy_hitters(d, capacity=cap, k=None).count()
    assert n <= 7 * cap


def test_null_text_contributes_no_tokens(spark):
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "beta")], "doc_id long, text string"
    )
    got = {r["token"]: r["est_count"] for r in heavy_hitters(d, 16, k=None).collect()}
    assert got == {"alpha": 1, "beta": 2}


def test_single_scan_plan(spark):
    """heavy_hitters reads the corpus ONCE: exactly one MapInPandas node in
    the executed plan (the review found the old two-branch shape scanned
    and tokenized everything twice)."""
    plan = (
        heavy_hitters(_docs(spark), capacity=8, k=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1


def test_summaries_preserve_bound_when_all_counters_wiped(spark):
    """capacity=1 over 'a b a b' in one partition: the decrement wipes both
    counters, heavy_hitters is legitimately empty (no token's true count
    exceeds the bound), but summaries() still reports the bound in its
    null-token row."""
    from clp_spark.operators.sketch import summaries

    d = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string").coalesce(1)
    assert heavy_hitters(d, capacity=1, k=None).count() == 0
    rows = summaries(d, capacity=1).collect()
    bounds = [r["est_count"] for r in rows if r["token"] is None]
    assert bounds and sum(bounds) >= 2  # the wiped mass is still accounted
