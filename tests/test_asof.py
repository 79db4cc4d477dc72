"""As-of (SCD-2) join: semantics, strategy equivalence, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clp_spark.operators.asof import asof_join

SF_DIR = "/root/testdata/sf0.001"


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def small(spark):
    facts = spark.createDataFrame(
        [
            (1, 1, _ts(10), 100.0),  # version 'a' (09:30) effective
            (2, 1, _ts(11), 200.0),  # version 'b' exactly at 11:00 -> inclusive
            (3, 1, _ts(9), 300.0),   # before any version -> null
            (4, 2, _ts(12), 400.0),  # key with no dim rows -> null
            (5, 3, _ts(12), 500.0),  # latest version has NULL value -> still wins
        ],
        "event_id long, k long, ts timestamp, v double",
    )
    dim = spark.createDataFrame(
        [
            (1, _ts(9, 30), "a"),
            (1, _ts(11), "b"),
            (3, _ts(8), "x"),
            (3, _ts(10), None),
        ],
        "k long, ts timestamp, ver string",
    )
    return facts, dim


EXPECTED = {1: "a", 2: "b", 3: None, 4: None, 5: None}
EXPECTED_TS = {1: _ts(9, 30), 2: _ts(11), 3: None, 4: None, 5: _ts(10)}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_asof_known_small(small, strategy):
    facts, dim = small
    out = asof_join(facts, dim, on="k", strategy=strategy)
    rows = {r["event_id"]: r for r in out.collect()}
    assert {i: r["asof_ver"] for i, r in rows.items()} == EXPECTED
    # row 5: the null-valued version at 10:00 supersedes 'x' at 08:00 —
    # its effective ts proves the payload-struct null handling
    assert {i: r["asof_ts"] for i, r in rows.items()} == EXPECTED_TS
    assert set(rows[1].asDict()) == {"event_id", "k", "ts", "v", "asof_ts", "asof_ver"}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_asof_tolerance(small, strategy):
    facts, dim = small
    out = asof_join(
        facts, dim, on="k", strategy=strategy,
        tolerance_micros=45 * 60 * 1_000_000,  # 45 min
    )
    rows = {r["event_id"]: r["asof_ver"] for r in out.collect()}
    # event 1 (10:00) vs version 'a' (09:30) = 30 min -> kept;
    # event 2 (11:00) vs 'b' (11:00) = 0 -> kept;
    # event 5 (12:00) vs null-version (10:00) = 2 h -> dropped entirely
    assert rows == {1: "a", 2: "b", 3: None, 4: None, 5: None}
    ts5 = {r["event_id"]: r["asof_ts"] for r in out.collect()}[5]
    assert ts5 is None


def test_asof_strategies_agree_on_events(spark):
    """Both strategies produce identical enrichment over the real events
    table, and both agree with pandas merge_asof (an independent engine)."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dim = e.where(F.col("event_type") == "signup").select("user_id", "ts", "value")
    facts = e.where(F.col("event_type") != "signup").select(
        "event_id", "user_id", "ts", "value"
    )
    a = asof_join(facts, dim, on="user_id", strategy="broadcast")
    b = asof_join(facts, dim, on="user_id", strategy="shuffle")
    pa = a.orderBy("event_id").toPandas()
    pb = b.orderBy("event_id").toPandas()
    assert pa.equals(pb)

    import pandas as pd

    pf = facts.toPandas().sort_values("ts").reset_index(drop=True)
    pd_dim = dim.toPandas().sort_values("ts").reset_index(drop=True)
    ref = pd.merge_asof(
        pf, pd_dim.rename(columns={"ts": "asof_ts", "value": "asof_value"}),
        left_on="ts", right_on="asof_ts", by="user_id", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    got = pa.reset_index(drop=True)
    assert got["asof_value"].equals(ref["asof_value"])
    assert got["asof_ts"].equals(ref["asof_ts"])
    # sanity: the corpus actually exercises both matched and unmatched facts
    assert got["asof_value"].notna().any() and got["asof_value"].isna().any()


def test_asof_multi_key(spark):
    facts = spark.createDataFrame(
        [(1, "eu", "p1", _ts(10)), (2, "us", "p1", _ts(10))],
        "fid long, region string, product string, ts timestamp",
    )
    dim = spark.createDataFrame(
        [("eu", "p1", _ts(9), 1.5), ("us", "p1", _ts(9), 2.5)],
        "region string, product string, ts timestamp, price double",
    )
    for strategy in ("broadcast", "shuffle"):
        out = asof_join(facts, dim, on=["region", "product"], strategy=strategy)
        rows = {r["fid"]: r["asof_price"] for r in out.collect()}
        assert rows == {1: 1.5, 2: 2.5}


def test_asof_broadcast_plan_has_no_shuffle_of_facts(spark):
    """The broadcast strategy must be a map-only enrich: BroadcastHashJoin,
    and NO sort-merge join / fact-side exchange in the physical plan."""
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dim = e.where(F.col("event_type") == "signup").select("user_id", "ts", "value")
    facts = e.where(F.col("event_type") != "signup").select("event_id", "user_id", "ts", "value")
    from test_plans import plan_of

    plan = plan_of(asof_join(facts, dim, on="user_id", strategy="broadcast"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
