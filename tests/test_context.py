"""Direct tests for training-example assembly (operators/context.py);
DuckDB oracle parity runs via tests/test_parity_full.py."""

from __future__ import annotations

from clp_spark.operators import context as CTX


def _conv(spark):
    rows = [
        ("c1", 0, "user", "hello"),
        ("c1", 1, "assistant", "hi"),
        ("c1", 2, "user", "help me"),
        ("c1", 3, "assistant", "sure"),
        ("c2", 0, "user", "solo"),
    ]
    return spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "text"])


def test_context_windows_order_and_first_turn(spark):
    out = {
        (r["conv_id"], r["turn_idx"]): (list(r["context"]), r["target"])
        for r in CTX.context_windows(_conv(spark), n_turns=2).collect()
    }
    assert out[("c1", 0)] == ([], "hello")  # empty, not null
    assert out[("c1", 1)] == (["hello"], "hi")
    assert out[("c1", 2)] == (["hello", "hi"], "help me")
    assert out[("c1", 3)] == (["hi", "help me"], "sure")  # window slides
    assert out[("c2", 0)] == ([], "solo")


def test_flatten_conversations_ordered_doc(spark):
    out = {r["conv_id"]: r for r in CTX.flatten_conversations(_conv(spark)).collect()}
    assert out["c1"]["n_turns"] == 4
    assert out["c1"]["doc"] == "user: hello\nassistant: hi\nuser: help me\nassistant: sure"
    assert out["c2"]["doc"] == "user: solo"


def test_flatten_null_role_text_coalesce(spark):
    """NULL role/text render as '' on both sides of the ': ' join — the
    turn stays present instead of collapsing (concat_ws skip) or dropping
    the row (|| NULL propagation in a SQL oracle)."""
    rows = [("c1", 0, None, "hello"), ("c1", 1, "assistant", None)]
    d = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    out = {r["conv_id"]: r for r in CTX.flatten_conversations(d).collect()}
    assert out["c1"]["n_turns"] == 2
    assert out["c1"]["doc"] == ": hello\nassistant: "


def test_flatten_order_independent_of_input_order(spark):
    d = _conv(spark).orderBy("text").repartition(7)
    out = {r["conv_id"]: r["doc"] for r in CTX.flatten_conversations(d).collect()}
    assert out["c1"].startswith("user: hello")
