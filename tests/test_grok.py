"""Schema-file (grok) tokenizer: scalar/vector equivalence + semantics."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from clp_spark.functions.grok import (
    DEFAULT_SCHEMA,
    GrokSchema,
    VarPattern,
    encode_batch_schema,
    encode_text_schema,
)

CUSTOM = GrokSchema(
    patterns=(
        VarPattern("int", r"-?\d+"),
        VarPattern("float", r"-?\d+\.\d+"),
        VarPattern("conv", r"conv-\d+(-\d+)?"),
        VarPattern("user", r"user\d+"),
        VarPattern("hex", r"0x[a-fA-F0-9]+"),
    ),
    delimiters=" \t\r\n:,!;%",
)

TEXTS = [
    "used 123 of 4.2 GB in 1.9 seconds",
    "tool search latency 91 ms conv conv-000001",
    "retcode -17 offset 0x1F pad 007",
    "user42 started conv-000099-3 at 10:30:59",
    "no variables here",
    "",
    "a=b equals=sign7 path/with/slash9",
    "007 leading zero stays dict under int pattern",
]


def _cmp(texts, schema):
    s = pd.Series(texts, dtype=object)
    got = encode_batch_schema(s, schema)
    for i, t in enumerate(texts):
        want = encode_text_schema(t if t is not None else "", schema)
        for c, w in zip(got.columns, want):
            assert got[c].iat[i] == w if isinstance(w, str) else list(got[c].iat[i]) == list(w), (
                t, c, got[c].iat[i], w)


def test_custom_schema_equivalence():
    _cmp(TEXTS, CUSTOM)


def test_default_schema_equivalence():
    _cmp(TEXTS, DEFAULT_SCHEMA)


def test_priority_order():
    # "4.2" matches int pattern? no ('.' not in -?\d+ fullmatch) -> float wins;
    # "123" -> int; "conv-000001" -> conv (dict var)
    lt, vt, dv, en, sl = encode_text_schema("used 123 of 4.2 conv-000001", CUSTOM)
    assert vt == [0x11, 0x13, 0x12]
    assert dv == ["conv-000001"]
    assert en[0] == 123 and en[2] is None


def test_canonical_int_fallback_to_dict():
    # "007" fullmatches the int PATTERN but is not canonical -> dict var
    lt, vt, dv, en, sl = encode_text_schema("pad 007", CUSTOM)
    assert vt == [0x12] and dv == ["007"]


def test_delimiters_respected():
    # ':' is a delimiter -> "10:30:59" splits into three int vars
    lt, vt, dv, en, sl = encode_text_schema("at 10:30:59", CUSTOM)
    assert en == [10, 30, 59]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abc019-. :conv,user=x%", max_size=40), min_size=1, max_size=6))
def test_equivalence_random(texts):
    _cmp(texts, CUSTOM)
