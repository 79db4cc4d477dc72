"""Exact equivalence of the vectorized tokenizer vs the scalar oracle.

The scalar implementation (clp_spark.functions.tokenizer) encodes CLP's
documented rules one string at a time; the vectorized one
(clp_spark.functions.tokenizer_vec) must produce byte-identical outputs for
every input, including the escape/NUL rows it routes to the scalar path.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from clp_spark.functions.tokenizer import decode_text, encode_series_scalar
from clp_spark.functions.tokenizer_vec import encode_batch

EDGE_CASES = [
    "",
    " ",
    "statictext and more static text",
    "used 123 of 4.2 GB in 1.9 seconds",
    "Task MyDog123 started by user42 from APet4123\\test.txt",
    "value=abc123 mode=fast",
    "hash deadBEEF21 commit 231ACDFE21",
    "retcode -17 offset 0x1F pad 007",
    "ratio 123.4567890123456 neg -0.125",
    "overflow 12345678901234567.8 text 1.2.3",
    "tool search latency 91 ms conv conv-000001",
    # canonical-int edges
    "+1 007 -0 -012 0 -1 00",
    "9223372036854775807 9223372036854775808 -9223372036854775808 -9223372036854775809",
    "99999999999999999999999 12345678901234567890",
    # float edges
    ".5 5. -.5 -0.0 0.0 1..2 1.2.3 -. . -",
    "1234567890123456.7 12345678901234567.8 .1234567890123456 .12345678901234567",
    "-1234567890123456. -123456789012345.6",
    # '=' rule and hex rule
    "a=b x=5 =word word= ==flag= k=v=w",
    "ab AB aB 0x 0xG deadbeef DEADBEEF f A ff",
    # delimiters, unicode, weird spacing
    "a,b;c|d(e)f[g]h{i}j",
    "héllo wörld 123",
    "日本語テスト 42 値=速い",
    "trailing space ",
    " leading",
    "tab\tsep\tvals 7",
    "newline\nin middle 8",
    # escape-needing rows (scalar fallback path)
    "has\x11placeholder",
    "has\x12dict and 42",
    "backslash \\ alone C:\\path\\to\\file.txt 3",
    "nul\x00byte 5",
]


def assert_frames_equal(texts: list[str]) -> None:
    s = pd.Series(texts, dtype=object)
    got = encode_batch(s)
    want = encode_series_scalar(s)
    for col in ("logtype", "var_types", "dict_vars", "encoded_nums", "dict_slots"):
        assert list(got[col]) == list(want[col]), (
            f"column {col} diverged.\n texts={texts}\n got={list(got[col])}\n"
            f" want={list(want[col])}"
        )


def test_edge_cases():
    assert_frames_equal(EDGE_CASES)


def test_none_and_empty():
    s = pd.Series([None, "", "x 1", None], dtype=object)
    got = encode_batch(s)
    assert list(got["logtype"]) == ["", "", "x \x11", ""]
    assert list(got["encoded_nums"]) == [[], [], [1], []]


def test_roundtrip_through_vectorized():
    s = pd.Series([t for t in EDGE_CASES if "\x00" not in t], dtype=object)
    enc = encode_batch(s)
    for text, lt, dv, en in zip(s, enc["logtype"], enc["dict_vars"], enc["encoded_nums"]):
        assert decode_text(lt, dv, en) == text


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8"),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_equivalence_random_unicode(texts):
    assert_frames_equal(texts)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="abcXYZ0189+-.\\_ =,\x11\x13café",
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_equivalence_random_adversarial(texts):
    """Alphabet concentrated on token chars, signs, dots, escapes."""
    assert_frames_equal(texts)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**64), max_value=2**64),
            st.floats(allow_nan=False, allow_infinity=False),
            st.decimals(allow_nan=False, allow_infinity=False, places=8),
        ).map(str),
        min_size=1,
        max_size=10,
    ).map(lambda xs: [" ".join(xs)])
)
def test_equivalence_numeric_soup(texts):
    assert_frames_equal(texts)


def test_giant_token_four_pass_fallback():
    """A single token >= 2^16 bytes overflows the packed 16-bit class-count
    lanes, so _analyze must take the four-pass fallback. Pin that path
    against the scalar oracle (class counts drive int/float/dict typing)."""
    giant_dict = "a1" * 35_000  # 70,000 B, alpha+digit -> dictionary var
    giant_hex = "abcdef0123456789" * 4_100  # 65,600 B, hex-only token
    giant_digits = "9" * 65_600  # > 19 digits: integer overflow -> dict var
    giant_float = "1" * 65_600 + ".5"  # > 16 sig digits -> dict var
    texts = [
        f"job {giant_dict} took 42 ms",
        f"digest {giant_hex} ok",
        f"n={giant_digits} f {giant_float}",
        "plain small row 7",
    ]
    assert_frames_equal(texts)
    # and the encodings still round-trip byte-exactly
    s = pd.Series(texts, dtype=object)
    enc = encode_batch(s)
    for text, lt, dv, en in zip(s, enc["logtype"], enc["dict_vars"], enc["encoded_nums"]):
        assert decode_text(lt, dv, en) == text


def test_render_batch_equals_decode_text():
    from clp_spark.functions.tokenizer import (
        decode_text,
        encode_text,
        render_batch,
    )

    texts = [t for t in EDGE_CASES if t]
    lts, dvs, evs = [], [], []
    for t in texts:
        lt, vt, dv, en = encode_text(t)
        # merged encoded_vars: dict slots get arbitrary ids (renderer must
        # use dict_vars for those, never the id)
        ev = [e if e is not None else 12345 for e in en]
        lts.append(lt)
        dvs.append(list(dv))
        evs.append(ev)
    got = render_batch(lts, dvs, evs)
    want = [decode_text(lt, dv, [e if e is not None else 12345 for e in en])
            for lt, (_, _, dv, en) in zip(lts, (encode_text(t) for t in texts))]
    assert got == want == texts
