"""Unit vectors mirroring reference tests (semantics, not code):
components/core/tests/test-EncodedVariableInterpreter.cpp:26-431 and
components/core/tests/test-ir_parsing.cpp."""

import pytest
from hypothesis import given, strategies as st

from clp_spark.functions.encoding import (
    INT64_MAX,
    INT64_MIN,
    decode_float,
    decode_int,
    encode_float,
    encode_int,
)
from clp_spark.functions.tokenizer import (
    PLACEHOLDER_DICT,
    PLACEHOLDER_FLOAT,
    PLACEHOLDER_INT,
    decode_text,
    encode_text,
    tokenize,
)
from clp_spark.functions.wildcard import wildcard_match, wildcard_to_regex


class TestIntEncoding:
    @pytest.mark.parametrize(
        "s,expected",
        [
            ("0", 0),
            ("1", 1),
            ("-1", -1),
            ("123", 123),
            ("-123456", -123456),
            (str(INT64_MAX), INT64_MAX),
            (str(INT64_MIN), INT64_MIN),
        ],
    )
    def test_canonical_ints(self, s, expected):
        assert encode_int(s) == expected
        assert decode_int(expected) == s

    @pytest.mark.parametrize(
        "s",
        ["", "+1", "007", "07", "-0", "-07", " 1", "1 ", "1.0", "abc", "0x1F",
         "--1", "-", str(INT64_MAX + 1), str(INT64_MIN - 1), "9" * 30],
    )
    def test_rejected_ints(self, s):
        assert encode_int(s) is None


class TestFloatEncoding:
    @pytest.mark.parametrize(
        "s",
        ["0.0", "1.9", "4.2", "-1.0", "-0.125", "123.4567890123456",
         "-123456789012345.6", ".1234567890123456", "-.1234567890123456",
         ".5", "0.00001", "123.456", "000.000", "-00.00"],
    )
    def test_roundtrip(self, s):
        enc = encode_float(s)
        assert enc is not None, s
        assert decode_float(enc) == s

    @pytest.mark.parametrize(
        "s",
        ["", "-", ".", "-.", "5.", "123", "-123", "1.2.3", "1e5", "+1.0",
         "12345678901234567.8", "1234567890123456.7", "--1.0", "1,0", "0x1.8"],
    )
    def test_rejected_floats(self, s):
        assert encode_float(s) is None

    @given(st.from_regex(r"-?[0-9]{0,8}\.[0-9]{1,8}", fullmatch=True))
    def test_roundtrip_property(self, s):
        enc = encode_float(s)
        digits = sum(c.isdigit() for c in s)
        if 1 <= digits <= 16 and not s.endswith("."):
            assert enc is not None
            assert decode_float(enc) == s

    def test_int64_bitpattern_range(self):
        for s in ["-123456789012345.6", "-.1234567890123456", "0.0"]:
            enc = encode_float(s)
            assert INT64_MIN <= enc <= INT64_MAX


class TestTokenizer:
    def test_delimiter_set(self):
        # is_delim(c) false exactly for [+\-.0-9A-Za-z\\_]
        spans = tokenize("a+b-c.d\\e_f")
        assert spans == [(0, 11, False)]  # one token, no digit/hex/= -> const

    def test_simple_variables(self):
        lt, vt, dv, en = encode_text("used 123 of 4.2 GB in 1.9 seconds")
        assert lt == f"used {PLACEHOLDER_INT} of {PLACEHOLDER_FLOAT} GB in {PLACEHOLDER_FLOAT} seconds"
        assert list(dv) == []
        assert en[0] == 123

    def test_dict_vars(self):
        lt, vt, dv, en = encode_text("Task MyDog123 started by user42 from APet4123\\test.txt")
        # 'APet4123\test.txt' is ONE token (\\ and . are not delimiters), has digits
        assert list(dv) == ["MyDog123", "user42", "APet4123\\test.txt"]
        assert lt == f"Task {PLACEHOLDER_DICT} started by {PLACEHOLDER_DICT} from {PLACEHOLDER_DICT}"

    def test_equals_preceded_alpha(self):
        lt, vt, dv, en = encode_text("value=abc123 mode=fast")
        assert list(dv) == ["abc123", "fast"]
        assert lt == f"value={PLACEHOLDER_DICT} mode={PLACEHOLDER_DICT}"

    def test_hex_rule(self):
        lt, _, dv, _ = encode_text("hash deadBEEF commit 231ACDFE21")
        assert list(dv) == ["deadBEEF", "231ACDFE21"]
        # single hex char is NOT a variable; 'hash'/'commit' contain non-hex chars
        lt2, _, dv2, _ = encode_text("grade a given")
        assert list(dv2) == []

    def test_canonical_int_edges(self):
        lt, vt, dv, en = encode_text("retcode -17 offset 0x1F pad 007")
        assert lt == f"retcode {PLACEHOLDER_INT} offset {PLACEHOLDER_DICT} pad {PLACEHOLDER_DICT}"
        assert en[0] == -17
        assert list(dv) == ["0x1F", "007"]

    def test_float_fallback_to_dict(self):
        lt, vt, dv, en = encode_text("overflow 12345678901234567.8 text 1.2.3")
        assert list(dv) == ["12345678901234567.8", "1.2.3"]

    def test_no_variables(self):
        lt, vt, dv, en = encode_text("statictext and more static text")
        assert lt == "statictext and more static text"
        assert not vt

    def test_escape_placeholder_bytes(self):
        raw = "escape \x11 and \x12 and \x13 and \\ literal"
        lt, vt, dv, en = encode_text(raw)
        assert decode_text(lt, dv, en) == raw
        assert "\\\x11" in lt and "\\\\" in lt

    @pytest.mark.parametrize(
        "text",
        [
            "Task MyDog123 started by user42 from APet4123\\test.txt",
            "statictext and more static text",
            "used 123 of 4.2 GB in 1.9 seconds",
            "value=abc123 mode=fast",
            "hash deadBEEF21 commit 231ACDFE21",
            "retcode -17 offset 0x1F pad 007",
            "ratio 123.4567890123456 neg -0.125",
            "overflow 12345678901234567.8 text 1.2.3",
            "tool search latency 91 ms conv conv-000001",
            "error at 2016-05-08 07:34:05.254\nis multiline\ncaused by 123",
            "escape \x11\x12\x13\\ bytes",
            "",
            "   ",
            "=x =ab1 a=1 a==b",
        ],
    )
    def test_roundtrip_identity(self, text):
        lt, vt, dv, en = encode_text(text)
        assert decode_text(lt, dv, en) == text

    @given(st.text(alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF), max_size=80))
    def test_roundtrip_property(self, text):
        lt, vt, dv, en = encode_text(text)
        assert decode_text(lt, dv, en) == text


class TestWildcard:
    @pytest.mark.parametrize(
        "tame,wild,expected",
        [
            ("abc", "abc", True),
            ("abc", "a*c", True),
            ("abc", "a?c", True),
            ("abc", "a?b", False),
            ("container 7 failed", "container * failed", True),
            ("container 7 ok", "container * failed", False),
            ("a*c", "a\\*c", True),
            ("abc", "a\\*c", False),
            ("ABC", "abc", False),
            ("x\ny", "x*y", True),
            ("abc", "*", True),
            ("", "*", True),
            ("", "?", False),
        ],
    )
    def test_match(self, tame, wild, expected):
        assert wildcard_match(tame, wild) is expected

    def test_case_insensitive(self):
        assert wildcard_match("ABC", "abc", case_sensitive=False)

    def test_regex_specials_escaped(self):
        assert wildcard_match("a.c(x)[y]", "a.c(x)[y]")
        assert not wildcard_match("abc(x)[y]", "a.c(x)[y]")
