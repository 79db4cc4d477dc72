"""FormattedFloat / DictionaryFloat codec tests (VERDICT r3 item 4).

Mirrors the reference fixtures
components/core/tests/test_log_files/test_{valid,invalid}_formatted_float.jsonl
and test_search_formatted_float.jsonl: every VALID text gets a descriptor
and restores byte-exactly; every INVALID text routes to the raw fallback
(the DictionaryFloat analog) — and the batch path round-trips ALL of them
byte-exactly either way.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from clp_spark.functions.float_format import (
    encode_float_formats_batch,
    get_float_encoding,
    restore_encoded_float,
    restore_floats_batch,
)

# The reference fixture corpora, inlined (values copied from
# test_valid_formatted_float.jsonl / test_invalid_formatted_float.jsonl /
# test_search_formatted_float.jsonl so the test is self-contained).
VALID = [
    "0.007", "-0.007", "123456789.1234567", "123456789.000",
    "0.00000000000000000000000000001234567891234500", "0.00",
    "-123456789.1234567", "-123456789.000",
    "-0.00000000000000000000000000001234567891234500", "-0.00",
    "1.234567891234567E9", "1.234567891234567E-9", "1.234567891234500E9",
    "1E16", "1.234567891234567E+9", "1.234567891234567E+0009",
    "-1.234567891234567E-0009", "1.234567891234567e9",
    "-1.234567891234567E9", "-1.234567891234567E-9",
    "0E0", "0.000E0", "-0.000E0", "0E+0000", "-0E+0000",
    "2.000000", "3E3", "-1.000000E3", "-1.000000E-2", "-1.000000E-30",
    "1.000000E-16", "0.0000000000000001",
]
INVALID = [
    "123456789.123456789", "-123456789.123456789", "123456789.123456700",
    "0.00000000000000000123456789123456789", "0.00000000000000000",
    "-0.00000000000000000", "1.23456789123456789E8",
    "1.23456789123456789E-8", "1.23456789123456700E8",
    "1.234567891234567E00008", "1.234567891234567E+00008",
    "1.234567891234567E-00008", "123456789.1234567E3",
    "12.34567891234567E01", "0.00000001234567891234567E-3",
    "1.2345678912345679e+13", "-1.2345678912345679e+13",
    "1.2345678912345679e-13", "+1.5", "01.5", ".5",
    "1.234567891234567E9999",
    # zero with non-zero exponent digits: descriptor cannot restore it
    # (see the is_zero note in get_float_encoding) -> raw fallback
    "0.000000E010",
]


def _roundtrip(raws: list[str]) -> list[str]:
    s = pd.Series(raws, dtype=object)
    fmts = encode_float_formats_batch(s)
    vals = np.array([float(r) for r in raws], dtype=np.float64)
    raw_np = np.array(
        [r if f < 0 else None for r, f in zip(raws, fmts)], dtype=object
    )
    return list(restore_floats_batch(vals, fmts, raw_np)), fmts


def test_valid_fixtures_get_descriptors_and_restore_byte_exact():
    back, fmts = _roundtrip(VALID)
    assert (fmts >= 0).all(), [r for r, f in zip(VALID, fmts) if f < 0]
    assert back == VALID


def test_invalid_fixtures_fall_back_and_still_roundtrip():
    back, fmts = _roundtrip(INVALID)
    assert (fmts < 0).all(), [r for r, f in zip(INVALID, fmts) if f >= 0]
    assert back == INVALID


def test_mixed_batch_roundtrips():
    mixed = VALID + INVALID + VALID[::2]
    back, _ = _roundtrip(mixed)
    assert back == mixed


def test_descriptor_layout_matches_reference_bits():
    # "1.234567891234567E+0009": uppercase E (0b11<<14), plus sign
    # (0b01<<12), 4 exponent digits (3<<10), 16 significant digits (15<<5)
    fmt = get_float_encoding("1.234567891234567E+0009")
    assert fmt == (0b11 << 14) | (0b01 << 12) | (3 << 10) | (15 << 5)
    assert restore_encoded_float(1.234567891234567e9, fmt) == "1.234567891234567E+0009"


def test_negative_zero_distinct_from_zero():
    back, fmts = _roundtrip(["0.00", "-0.00", "0.000E0", "-0.000E0"])
    assert (fmts >= 0).all()
    assert back == ["0.00", "-0.00", "0.000E0", "-0.000E0"]


@settings(max_examples=300, deadline=None)
@given(
    st.floats(allow_nan=False, allow_infinity=False),
    st.sampled_from(["{:.6e}", "{:.0e}", "{:.16e}", "{:.3f}", "{:.10f}", "{!r}"]),
)
def test_any_rendering_roundtrips(value, pattern):
    """Property: WHATEVER the source text looks like, the (descriptor |
    raw-fallback) pair restores it byte-exactly — the invariant the
    reference enforces with ingest-time round_trip_is_identical."""
    raw = pattern.format(value)
    if "e" not in raw and "E" not in raw and "." not in raw:
        return  # integer rendering: not a float leaf
    back, _ = _roundtrip([raw])
    assert back == [raw]
