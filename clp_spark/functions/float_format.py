"""Float text-format preservation (clp_s FormattedFloat / DictionaryFloat).

JSON float leaves parse to doubles, which loses the SOURCE text format
(`1.000000E3`, `123.000`, `1e+0009`). The reference preserves it with a
16-bit format descriptor stored next to each double when the text is
representable (FormattedFloat, reference
clp_s/FloatFormatEncoding.{hpp,cpp}, clp_s/ColumnWriter.hpp:102-118,
clp_s/SchemaTree.hpp:44-45), and falls back to storing the exact original
string via the variable dictionary when it is not (DictionaryFloat,
clp_s/ColumnWriter.hpp:119-133) — e.g. more than 17 significant digits,
prefix zeros, exponents over 4 digits, a leading '+'.

This module is the engine-agnostic codec: `get_float_encoding` /
`restore_encoded_float` mirror the reference functions bit-for-bit on the
descriptor layout; the *_batch variants vectorize over DISTINCT inputs
(float texts repeat heavily in real logs — pd.factorize collapses the
per-value Python to once per unique). plans/semistructured.py wires them
into the archive as per-leaf sidecar columns, where parquet's own
dictionary encoding plays the role of the reference's variable dictionary
for the raw-string fallback.

Format descriptor layout (uint16, FloatFormatEncoding.hpp:19-39):
  bits 14-15  scientific notation: 00 none, 01 lowercase e, 11 uppercase E
  bits 12-13  exponent sign: 00 none, 01 '+', 10 '-'
  bits 10-11  number of exponent digits - 1 (1..4)
  bits  5-9   number of significant digits - 1 (1..17)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SCI_FLAG_POS = 14
SCI_LOWER = 0b01 << SCI_FLAG_POS
SCI_UPPER = 0b11 << SCI_FLAG_POS
SCI_MASK = 0b11 << SCI_FLAG_POS
EXP_SIGN_POS = 12
EXP_SIGN_NONE = 0b00 << EXP_SIGN_POS
EXP_SIGN_PLUS = 0b01 << EXP_SIGN_POS
EXP_SIGN_MINUS = 0b10 << EXP_SIGN_POS
EXP_SIGN_MASK = 0b11 << EXP_SIGN_POS
NUM_EXP_DIGITS_POS = 10
NUM_EXP_DIGITS_MASK = 0b11 << NUM_EXP_DIGITS_POS
NUM_SIG_DIGITS_POS = 5
NUM_SIG_DIGITS_MASK = 0b1_1111 << NUM_SIG_DIGITS_POS
MAX_SIG_DIGITS = 17


def get_float_encoding(s: str) -> int | None:
    """16-bit format descriptor for float text `s`, or None when the text
    is not representable (-> DictionaryFloat fallback). Mirrors reference
    get_float_encoding (clp_s/FloatFormatEncoding.cpp:137-262), with one
    deliberate divergence: the reference's `is_zero` check compares a char
    against an index ('0' == first_digit_pos, FloatFormatEncoding.cpp:166)
    and is therefore always false, so a zero value with non-zero exponent
    digits ("0.000000E010") gets a descriptor there and then restores as
    "0.000000E000" — not byte-exact. Here the zero check actually runs, so
    such texts take the raw fallback and round-trip exactly."""
    if not s:
        return None
    fmt = 0
    first = 1 if s[0] == "-" else 0
    if s[0] == "+" or len(s) <= first:
        return None
    dot = s.find(".")

    e_low, e_up = s.find("e"), s.find("E")
    exp_pos = min(x for x in (e_low, e_up, len(s)) if x != -1)
    if exp_pos < len(s):
        # scientific: exactly one digit before an optional dot
        if dot != -1 and dot != first + 1:
            return None
        is_zero = s[first] == "0"
        if is_zero and exp_pos != first + 1:
            if dot == -1:
                return None
            if any(c != "0" for c in s[dot + 1 : exp_pos]):
                return None
        # exponent must be followed by an (optionally signed) integer
        after = s[exp_pos + 1 :]
        if not (
            (after[:1].isdigit())
            or (after[:1] in "+-" and after[1:2].isdigit())
        ):
            return None
        fmt |= SCI_UPPER if s[exp_pos] == "E" else SCI_LOWER
        if after[0] == "+":
            fmt |= EXP_SIGN_PLUS
        elif after[0] == "-":
            fmt |= EXP_SIGN_MINUS
        num_exp_digits = len(after) - (0 if after[0].isdigit() else 1)
        if not 1 <= num_exp_digits <= 4:
            return None
        exp_digits = s[len(s) - num_exp_digits :]
        if not exp_digits.isdigit():  # e.g. a second sign or garbage
            return None
        if is_zero and any(c != "0" for c in exp_digits):
            return None
        fmt |= (num_exp_digits - 1) << NUM_EXP_DIGITS_POS
    else:
        exp_pos = len(s)

    # first significant (non-zero) digit position
    first_sig = first
    if s[first_sig] == "0":
        if first_sig + 1 < len(s) and s[first_sig + 1].isdigit():
            return None  # prefix zeros "0N.Y" unsupported
        if dot != -1:
            for i in range(dot + 1, exp_pos):
                if s[i] != "0":
                    first_sig = i
                    break
    num_sig = exp_pos - first_sig
    if dot != -1 and first_sig < dot:
        num_sig -= 1
    if not 1 <= num_sig <= MAX_SIG_DIGITS:
        return None
    fmt |= (num_sig - 1) << NUM_SIG_DIGITS_POS
    return fmt


def _scientific_to_decimal(sci: str) -> str:
    """Expand `d.ddddE±x` to plain decimal, preserving every significand
    digit (reference scientific_to_decimal)."""
    neg = not sci[0].isdigit()
    if neg:
        sci = sci[1:]
    exp_pos = max(sci.find("E"), sci.find("e"))
    mantissa, exponent = sci[:exp_pos], int(sci[exp_pos + 1 :])
    dot = mantissa.find(".")
    digits = mantissa.replace(".", "")
    decimal_pos = exponent + 1 if dot == -1 else dot + exponent
    if decimal_pos <= 0:
        out = "0." + "0" * -decimal_pos + digits
    elif decimal_pos < len(digits):
        out = digits[:decimal_pos] + "." + digits[decimal_pos:]
    else:
        out = digits + "0" * (decimal_pos - len(digits))
    return ("-" + out) if neg else out


def restore_encoded_float(value: float, fmt: int) -> str:
    """Re-render `value` exactly as its source text, given its descriptor
    (reference restore_encoded_float, FloatFormatEncoding.cpp:264-331)."""
    num_sig = ((fmt & NUM_SIG_DIGITS_MASK) >> NUM_SIG_DIGITS_POS) + 1
    sci = f"{value:.{num_sig - 1}e}"
    if not fmt & SCI_LOWER:  # no scientific notation in the source
        return _scientific_to_decimal(sci)

    if (fmt & SCI_MASK) == SCI_UPPER:
        sci = sci.upper()
    exp_pos = max(sci.find("E"), sci.find("e"))
    head, exp = sci[: exp_pos + 1], sci[exp_pos + 1 :]
    sign, digits = ("", exp) if exp[0].isdigit() else (exp[0], exp[1:])
    digits = digits.lstrip("0") or "0"
    sign_flag = fmt & EXP_SIGN_MASK
    if sign_flag == EXP_SIGN_NONE:
        # a sign-free source exponent is necessarily non-negative, so the
        # printed '+' is simply dropped (reference erases it unconditionally)
        out_sign = ""
    elif sign_flag == EXP_SIGN_PLUS:
        out_sign = "+"
    else:
        out_sign = "-"
    num_exp_digits = ((fmt & NUM_EXP_DIGITS_MASK) >> NUM_EXP_DIGITS_POS) + 1
    digits = digits.zfill(num_exp_digits) if len(digits) < num_exp_digits else digits
    return head + out_sign + digits


def _verified_encoding(raw: str) -> int:
    """Descriptor for `raw` ONLY if restore(double(raw), fmt) reproduces it
    byte-exactly, else -1 — the same ingest-time round-trip validation the
    reference applies (clp_s/JsonParser.cpp:256-270 round_trip_is_identical),
    which is what routes beyond-754-precision literals to DictionaryFloat."""
    fmt = get_float_encoding(raw)
    if fmt is None:
        return -1
    try:
        if restore_encoded_float(float(raw), fmt) != raw:
            return -1
    except (ValueError, OverflowError):
        return -1
    return fmt


def encode_float_formats_batch(texts: pd.Series) -> np.ndarray:
    """Vectorized-over-uniques verified descriptor extraction: int32 array,
    -1 for non-representable / non-round-tripping (DictionaryFloat
    fallback) and for nulls."""
    codes, uniques = pd.factorize(texts.to_numpy(dtype=object))
    fmt_u = np.fromiter(
        ((-1 if u is None else _verified_encoding(u)) for u in uniques),
        dtype=np.int32,
        count=len(uniques),
    )
    out = np.full(len(codes), -1, dtype=np.int32)
    mask = codes >= 0
    out[mask] = fmt_u[codes[mask]]
    return out


def restore_floats_batch(
    values: np.ndarray, fmts: np.ndarray, raws: np.ndarray
) -> np.ndarray:
    """Vectorized-over-uniques restore: fmts >= 0 re-render from (value,
    fmt); fmts < 0 take the raw sidecar verbatim. Returns object array of
    strings (None where value AND raw are both null)."""
    out = raws.astype(object).copy()
    idx = np.flatnonzero(fmts >= 0)
    if len(idx):
        # signbit joins the key AND re-applies the sign when rendering:
        # -0.0 == 0.0 under factorize/level hashing (the level itself stores
        # one of the two), but "-0.00" and "0.00" must render differently
        pairs = pd.MultiIndex.from_arrays(
            [values[idx], fmts[idx], np.signbit(values[idx])]
        )
        codes, uniques = pd.factorize(pairs)
        rendered = np.fromiter(
            (
                restore_encoded_float(
                    float(np.copysign(v, -1.0 if sb else 1.0)), int(f)
                )
                for v, f, sb in uniques
            ),
            dtype=object,
            count=len(uniques),
        )
        out[idx] = rendered[codes]
    return out
