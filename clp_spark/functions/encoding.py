"""CLP-style variable encoding: canonical int64, 16-digit custom float, dict fallback.

Semantics re-derived from the reference implementation (NOT ported code):
  - int canonical form / rejection rules:
    reference components/core/src/clp/EncodedVariableInterpreter.cpp:24-61
  - float bit format (1 sign, 1 unused, 54 digit bits, 4 bits num_digits-1,
    4 bits decimal-pos-from-right-1):
    reference components/core/src/clp/EncodedVariableInterpreter.cpp:63-142
  - float decode: reference EncodedVariableInterpreter.cpp:144-197
  - dispatch order int -> float -> dict:
    reference EncodedVariableInterpreter.hpp:637-653

Everything here is plain Python / numpy so it can run inside Arrow-batched
pandas UDFs without JVM round-trips.
"""

from __future__ import annotations

import re

INT64_MIN = -(2**63)
INT64_MAX = 2**63 - 1

# 54-bit mask for the digits field of the encoded float.
FLOAT_DIGITS_MASK = (1 << 54) - 1
MAX_FLOAT_DIGITS = 16

# Canonical integer: no leading zeros, no '+', '-0...' forbidden ("-" must be
# followed by 1-9). "0" alone is fine.
_CANONICAL_INT_RE = re.compile(r"-?(?:0|[1-9][0-9]*)\Z")
_NEG_LEADING_ZERO_RE = re.compile(r"-0")


def encode_int(value: str) -> int | None:
    """Return the int64 encoding of *value* if it is a representable integer
    in canonical form, else None.

    Rejects: empty, '+1', '007', '-0', '-012', ' 1', out-of-int64-range.
    """
    if not value:
        return None
    if not _CANONICAL_INT_RE.fullmatch(value):
        return None
    if value.startswith("-0"):
        return None
    try:
        result = int(value)
    except ValueError:
        return None
    if result < INT64_MIN or result > INT64_MAX:
        return None
    return result


def encode_float(value: str) -> int | None:
    """Return the custom 64-bit encoding of *value* if it is a representable
    float (<=16 digits, exactly one '.', '.' not last, >=1 digit), else None.

    Bit layout (MSB..LSB): 1 sign | 1 unused | 54 digits-as-int |
    4 (#digits-1) | 4 (decimal-pos-from-right-1).
    """
    if not value:
        return None
    pos = 0
    max_length = MAX_FLOAT_DIGITS + 1  # +1 for the decimal point
    is_negative = False
    if value[0] == "-":
        is_negative = True
        pos = 1
        max_length += 1
    if len(value) > max_length:
        return None

    num_digits = 0
    decimal_point_pos = None  # distance of '.' from the right end
    digits = 0
    n = len(value)
    for i in range(pos, n):
        c = value[i]
        if "0" <= c <= "9":
            digits = digits * 10 + (ord(c) - 48)
            num_digits += 1
        elif decimal_point_pos is None and c == ".":
            decimal_point_pos = n - 1 - i
        else:
            return None
    if decimal_point_pos is None or decimal_point_pos == 0 or num_digits == 0:
        return None

    encoded = 1 if is_negative else 0
    encoded <<= 55
    encoded |= digits & FLOAT_DIGITS_MASK
    encoded <<= 4
    encoded |= (num_digits - 1) & 0x0F
    encoded <<= 4
    encoded |= (decimal_point_pos - 1) & 0x0F
    # Interpret the u64 bit pattern as a signed int64 (Spark LongType).
    if encoded > INT64_MAX:
        encoded -= 1 << 64
    return encoded


def decode_float(encoded: int) -> str:
    """Exact inverse of :func:`encode_float` (byte-identical round trip)."""
    u = int(encoded) & 0xFFFFFFFFFFFFFFFF  # int() coerces numpy int64 from Arrow
    decimal_pos = (u & 0x0F) + 1
    u >>= 4
    num_digits = (u & 0x0F) + 1
    u >>= 4
    digits = u & FLOAT_DIGITS_MASK
    u >>= 55
    is_negative = u > 0

    # Reconstruct digit string, left-padded with zeros to num_digits.
    digit_str = str(digits).rjust(num_digits, "0")
    # Insert the decimal point `decimal_pos` characters from the right of the
    # final string (which has num_digits+1 chars before the sign).
    total = num_digits + 1
    dot_index = total - 1 - decimal_pos
    out = digit_str[:dot_index] + "." + digit_str[dot_index:]
    if is_negative:
        out = "-" + out
    return out


def decode_int(encoded: int) -> str:
    """Inverse of :func:`encode_int` (canonical form makes str() exact)."""
    return str(int(encoded))


# ---------------------------------------------------------------------------
# Four-byte (compact) variable encodings — the default encoding real CLP IR
# producers emit. Semantics re-derived (NOT ported) from the reference:
#   - int: canonical-form string that fits int32
#     (clp/ffi/encoding_methods.inc encode_integer_string)
#   - float, 32 bits MSB..LSB: 1 sign | 25 digits-as-int | 3 (#digits-1) |
#     3 (decimal-pos-from-right-1), <= 8 digits
#     (clp/ffi/encoding_methods.hpp:55-58, encoding_methods.inc
#     encode_float_properties four-byte branch)
#   - lossless promotion 4B -> 8B: re-pack the same properties
#     (clp/ffi/encoding_methods.cpp encode_four_byte_float_as_eight_byte /
#     encode_four_byte_integer_as_eight_byte)
# ---------------------------------------------------------------------------

INT32_MIN = -(2**31)
INT32_MAX = 2**31 - 1
FLOAT4_DIGITS_MASK = (1 << 25) - 1
MAX_FLOAT4_DIGITS = 8


def encode_int4(value: str) -> int | None:
    """Four-byte integer encoding: canonical form AND fits int32."""
    v = encode_int(value)
    if v is None or v < INT32_MIN or v > INT32_MAX:
        return None
    return v


def encode_float4(value: str) -> int | None:
    """Four-byte float encoding (signed int32 bit pattern), else None."""
    if not value:
        return None
    pos = 0
    max_length = MAX_FLOAT4_DIGITS + 1  # +1 for the decimal point
    is_negative = False
    if value[0] == "-":
        is_negative = True
        pos = 1
        max_length += 1
    if len(value) > max_length:
        return None

    num_digits = 0
    decimal_point_pos = None
    digits = 0
    n = len(value)
    for i in range(pos, n):
        c = value[i]
        if "0" <= c <= "9":
            digits = digits * 10 + (ord(c) - 48)
            num_digits += 1
        elif decimal_point_pos is None and c == ".":
            decimal_point_pos = n - 1 - i
        else:
            return None
    if decimal_point_pos is None or decimal_point_pos == 0 or num_digits == 0:
        return None
    if digits > FLOAT4_DIGITS_MASK:
        return None

    encoded = 1 if is_negative else 0
    encoded <<= 25
    encoded |= digits & FLOAT4_DIGITS_MASK
    encoded <<= 3
    encoded |= (num_digits - 1) & 0x07
    encoded <<= 3
    encoded |= (decimal_point_pos - 1) & 0x07
    if encoded > INT32_MAX:
        encoded -= 1 << 32
    return encoded


def four_byte_float_to_eight(encoded4: int) -> int:
    """Lossless promotion of a four-byte float encoding to the eight-byte
    encoding (signed int64), matching encode_four_byte_float_as_eight_byte."""
    u = int(encoded4) & 0xFFFFFFFF
    decimal_pos = (u & 0x07) + 1
    u >>= 3
    num_digits = (u & 0x07) + 1
    u >>= 3
    digits = u & FLOAT4_DIGITS_MASK
    u >>= 25
    is_negative = u > 0

    encoded = 1 if is_negative else 0
    encoded <<= 55
    encoded |= digits & FLOAT_DIGITS_MASK
    encoded <<= 4
    encoded |= (num_digits - 1) & 0x0F
    encoded <<= 4
    encoded |= (decimal_pos - 1) & 0x0F
    if encoded > INT64_MAX:
        encoded -= 1 << 64
    return encoded


def decode_float4(encoded4: int) -> str:
    """Exact inverse of :func:`encode_float4` (via the 8-byte decoder)."""
    return decode_float(four_byte_float_to_eight(encoded4))
