"""CLP-IR-style binary stream: serialize/deserialize encoded messages.

Reference: CLP's IR stream is a TLV binary format framing (timestamp,
logtype, variables) per message, used for real-time compression before
archives exist (reference components/core/src/clp/ffi/ir_stream/
protocol_constants.hpp:9-103, Deserializer.hpp; ingest path
clp_s/JsonParser.hpp:96 ingest_kvir). The framing details are CLP-internal;
what matters semantically is that the unit is (ts, logtype, typed vars) and
that dictionary-variable STRINGS travel inline (dictionaries are built at
ingest time, not by the producer).

This module defines our own deliberately simple frame (NOT a copy of the
reference format) with the same information content:

  frame := ts_ms:int64 | conv_len:u16 | conv_id:bytes | turn_idx:int32
         | logtype_len:u32 | logtype:bytes | n_vars:u16
         | var_types:u8[n_vars]
         | per var: int/float -> value:int64, dict -> len:u16 + bytes

Both directions are Arrow-batched (struct module over memoryviews inside
mapInPandas) — the "binary parsing in Arrow UDF" pattern from SURVEY.md
§2.1. A frame column round-trips: deserialize(serialize(parsed)) == parsed
on every field the frame carries.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.tokenizer import VT_DICT

IR_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("logtype", StringType()),
        StructField("var_types", ArrayType(IntegerType())),
        StructField("dict_vars", ArrayType(StringType())),
        StructField("encoded_nums", ArrayType(LongType())),
        StructField("dict_slots", ArrayType(IntegerType())),
    ]
)


def encode_frame(
    ts_ms: int, conv_id: str, turn_idx: int, logtype: str, var_types, dict_vars, encoded_vars
) -> bytes:
    """encoded_vars must be the NULL-FREE merged array (dict slots hold ids,
    ignored here) — a null-bearing int64 list would surface as float64 from
    Arrow and corrupt values above 2**53."""
    cb = conv_id.encode("utf-8")
    lb = logtype.encode("utf-8")
    out = [struct.pack("<qH", ts_ms, len(cb)), cb, struct.pack("<iI", turn_idx, len(lb)), lb]
    out.append(struct.pack("<H", len(var_types)))
    out.append(bytes(var_types))
    di = 0
    for t, n in zip(var_types, encoded_vars):
        if t == VT_DICT:
            vb = dict_vars[di].encode("utf-8")
            di += 1
            out.append(struct.pack("<H", len(vb)))
            out.append(vb)
        else:
            out.append(struct.pack("<q", int(n)))
    return b"".join(out)


def decode_frame(buf: bytes):
    ts_ms, clen = struct.unpack_from("<qH", buf, 0)
    off = 10
    conv_id = buf[off : off + clen].decode("utf-8")
    off += clen
    turn_idx, llen = struct.unpack_from("<iI", buf, off)
    off += 8
    logtype = buf[off : off + llen].decode("utf-8")
    off += llen
    (nv,) = struct.unpack_from("<H", buf, off)
    off += 2
    var_types = list(buf[off : off + nv])
    off += nv
    dict_vars, nums, slots = [], [], []
    for t in var_types:
        if t == VT_DICT:
            (ln,) = struct.unpack_from("<H", buf, off)
            off += 2
            slots.append(len(dict_vars))
            dict_vars.append(buf[off : off + ln].decode("utf-8"))
            nums.append(None)
            off += ln
        else:
            (v,) = struct.unpack_from("<q", buf, off)
            off += 8
            nums.append(v)
            slots.append(-1)
    return conv_id, turn_idx, ts_ms, logtype, var_types, dict_vars, nums, slots


def serialize_ir(parsed: DataFrame) -> DataFrame:
    """parsed (parse_encode output) -> (frame: binary), one frame per turn."""
    schema = StructType([StructField("frame", BinaryType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = [
                encode_frame(
                    int(ts.value // 10**6) if hasattr(ts, "value") else int(ts),
                    c, int(ti), lt, list(vt), list(dv), list(ev),
                )
                for ts, c, ti, lt, vt, dv, ev in zip(
                    pdf["ts"], pdf["conv_id"], pdf["turn_idx"], pdf["logtype"],
                    pdf["var_types"], pdf["dict_vars"], pdf["encoded_vars"],
                )
            ]
            yield pd.DataFrame({"frame": frames})

    cols = parsed.select(
        "ts", "conv_id", "turn_idx", "logtype", "var_types", "dict_vars", "encoded_vars"
    )
    return cols.mapInPandas(run, schema=schema)


def deserialize_ir(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """(frame: binary) -> typed message rows (the KV-IR scan analog)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_frame(bytes(b)) for b in pdf[frame_col]]
            yield pd.DataFrame(rows, columns=[f.name for f in IR_SCHEMA.fields])

    return frames.mapInPandas(run, schema=IR_SCHEMA)


# ---------------------------------------------------------------------------
# Real CLP IR stream interop (the wire format CLP producers emit).
#
# Format re-derived from the reference protocol constants + serializers
# (clp/ffi/ir_stream/protocol_constants.hpp:9-103, encoding_methods.cpp
# serialize_preamble/serialize_log_event, utils.hpp serialize_int —
# all integers BIG-endian):
#
#   magic (FD 2F B5 30 = eight-byte encoding | FD 2F B5 29 = four-byte)
#   0x01 (EncodingJson)  0x11+u8len | 0x12+u16len   <metadata JSON bytes>
#   per log event (eight-byte):
#     per variable, in MESSAGE ORDER:
#       dict var:    0x11+u8len | 0x12+u16len | 0x13+i32len, then bytes
#       encoded var: 0x19, int64 (the archive int/float encodings)
#     logtype:       0x21+u8len | 0x22+u16len | 0x23+i32len, then bytes
#     timestamp:     0x30, int64 epoch ms
#   0x00 (EOF)
#
# Both payload encodings are supported. The eight-byte payload reuses CLP's
# archive variable encodings and logtype escaping, which this engine already
# implements bit-exactly (functions/encoding.py, functions/tokenizer.py).
# The FOUR-byte (compact) encoding — the default real producers emit — adds:
#   * delta timestamps (0x31 i8 | 0x32 i16 | 0x33 i32 | 0x34 i64, relative
#     to the previous event; the first is relative to the metadata's
#     REFERENCE_TIMESTAMP) — reference encoding_methods.cpp
#     four_byte_encoding::serialize_timestamp;
#   * 0x18 + int32 encoded variables (int fits int32; float in the 32-bit
#     1|25|3|3 property format, functions/encoding.py encode_float4). A
#     value not representable in four bytes becomes a DICTIONARY variable —
#     so the SAME message can have a different logtype under each encoding
#     (encoding_methods.inc encode_message_generically). On read, four-byte
#     values promote losslessly to the eight-byte encodings
#     (encode_four_byte_{integer,float}_as_eight_byte), so everything
#     downstream of the scan is encoding-agnostic.
# ---------------------------------------------------------------------------

IR_MAGIC_8 = b"\xfd\x2f\xb5\x30"
IR_MAGIC_4 = b"\xfd\x2f\xb5\x29"

_PH_INT = "\x11"
_PH_DICT = "\x12"
_PH_FLOAT = "\x13"


def write_ir_stream(
    events,
    *,
    encoding: str = "eight",
    reference_timestamp: int = 0,
    timestamp_pattern: str = "%Y-%m-%dT%H:%M:%S.%3",
    timestamp_pattern_syntax: str = "",
    tz_id: str = "UTC",
) -> bytes:
    """Serialize events -> a CLP IR stream (eight- or four-byte encoding).

    events: iterable of (ts_ms, logtype, var_types, dict_vars, encoded_vars)
    — exactly the parse_encode output columns (eight-byte encodings).
    With encoding="four", each variable is re-dispatched under the compact
    rules (int32 / 8-digit float, else dictionary), the logtype placeholders
    are rewritten accordingly, and timestamps are emitted as deltas.
    """
    four = encoding == "four"
    out = [IR_MAGIC_4 if four else IR_MAGIC_8]
    meta = {
        "VERSION": "0.0.2",
        "VARIABLES_SCHEMA_ID": "",
        "VARIABLE_ENCODING_METHODS_ID": "",
        "TIMESTAMP_PATTERN": timestamp_pattern,
        "TIMESTAMP_PATTERN_SYNTAX": timestamp_pattern_syntax,
        "TZ_ID": tz_id,
    }
    if four:
        meta["REFERENCE_TIMESTAMP"] = str(int(reference_timestamp))
    mb = json.dumps(meta, sort_keys=True).encode("utf-8")
    if len(mb) <= 0xFF:
        out.append(bytes([0x01, 0x11, len(mb)]))
    else:
        out.append(bytes([0x01, 0x12]) + struct.pack(">H", len(mb)))
    out.append(mb)

    def put_str(tags: tuple[int, int, int], b: bytes):
        if len(b) <= 0xFF:
            out.append(bytes([tags[0], len(b)]))
        elif len(b) <= 0xFFFF:
            out.append(bytes([tags[1]]) + struct.pack(">H", len(b)))
        else:
            out.append(bytes([tags[2]]) + struct.pack(">i", len(b)))
        out.append(b)

    def put_ts_delta(delta: int):
        if -(2**7) <= delta <= 2**7 - 1:
            out.append(b"\x31" + struct.pack(">b", delta))
        elif -(2**15) <= delta <= 2**15 - 1:
            out.append(b"\x32" + struct.pack(">h", delta))
        elif -(2**31) <= delta <= 2**31 - 1:
            out.append(b"\x33" + struct.pack(">i", delta))
        else:
            out.append(b"\x34" + struct.pack(">q", delta))

    last_ts = int(reference_timestamp)
    for ts_ms, logtype, var_types, dict_vars, encoded_vars in events:
        if not four:
            di = 0
            for t, ev in zip(var_types, encoded_vars):
                if t == VT_DICT:
                    put_str((0x11, 0x12, 0x13), dict_vars[di].encode("utf-8"))
                    di += 1
                else:
                    out.append(b"\x19" + struct.pack(">q", int(ev)))
            put_str((0x21, 0x22, 0x23), logtype.encode("utf-8"))
            out.append(b"\x30" + struct.pack(">q", int(ts_ms)))
            continue

        # four-byte: re-dispatch each variable under the compact rules and
        # rebuild the logtype's placeholders to match
        from ..functions.encoding import (
            decode_float,
            encode_float4,
            encode_int4,
        )
        from ..functions.tokenizer import _escape_const, _template_parts

        segs, kinds = _template_parts(logtype)
        lt_parts = []
        di = 0
        for j, kind in enumerate(kinds):
            lt_parts.append(_escape_const(segs[j]))
            k = ord(kind)
            if k == VT_DICT:
                s = dict_vars[di]
                di += 1
            elif k == 0x11:
                s = str(int(encoded_vars[j]))
            else:
                s = decode_float(int(encoded_vars[j]))
            v4 = encode_float4(s)
            if v4 is not None:
                lt_parts.append(_PH_FLOAT)
                out.append(b"\x18" + struct.pack(">i", v4))
            else:
                v4 = encode_int4(s)
                if v4 is not None:
                    lt_parts.append(_PH_INT)
                    out.append(b"\x18" + struct.pack(">i", v4))
                else:
                    lt_parts.append(_PH_DICT)
                    put_str((0x11, 0x12, 0x13), s.encode("utf-8"))
        lt_parts.append(_escape_const(segs[-1]))
        put_str((0x21, 0x22, 0x23), "".join(lt_parts).encode("utf-8"))
        put_ts_delta(int(ts_ms) - last_ts)
        last_ts = int(ts_ms)
    out.append(b"\x00")
    return b"".join(out)


def read_ir_stream(buf: bytes):
    """Parse a CLP IR stream -> (metadata dict, [(ts_ms, logtype, var_types,
    dict_vars, encoded_nums, dict_slots), ...]).

    Accepts BOTH encodings. Four-byte streams (compact: 0x18 int32 vars,
    delta timestamps against the metadata REFERENCE_TIMESTAMP) are promoted
    to the eight-byte value encodings on read — int32 widens, floats re-pack
    their properties (functions/encoding.four_byte_float_to_eight) — so
    downstream consumers see one representation."""
    from ..functions.encoding import four_byte_float_to_eight
    from ..functions.tokenizer import _template_parts

    four = buf[:4] == IR_MAGIC_4
    if not four and buf[:4] != IR_MAGIC_8:
        raise ValueError("not a CLP IR stream (bad magic)")
    pos = 4
    if buf[pos] != 0x01:
        raise ValueError("expected JSON metadata tag")
    pos += 1
    tag = buf[pos]
    pos += 1
    if tag == 0x11:
        mlen = buf[pos]
        pos += 1
    elif tag == 0x12:
        (mlen,) = struct.unpack_from(">H", buf, pos)
        pos += 2
    else:
        raise ValueError(f"bad metadata length tag {tag:#x}")
    metadata = json.loads(buf[pos : pos + mlen].decode("utf-8"))
    pos += mlen
    last_ts = int(metadata.get("REFERENCE_TIMESTAMP", 0)) if four else 0

    _STR_LEN = {
        0x11: ("B", 1), 0x12: (">H", 2), 0x13: (">i", 4),
        0x21: ("B", 1), 0x22: (">H", 2), 0x23: (">i", 4),
    }
    _TS_DELTA = {0x31: (">b", 1), 0x32: (">h", 2), 0x33: (">i", 4), 0x34: (">q", 8)}

    events = []
    dict_vars: list[str] = []
    nums: list = []
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        if tag == 0x00:  # EOF
            break
        if tag in (0x11, 0x12, 0x13):  # dictionary variable
            fmtc, n = _STR_LEN[tag]
            ln = buf[pos] if n == 1 else struct.unpack_from(fmtc, buf, pos)[0]
            pos += n
            dict_vars.append(buf[pos : pos + ln].decode("utf-8"))
            nums.append(None)
            pos += ln
        elif tag == 0x19:  # eight-byte encoded variable
            (v,) = struct.unpack_from(">q", buf, pos)
            pos += 8
            nums.append(v)
        elif tag == 0x18:  # four-byte encoded variable (raw; kind known at logtype)
            (v,) = struct.unpack_from(">i", buf, pos)
            pos += 4
            nums.append(v)
        elif tag in (0x21, 0x22, 0x23):  # logtype -> finalize vars
            fmtc, n = _STR_LEN[tag]
            ln = buf[pos] if n == 1 else struct.unpack_from(fmtc, buf, pos)[0]
            pos += n
            logtype = buf[pos : pos + ln].decode("utf-8")
            pos += ln
            ts_tag = buf[pos]
            pos += 1
            if four:
                if ts_tag not in _TS_DELTA:
                    raise ValueError(
                        f"expected TimestampDelta after logtype, got {ts_tag:#x}"
                    )
                fmtd, nd = _TS_DELTA[ts_tag]
                (delta,) = struct.unpack_from(fmtd, buf, pos)
                pos += nd
                ts_ms = last_ts + delta
                last_ts = ts_ms
            else:
                if ts_tag != 0x30:
                    raise ValueError(
                        f"expected TimestampVal after logtype, got {ts_tag:#x}"
                    )
                (ts_ms,) = struct.unpack_from(">q", buf, pos)
                pos += 8
            # variable kinds come from the template's placeholders; nums
            # holds dict-vars as None in message order already
            kinds = [ord(k) for k in _template_parts(logtype)[1]]
            slots = []
            d = 0
            for i, k in enumerate(kinds):
                if k == VT_DICT:
                    slots.append(d)
                    d += 1
                else:
                    slots.append(-1)
                    if four:  # promote 4B value to the 8B encoding
                        v4 = nums[i]
                        nums[i] = (
                            int(v4) if k == 0x11 else four_byte_float_to_eight(v4)
                        )
            events.append((ts_ms, logtype, kinds, dict_vars, nums, slots))
            dict_vars, nums = [], []
        else:
            raise ValueError(f"unsupported IR tag {tag:#x} at {pos - 1}")
    return metadata, events


def read_clp_ir(frames: DataFrame, frame_col: str = "payload") -> DataFrame:
    """(payload: binary IR stream per row) -> typed message rows — the scan
    connector for existing CLP producers. Each stream decodes independently
    (one task per stream; streams are the reference's unit of parallelism
    too). Returns (stream_idx, event_idx, ts_ms, logtype, var_types,
    dict_vars, encoded_nums, dict_slots)."""
    from pyspark.sql.types import StructType as _S

    schema = _S(
        [
            StructField("stream_idx", LongType()),
            StructField("event_idx", IntegerType()),
        ]
        + [f for f in IR_SCHEMA.fields if f.name not in ("conv_id", "turn_idx")]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, b in zip(pdf["stream_idx"], pdf[frame_col]):
                _, events = read_ir_stream(bytes(b))
                for i, (ts, lt, vt, dv, en, sl) in enumerate(events):
                    rows.append((int(sid), i, ts, lt, vt, dv, en, sl))
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    src = frames
    if "stream_idx" not in src.columns:
        from pyspark.sql import functions as _F

        src = src.withColumn("stream_idx", _F.monotonically_increasing_id())
    return src.select("stream_idx", frame_col).mapInPandas(run, schema=schema)


_IDS_STRUCT = StructType(
    [
        StructField("logtype_id", LongType()),
        StructField("dict_var_ids", ArrayType(LongType())),
        StructField("encoded_vars", ArrayType(LongType())),
    ]
)


@F.pandas_udf(_IDS_STRUCT)
def _ids_udf(
    logtype: pd.Series, dict_vars: pd.Series, encoded_nums: pd.Series, dict_slots: pd.Series
) -> pd.DataFrame:
    from clp_spark.functions.hash64 import add_id_columns

    pdf = add_id_columns(
        pd.DataFrame(
            {
                "logtype": logtype,
                "dict_vars": dict_vars,
                "encoded_nums": encoded_nums,
                "dict_slots": dict_slots,
            }
        )
    )
    return pdf[["logtype_id", "dict_var_ids", "encoded_vars"]]


def ir_messages(ir_rows: DataFrame) -> DataFrame:
    """read_clp_ir rows -> parse_encode-shaped message rows.

    Content-hash ids come from the SAME hash as the batch parse path
    (functions/hash64.py), so IR-ingested messages join the same
    dictionaries and decode with the same machinery. conv_id is the stream
    id, turn_idx the in-stream event index (the reference's real-time IR
    ingest unit, clp_s/JsonParser.hpp:82-96); role/tool are absent in IR
    frames and surface as nulls."""
    return ir_rows.withColumn(
        "_ids", _ids_udf("logtype", "dict_vars", "encoded_nums", "dict_slots")
    ).select(
        F.col("stream_idx").cast("string").alias("conv_id"),
        F.col("event_idx").alias("turn_idx"),
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("tool"),
        "logtype",
        "var_types",
        "dict_vars",
        "_ids.logtype_id",
        "_ids.dict_var_ids",
        "_ids.encoded_vars",
    )
