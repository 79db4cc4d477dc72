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
