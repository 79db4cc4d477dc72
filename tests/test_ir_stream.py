"""IR binary stream round trip."""

from __future__ import annotations

from clp_spark.functions.tokenizer import encode_text
from clp_spark.plans import pipeline as P
from clp_spark.sources.ir_stream import (
    decode_frame,
    deserialize_ir,
    encode_frame,
    serialize_ir,
)
from clp_spark.sources.transcripts import load_transcripts

SF_DIR = "/root/testdata/sf0.001"


def test_frame_roundtrip_unit():
    # includes a >2**53 float encoding (16-digit) to catch precision loss
    lt, vt, dv, en = encode_text("used 123 of 123.4567890123456 GB by user42")
    ev = [e if e is not None else -1 for e in en]  # merged array stand-in
    frame = encode_frame(1704067200123, "conv-000001", 7, lt, list(vt), list(dv), ev)
    c, ti, ts, lt2, vt2, dv2, en2, sl = decode_frame(frame)
    assert (c, ti, ts, lt2) == ("conv-000001", 7, 1704067200123, lt)
    assert vt2 == list(vt) and dv2 == list(dv)
    assert [e for e in en2 if e is not None] == [e for e in en if e is not None]
    assert any(e is not None and abs(e) > 2**53 for e in en)


def test_spark_roundtrip(spark):
    t = load_transcripts(spark, SF_DIR).limit(500)
    parsed = P.parse_encode(t)
    back = deserialize_ir(serialize_ir(parsed))
    a = {
        (r["conv_id"], r["turn_idx"]): (r["logtype"], tuple(r["var_types"]), tuple(r["dict_vars"]))
        for r in parsed.select("conv_id", "turn_idx", "logtype", "var_types", "dict_vars").collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): (r["logtype"], tuple(r["var_types"]), tuple(r["dict_vars"]))
        for r in back.collect()
    }
    assert a == b
    # ts survives with millisecond precision
    ts_a = {(r["conv_id"], r["turn_idx"]): r["ts_ms"] for r in back.collect()}
    from pyspark.sql import functions as F
    ts_b = {
        (r["conv_id"], r["turn_idx"]): r["ms"]
        for r in t.select("conv_id", "turn_idx", F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")).collect()
    }
    assert ts_a == ts_b
