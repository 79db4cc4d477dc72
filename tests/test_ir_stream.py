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


def test_clp_ir_wire_format_roundtrip():
    """Real CLP IR (eight-byte encoding, protocol_constants.hpp): write ->
    read -> decode equals the original messages; four-byte streams are
    rejected explicitly."""
    import pytest as _pytest

    from clp_spark.functions.tokenizer import decode_text, encode_text
    from clp_spark.sources.ir_stream import (
        IR_MAGIC_4,
        read_ir_stream,
        write_ir_stream,
    )

    msgs = [
        "used 123 of 45.6 GB in 7.8 seconds conv-9",
        "hello world no vars at all",
        "x=abc 0xFF end " + "y" * 300,  # >255-byte dict var -> u16 length tag
    ]
    events = []
    for i, m in enumerate(msgs):
        lt, vt, dv, en = encode_text(m)
        events.append(
            (1700000000000 + i, lt, list(vt), list(dv),
             [e if e is not None else 0 for e in en])
        )
    buf = write_ir_stream(events)
    meta, back = read_ir_stream(buf)
    assert meta["VERSION"] == "0.0.2"
    assert [decode_text(lt, dv, en) for _, lt, _, dv, en, _ in back] == msgs
    with _pytest.raises(NotImplementedError):
        read_ir_stream(IR_MAGIC_4 + b"\x00")


def test_clp_ir_reference_layout_vector():
    """A stream hand-assembled byte-for-byte per the reference protocol
    (magic, JSON metadata TLV, 0x19 big-endian var, 0x21 logtype, 0x30
    timestamp, 0x00 EOF) must parse."""
    import json
    import struct

    from clp_spark.functions.tokenizer import decode_text
    from clp_spark.sources.ir_stream import read_ir_stream

    meta_b = json.dumps({"VERSION": "0.0.2"}).encode()
    lt = b"job \x11 done"
    vec = (
        b"\xfd\x2f\xb5\x30"
        + bytes([0x01, 0x11, len(meta_b)]) + meta_b
        + b"\x19" + struct.pack(">q", 42)
        + bytes([0x21, len(lt)]) + lt
        + b"\x30" + struct.pack(">q", 1690000000123)
        + b"\x00"
    )
    _, events = read_ir_stream(vec)
    ts, logtype, vt, dv, en, sl = events[0]
    assert ts == 1690000000123
    assert decode_text(logtype, dv, en) == "job 42 done"


def test_clp_ir_spark_scan(spark):
    """read_clp_ir: binary IR streams -> typed rows, distributed."""
    from clp_spark.functions.tokenizer import encode_text
    from clp_spark.sources.ir_stream import read_clp_ir, write_ir_stream

    def stream_for(msgs, base_ts):
        events = []
        for i, m in enumerate(msgs):
            lt, vt, dv, en = encode_text(m)
            events.append(
                (base_ts + i, lt, list(vt), list(dv),
                 [e if e is not None else 0 for e in en])
            )
        return write_ir_stream(events)

    rows = [
        (0, stream_for(["alpha 1 beta", "gamma delta"], 1000)),
        (1, stream_for(["epsilon 2.5 zeta"], 2000)),
    ]
    df = spark.createDataFrame(rows, "stream_idx long, payload binary")
    got = read_clp_ir(df).collect()
    assert len(got) == 3
    by_key = {(r["stream_idx"], r["event_idx"]): r for r in got}
    assert by_key[(0, 1)]["logtype"] == "gamma delta"
    assert by_key[(1, 0)]["ts_ms"] == 2000
