"""Wire-format tests for the vendored mini-protobuf runtime
(vendor/miniproto) — golden byte vectors hand-derived from the public
proto3 encoding spec, so correctness is pinned without the real
protobuf installed. The end-to-end proof is
test_streaming.py::test_tws_user_state_equals_batch, where the shim
talks to the JVM state server's real protobuf across a socket."""

import os
import sys

import pytest

VENDOR = os.path.abspath(
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "click_streaming_data_pipeline_spark",
        "vendor",
        "miniproto",
    )
)


@pytest.fixture(scope="module")
def sm():
    if VENDOR not in sys.path:
        sys.path.insert(0, VENDOR)
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        pytest.skip("no protobuf runtime at all")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as mod

    return mod


def test_varint_and_signed(sm):
    from click_streaming_data_pipeline_spark.vendor.miniproto.google.protobuf import (  # noqa: E501
        wire,
    )

    assert wire.encode_varint(0) == b"\x00"
    assert wire.encode_varint(1) == b"\x01"
    assert wire.encode_varint(300) == b"\xac\x02"  # spec's own example
    # negative int64: 10-byte two's-complement varint
    assert wire.encode_varint(-1) == b"\xff" * 9 + b"\x01"
    v, pos = wire.decode_varint(b"\xac\x02", 0)
    assert (v, pos) == (300, 2)
    assert wire.to_signed64(int.from_bytes(b"", "little") or (1 << 64) - 1) == -1
    assert wire.to_signed32((1 << 32) - 5) == -5


def test_golden_scalar_and_len_records(sm):
    # RegisterTimer{expiryTimestampMs: 150} -> field 1 varint:
    # tag 0x08, varint 150 = 0x96 0x01
    t = sm.RegisterTimer(expiryTimestampMs=150)
    assert t.SerializeToString() == b"\x08\x96\x01"
    # SetImplicitKey{key: "abc"} -> field 1 LEN: 0x0a 0x03 'abc'
    k = sm.SetImplicitKey(key=b"abc")
    assert k.SerializeToString() == b"\x0a\x03abc"
    # proto3 default scalars are skipped entirely
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    assert sm.RegisterTimer(expiryTimestampMs=0).SerializeToString() == b""


def test_golden_nested_and_field_order(sm):
    # StateCallCommand{stateName:"s", schema:"j"} serialized in
    # field-number order: f1 LEN "s", f2 LEN "j"
    c = sm.StateCallCommand(schema="j", stateName="s")
    assert c.SerializeToString() == b"\x0a\x01s\x12\x01j"
    # nested write attaches ttl (f4): 0x22 len  [0x08 varint]
    c.ttl.durationMs = 1
    assert c.SerializeToString() == b"\x0a\x01s\x12\x01j\x22\x02\x08\x01"


def test_parse_skips_unknown_fields(sm):
    # unknown varint f15 (0x78 0x07) + unknown LEN f14 (0x72 0x02 ..)
    # around a known statusCode f1
    blob = b"\x78\x07" + b"\x08\x05" + b"\x72\x02zz"
    r = sm.StateResponse()
    r.ParseFromString(blob)
    assert r.statusCode == 5
    assert r.errorMessage == "" and r.value == b""


def test_oneof_set_and_clear(sm):
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    assert call.WhichOneof("method") == "getValueState"
    call.deleteIfExists.stateName = "b"
    assert call.WhichOneof("method") == "deleteIfExists"
    rt = sm.StatefulProcessorCall()
    rt.ParseFromString(call.SerializeToString())
    assert rt.WhichOneof("method") == "deleteIfExists"
    assert rt.deleteIfExists.stateName == "b"


def test_oneof_read_is_side_effect_free(sm):
    """A pure READ of an unset oneof member must not clear the set
    sibling (real protobuf reads never mutate); a nested WRITE through
    the read instance attaches it and clears siblings, like the real
    attach-on-first-write runtime. Parse of an I64-typed record for a
    varint field is skipped as unknown, not a TypeError."""
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    # reads: defensive checks and logging must be harmless
    assert call.deleteIfExists.stateName == ""
    assert call.getListState.schema == ""
    assert call.WhichOneof("method") == "getValueState"
    assert call.getValueState.stateName == "a"
    # nested write through a freshly-read member attaches it
    call.timerStateCall.register.expiryTimestampMs = 9
    assert call.WhichOneof("method") == "timerStateCall"
    rt = sm.StatefulProcessorCall()
    rt.ParseFromString(call.SerializeToString())
    assert rt.timerStateCall.register.expiryTimestampMs == 9

    # wire-type mismatch: field 1 of StateResponse is int32 (varint);
    # an I64 record for it must be skipped, not crash
    r = sm.StateResponse()
    r.ParseFromString(b"\x09" + b"\x00" * 8 + b"\x08\x07")
    assert r.statusCode == 7


def test_repeated_bytes_and_messages_roundtrip(sm):
    put = sm.ListStatePut(value=[b"a", b"", b"ccc"], fetchWithArrow=True)
    rt = sm.ListStatePut()
    rt.ParseFromString(put.SerializeToString())
    assert list(rt.value) == [b"a", b"", b"ccc"]
    assert rt.fetchWithArrow is True

    resp = sm.StateResponseWithTimer(
        statusCode=0,
        timer=[
            sm.TimerInfo(key=b"k", timestampMs=7),
            sm.TimerInfo(timestampMs=-1),
        ],
        requireNextFetch=False,
    )
    rt2 = sm.StateResponseWithTimer()
    rt2.ParseFromString(resp.SerializeToString())
    got = [(t.key, t.timestampMs) for t in rt2.timer]
    assert got == [(b"k", 7), (b"", -1)]
    # proto3-optional presence: explicitly-set key survives, unset
    # key reports absent
    assert rt2.timer[0].HasField("key")
    assert not rt2.timer[1].HasField("key")


def test_enum_constants_and_serialization(sm):
    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    s = sm.SetHandleState(state=sm.INITIALIZED)
    assert s.SerializeToString() == b"\x08\x02"
    # enum default (PRE_INIT=0) skipped like any proto3 scalar
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""


def test_full_request_roundtrip(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "user_state"
    cmd.schema = '{"type":"struct","fields":[]}'
    call = sm.StatefulProcessorCall(getValueState=cmd)
    msg = sm.StateRequest(version=2, statefulProcessorCall=call)
    rt = sm.StateRequest()
    rt.ParseFromString(msg.SerializeToString())
    assert rt.version == 2
    got = rt.statefulProcessorCall.getValueState
    assert got.stateName == "user_state"
    assert got.schema == cmd.schema
