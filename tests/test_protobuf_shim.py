"""Wire-format pins for the vendored minimal protobuf runtime.

The shim (``spark_iqmulus_spark/_vendor/google/protobuf``) backs PySpark's
transformWithStateInPandas state protocol when no real protobuf install
exists.  Its peer is protobuf-java inside the Spark JVM, so these tests pin
the *public wire format* (varint tags, length-delimited fields, packed
repeats, zigzag, oneof presence) — byte-level, independent of Spark.
"""

from __future__ import annotations

import pytest

from spark_iqmulus_spark.compat import ensure_protobuf

if not ensure_protobuf():  # pragma: no cover
    pytest.skip("protobuf unavailable even with shim", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


def test_scalar_wire_bytes_exact():
    # StateResponse{statusCode:1 errorMessage:"x" value:"ab"} — bytes fixed
    # by the protobuf encoding spec: tag 0x08 varint 1, tag 0x12 len 1 'x',
    # tag 0x1a len 2 'ab'
    r = sm.StateResponse(statusCode=1, errorMessage="x", value=b"ab")
    assert r.SerializeToString() == bytes(
        [0x08, 0x01, 0x12, 0x01]
    ) + b"x" + bytes([0x1A, 0x02]) + b"ab"


def test_default_values_skipped():
    # proto3 scalars at default value serialize to nothing
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""


def test_oneof_nested_and_empty_message_presence():
    req = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="totals", exists=sm.Exists())
        )
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.WhichOneof("method") == "stateVariableRequest"
    call = back.stateVariableRequest.valueStateCall
    assert call.stateName == "totals"
    # empty message set in a oneof must keep explicit presence (len-0 field)
    assert call.WhichOneof("method") == "exists"


def test_oneof_set_clears_siblings():
    call = sm.ValueStateCall(stateName="s", exists=sm.Exists())
    call.valueStateUpdate = sm.ValueStateUpdate(value=b"v")
    assert call.WhichOneof("method") == "valueStateUpdate"
    assert not call.HasField("exists")


def test_repeated_bytes_and_messages_roundtrip():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"bc"], requireNextFetch=True
    )
    r2 = sm.StateResponseWithListGet()
    r2.ParseFromString(resp.SerializeToString())
    assert list(r2.value) == [b"a", b"bc"]
    assert r2.requireNextFetch is True

    kv = sm.KeyAndValuePair(key=b"k", value=b"v")
    it = sm.StateResponseWithMapIterator(statusCode=0, kvPair=[kv, kv])
    r3 = sm.StateResponseWithMapIterator()
    r3.ParseFromString(it.SerializeToString())
    assert len(r3.kvPair) == 2 and r3.kvPair[1].value == b"v"


def test_enum_constants_and_roundtrip():
    # proto3 top-level enum values live in the module namespace
    assert sm.PRE_INIT == 0 and sm.INITIALIZED == 2 and sm.CLOSED == 5
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == 2


def test_negative_int64_ten_byte_varint():
    t = sm.RegisterTimer(expiryTimestampMs=-5)
    data = t.SerializeToString()
    # two's-complement 64-bit varint: 10 bytes on the wire + 1 tag byte
    assert len(data) == 11
    rt = sm.RegisterTimer()
    rt.ParseFromString(data)
    assert rt.expiryTimestampMs == -5


def test_proto3_optional_presence():
    ti = sm.TimerInfo(timestampMs=123)
    assert not ti.HasField("key")
    ti2 = sm.TimerInfo(key=b"kk", timestampMs=1)
    r = sm.TimerInfo()
    r.ParseFromString(ti2.SerializeToString())
    assert r.HasField("key") and r.key == b"kk"


def test_unknown_fields_skipped():
    # a parser must skip unknown tags (forward compatibility): feed a
    # StateResponse the bytes of a TimerInfo (field 2 varint unknown there
    # only if numbers collide — craft explicit unknown tag 15 instead)
    payload = bytes([0x78, 0x2A]) + sm.StateResponse(statusCode=3).SerializeToString()
    r = sm.StateResponse()
    r.ParseFromString(payload)
    assert r.statusCode == 3


def test_shim_never_shadows_real_protobuf():
    import google.protobuf as gp

    from spark_iqmulus_spark import compat

    vendored = str(gp.__file__).startswith(compat._VENDOR_DIR)
    # if a real protobuf existed, ensure_protobuf must NOT have vendored
    if vendored:
        assert "shim" in gp.__version__
