"""T14 legacy 1.4.x control-topic event decode: wire framing, generic
schema-driven avro, envelope normalization, Spark drain job."""

from __future__ import annotations

import io
import json
import struct
import uuid

import pytest

from iceberg_kafka_connect_spark.streaming.legacy_events import (
    COMMIT_READY_SCHEMA,
    COMMIT_REQUEST_SCHEMA,
    MAGIC,
    LegacyEventError,
    decode_datum,
    decode_events_df,
    decode_legacy_event,
    encode_datum,
    encode_legacy_event,
    event_schema,
)

EID = uuid.UUID("00112233-4455-6677-8899-aabbccddeeff")
CID = uuid.UUID("ffeeddcc-bbaa-9988-7766-554433221100")


def _commit_request_bytes(group="cg-connector") -> bytes:
    schema = event_schema(COMMIT_REQUEST_SCHEMA)
    return encode_legacy_event(
        schema,
        {
            "id": EID.bytes,
            "type": 0,
            "timestamp": 1700000000123,
            "payload": {"commitId": CID.bytes},
            "groupId": group,
        },
    )


def test_wire_framing_is_magic_then_writeutf_then_datum():
    raw = _commit_request_bytes()
    assert raw[:2] == MAGIC == b"\xc2\x01"
    (slen,) = struct.unpack("!H", raw[2:4])
    schema = json.loads(raw[4 : 4 + slen].decode())
    assert schema["name"].endswith(".Event")
    assert [f["name"] for f in schema["fields"]] == [
        "id", "type", "timestamp", "payload", "groupId",
    ]


def test_varint_zigzag_pinned_bytes():
    """Pin the avro binary primitives against hand-computed bytes so
    the codec is tested, not assumed: zigzag(-1)=1, zigzag(1)=2,
    varint(300) = 0xD8 0x04 for zigzag(300)=600."""
    buf = io.BytesIO()
    encode_datum(buf, {"type": "long"}, -1)
    encode_datum(buf, {"type": "long"}, 1)
    encode_datum(buf, {"type": "long"}, 300)
    encode_datum(buf, {"type": "string"}, "hi")
    assert buf.getvalue() == b"\x01\x02\xd8\x04\x04hi"
    r = io.BytesIO(buf.getvalue())
    assert decode_datum(r, "long") == -1
    assert decode_datum(r, "long") == 1
    assert decode_datum(r, "long") == 300
    assert decode_datum(r, "string") == "hi"


def test_commit_request_roundtrip():
    ev = decode_legacy_event(_commit_request_bytes())
    assert ev["id"] == str(EID)
    assert ev["type"] == "COMMIT_REQUEST"
    assert ev["timestamp_ms"] == 1700000000123
    assert ev["group_id"] == "cg-connector"
    assert ev["payload_type"] == "CommitRequestPayload"
    # the payload's commitId survives as raw fixed-16 bytes
    assert uuid.UUID(bytes=bytes(ev["payload"]["commitId"])) == CID


def test_commit_ready_with_value_first_unions():
    """TopicPartitionOffset's offset/timestamp are .nullable() unions —
    VALUE branch first (SchemaBuilder layout), unlike Spark-style
    null-first unions; both null and non-null decode correctly."""
    schema = event_schema(COMMIT_READY_SCHEMA)
    raw = encode_legacy_event(
        schema,
        {
            "id": EID.bytes,
            "type": 2,
            "timestamp": 5,
            "payload": {
                "commitId": CID.bytes,
                "assignments": [
                    {"topic": "t", "partition": 0,
                     "offset": 42, "timestamp": 99},
                    {"topic": "t", "partition": 1,
                     "offset": None, "timestamp": None},
                ],
            },
            "groupId": "cg",
        },
    )
    ev = decode_legacy_event(raw)
    assert ev["type"] == "COMMIT_READY"
    a = ev["payload"]["assignments"]
    assert (a[0]["offset"], a[0]["timestamp"]) == (42, 99)
    assert (a[1]["offset"], a[1]["timestamp"]) == (None, None)


def test_bad_magic_matches_reference_error():
    with pytest.raises(LegacyEventError, match="Unrecognized header"):
        decode_legacy_event(b"\x00\x01junk")


def test_trailing_bytes_rejected():
    raw = _commit_request_bytes() + b"\x00"
    with pytest.raises(LegacyEventError, match="trailing"):
        decode_legacy_event(raw)


def test_drain_dataframe_job(spark):
    """The Spark-side drain: binary values → normalized rows, bad
    records surfacing as DECODE_ERROR rows instead of failing."""
    rows = [
        (_commit_request_bytes("cg-a"),),
        (_commit_request_bytes("cg-b"),),
        (b"\xde\xad\xbe\xef",),
    ]
    df = spark.createDataFrame(rows, "value binary")
    out = decode_events_df(df).orderBy("group_id")
    got = out.collect()
    assert [r.type for r in got] == [
        "DECODE_ERROR", "COMMIT_REQUEST", "COMMIT_REQUEST",
    ]
    ok = [r for r in got if r.type == "COMMIT_REQUEST"]
    assert {r.group_id for r in ok} == {"cg-a", "cg-b"}
    assert all(r.payload_type == "CommitRequestPayload" for r in ok)
    assert json.loads(ok[0].payload_json)  # payload survives as JSON


def test_short_and_truncated_inputs_raise_contract_error():
    """Every malformed input raises LegacyEventError, never IndexError /
    struct.error — the documented contract for direct callers."""
    for bad in (b"", b"\xc2", b"\xc2\x01", b"\xc2\x01\x00",
                b"\xc2\x01\x00\x05abc", b"\xc2\x01\x00\x02[]"):
        with pytest.raises(LegacyEventError):
            decode_legacy_event(bad)
