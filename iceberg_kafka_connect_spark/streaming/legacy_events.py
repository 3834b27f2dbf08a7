"""Legacy 1.4.x control-topic event decode (T14) — upgrade-drain
analysis for the reference's ``kafka-connect-events`` envelope.

Reference: ``channel/EventDecoder.java:70-169`` (the 1.5.2 fallback that
decodes 1.4.x-serialized events left on a control topic during an
upgrade) + ``org/apache/iceberg/avro/DeprecatedAvroEncoderUtil.java``
(the wire framing) + ``events/Event.java`` / ``EventType.java`` /
``*Payload.java`` (the envelope layout).

The Spark design replaced the control topic (SURVEY §7: the micro-batch
barrier is the coordinator), so there is nothing live to decode INTO —
but an operator upgrading from the reference still holds a partially
drained control topic, and reading it is a one-shot batch job this
module provides:

Wire format (DeprecatedAvroEncoderUtil.encode):
    0xC2 0x01                          magic
    java DataOutputStream.writeUTF     2-byte BE length + the full Avro
                                       schema JSON (self-describing!)
    Avro binary datum of that schema

Because every message embeds its writer schema, decoding is a GENERIC
schema-driven Avro read — no per-payload classes needed; the five 1.4
payload types (COMMIT_REQUEST/RESPONSE/READY/TABLE/COMPLETE,
EventType.java:22-26) all decode through the same walk, envelope fields
normalized exactly as EventDecoder.convertLegacy does (id uuid, type
int → name, timestamp millis, groupId, payload record).

Spark-side: ``decode_events_df`` runs the pure-Python decoder inside
one Arrow-batched ``mapInPandas`` over the binary value column —
control-topic volume is per-commit (tiny), so a Python decode per event
is the right tool; the *data* path never goes through this module.
"""

from __future__ import annotations

import io
import json
import struct
import uuid as uuidlib
from typing import Any

from pyspark.sql import DataFrame

MAGIC = b"\xc2\x01"

EVENT_TYPE_NAMES = {
    0: "COMMIT_REQUEST",
    1: "COMMIT_RESPONSE",
    2: "COMMIT_READY",
    3: "COMMIT_TABLE",
    4: "COMMIT_COMPLETE",
}


class LegacyEventError(ValueError):
    pass


# ------------------------------------------------------- generic avro codec
# zigzag varints, shared layout with sinks/avro_io's _Reader but driven
# by the PARSED AVRO SCHEMA (records/unions/fixed/enums in writer's
# declared order), not a Spark schema — the embedded writer schema is
# the source of truth.
def _zz_read(buf: io.BytesIO) -> int:
    n, shift = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise LegacyEventError("truncated avro varint")
        n |= (b[0] & 0x7F) << shift
        if not (b[0] & 0x80):
            break
        shift += 7
    return (n >> 1) ^ -(n & 1)


def _zz_write(buf: io.BytesIO, v: int) -> None:
    n = (v << 1) ^ (v >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _named(schema: Any) -> str:
    return schema["type"] if isinstance(schema, dict) else schema


def decode_datum(buf: io.BytesIO, schema: Any) -> Any:
    t = _named(schema)
    if isinstance(schema, list):  # union: branch index then branch value
        idx = _zz_read(buf)
        if not 0 <= idx < len(schema):
            raise LegacyEventError(f"bad union branch {idx}")
        return decode_datum(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _zz_read(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t in ("bytes", "string"):
        raw = buf.read(_zz_read(buf))
        return raw.decode() if t == "string" else raw
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_zz_read(buf)]
    if t == "record":
        return {
            f["name"]: decode_datum(buf, f["type"])
            for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _zz_read(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                _zz_read(buf)
            out.extend(
                decode_datum(buf, schema["items"]) for _ in range(n)
            )
    if t == "map":
        out = {}
        while True:
            n = _zz_read(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _zz_read(buf)
            for _ in range(n):
                klen = _zz_read(buf)
                k = buf.read(klen).decode()
                out[k] = decode_datum(buf, schema["values"])
    raise LegacyEventError(f"unsupported avro type {t!r}")


def encode_datum(buf: io.BytesIO, schema: Any, v: Any) -> None:
    """Writer twin (tests + fixture generation)."""
    t = _named(schema)
    if isinstance(schema, list):
        # pick the first branch matching None-ness (the 1.4 layouts only
        # union a type with null)
        for i, br in enumerate(schema):
            if (v is None) == (_named(br) == "null"):
                _zz_write(buf, i)
                return encode_datum(buf, br, v)
        raise LegacyEventError("no union branch for value")
    if t == "null":
        return None
    if t == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        _zz_write(buf, v)
    elif t == "float":
        buf.write(struct.pack("<f", v))
    elif t == "double":
        buf.write(struct.pack("<d", v))
    elif t in ("bytes", "string"):
        raw = v.encode() if t == "string" else bytes(v)
        _zz_write(buf, len(raw))
        buf.write(raw)
    elif t == "fixed":
        assert len(v) == schema["size"]
        buf.write(bytes(v))
    elif t == "enum":
        _zz_write(buf, schema["symbols"].index(v))
    elif t == "record":
        for f in schema["fields"]:
            encode_datum(buf, f["type"], v[f["name"]])
    elif t == "array":
        if v:
            _zz_write(buf, len(v))
            for e in v:
                encode_datum(buf, schema["items"], e)
        _zz_write(buf, 0)
    elif t == "map":
        if v:
            _zz_write(buf, len(v))
            for k, val in v.items():
                encode_datum(buf, {"type": "string"}, k)
                encode_datum(buf, schema["values"], val)
        _zz_write(buf, 0)
    else:
        raise LegacyEventError(f"unsupported avro type {t!r}")


# ------------------------------------------------------------ 1.4 envelope
def decode_legacy_event(data: bytes) -> dict:
    """One 1.4.x control-topic message → normalized envelope dict —
    the python twin of EventDecoder.decode's legacy branch.

    Returns ``{id, type, timestamp_ms, group_id, payload_type,
    payload}`` with the payload as plain python (record → dict)."""
    if len(data) < 4:
        raise LegacyEventError(
            f"event too short ({len(data)} bytes) for magic + writeUTF "
            "header"
        )
    if data[:2] != MAGIC:
        raise LegacyEventError(
            f"Unrecognized header bytes: 0x{data[0]:02X} 0x{data[1]:02X}"
        )
    buf = io.BytesIO(data[2:])
    # java writeUTF: u16 big-endian byte length, then (modified) UTF-8 —
    # avro schema JSON is ASCII so the modified encoding is plain UTF-8
    (slen,) = struct.unpack("!H", buf.read(2))
    sjson = buf.read(slen)
    if len(sjson) != slen:
        raise LegacyEventError("truncated writeUTF schema header")
    try:
        schema = json.loads(sjson.decode())
    except (ValueError, UnicodeDecodeError) as e:
        raise LegacyEventError(f"embedded schema is not JSON: {e}") from None
    datum = decode_datum(buf, schema)
    if buf.read(1):
        raise LegacyEventError("trailing bytes after event datum")
    payload = datum.get("payload")
    ptype = None
    for f in schema.get("fields", []):
        if f["name"] == "payload":
            ptype = _named(f["type"]) if isinstance(f["type"], dict) else None
            if isinstance(f["type"], dict):
                ptype = f["type"].get("name", ptype)
    return {
        "id": str(uuidlib.UUID(bytes=bytes(datum["id"]))),
        "type": EVENT_TYPE_NAMES.get(datum["type"], str(datum["type"])),
        "timestamp_ms": datum["timestamp"],
        "group_id": datum["groupId"],
        "payload_type": (ptype or "").rpartition(".")[2],
        "payload": payload,
    }


def encode_legacy_event(schema: dict, datum: dict) -> bytes:
    """Wire-faithful encoder (DeprecatedAvroEncoderUtil.encode): magic,
    writeUTF schema JSON, avro binary datum. Test/fixture side."""
    out = io.BytesIO()
    out.write(MAGIC)
    sjson = json.dumps(schema).encode()
    out.write(struct.pack("!H", len(sjson)))
    out.write(sjson)
    encode_datum(out, schema, datum)
    return out.getvalue()


def decode_events_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Binary control-topic values → one normalized row per event:
    (id, type, timestamp_ms, group_id, payload_type, payload_json).
    Arrow-batched mapInPandas; undecodable rows surface as
    type='DECODE_ERROR' with the message in payload_json rather than
    failing the drain job."""
    out_schema = (
        "id string, type string, timestamp_ms long, group_id string, "
        "payload_type string, payload_json string"
    )

    def _decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw in pdf[value_col]:
                try:
                    ev = decode_legacy_event(bytes(raw))
                    rows.append(
                        (
                            ev["id"],
                            ev["type"],
                            ev["timestamp_ms"],
                            ev["group_id"],
                            ev["payload_type"],
                            json.dumps(ev["payload"], default=repr),
                        )
                    )
                except Exception as e:  # drain job: report, don't die
                    rows.append(
                        (None, "DECODE_ERROR", None, None, None, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id",
                    "type",
                    "timestamp_ms",
                    "group_id",
                    "payload_type",
                    "payload_json",
                ],
            )

    return df.select(value_col).mapInPandas(_decode_batches, out_schema)


# ------------------------------------------------- 1.4 schema layouts
# (events/Event.java:80-108, Element.java:35-37, *Payload.java — used
# by tests and fixture generation; decode NEVER needs these, the wire
# embeds the writer schema)
UUID_SCHEMA = {"type": "fixed", "name": "uuid", "size": 16,
               "logicalType": "uuid"}


def event_schema(payload_schema: dict) -> dict:
    return {
        "type": "record",
        "name": "io.tabular.iceberg.connect.events.Event",
        "fields": [
            {"name": "id", "type": UUID_SCHEMA},
            {"name": "type", "type": "int"},
            {"name": "timestamp", "type": "long"},
            {"name": "payload", "type": payload_schema},
            {"name": "groupId", "type": "string"},
        ],
    }


COMMIT_REQUEST_SCHEMA = {
    "type": "record",
    "name": "io.tabular.iceberg.connect.events.CommitRequestPayload",
    "fields": [{"name": "commitId", "type": UUID_SCHEMA}],
}

TPO_SCHEMA = {
    "type": "record",
    "name": "io.tabular.iceberg.connect.events.TopicPartitionOffset",
    "fields": [
        {"name": "topic", "type": "string"},
        {"name": "partition", "type": "int"},
        # SchemaBuilder .nullable() puts the VALUE branch first
        {"name": "offset", "type": ["long", "null"]},
        {"name": "timestamp", "type": ["long", "null"]},
    ],
}

COMMIT_READY_SCHEMA = {
    "type": "record",
    "name": "io.tabular.iceberg.connect.events.CommitReadyPayload",
    "fields": [
        {"name": "commitId", "type": UUID_SCHEMA},
        {"name": "assignments", "type": {"type": "array",
                                         "items": TPO_SCHEMA}},
    ],
}
