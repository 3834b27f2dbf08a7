"""Property tests for the round-10 converter codecs.

Three independent implementations must agree everywhere, not just on
the unit-test shapes:
- the COMPILED avro decoder (sources/avro_fast) vs the generic
  schema-walking codec (streaming/legacy_events) over randomized
  schemas and values;
- the proto3 wire codec's encode→decode identity over randomized
  descriptors/values, plus unknown-field skipping;
- the compact-thrift footer walker's struct reader against a local
  compact-protocol WRITER (built here from the public spec, sharing no
  code with the reader).
"""

from __future__ import annotations

import io
import struct as _struct

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_kafka_connect_spark.sinks import parquet_footer as pf
from iceberg_kafka_connect_spark.sources.avro_fast import decoder_for
from iceberg_kafka_connect_spark.sources.confluent import (
    decode_proto_message,
    encode_proto_message,
)
from iceberg_kafka_connect_spark.streaming.legacy_events import (
    decode_datum,
    encode_datum,
)

# ------------------------------------------------- avro compiled == generic
_PRIMS = [
    ("long", st.integers(-(2**63), 2**63 - 1)),
    ("int", st.integers(-(2**31), 2**31 - 1)),
    ("string", st.text(max_size=30)),
    ("boolean", st.booleans()),
    (
        "double",
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    ("bytes", st.binary(max_size=20)),
]


@st.composite
def avro_record(draw):
    """(schema, value) for a flat-ish record: primitives, nullable
    unions, arrays and maps of primitives."""
    n = draw(st.integers(1, 5))
    fields, value = [], {}
    for i in range(n):
        kind = draw(st.integers(0, 3))
        name = f"f{i}"
        pt, strat = draw(st.sampled_from(_PRIMS))
        if kind == 0:  # plain primitive
            fields.append({"name": name, "type": pt})
            value[name] = draw(strat)
        elif kind == 1:  # nullable union
            fields.append({"name": name, "type": ["null", pt]})
            value[name] = draw(st.one_of(st.none(), strat))
        elif kind == 2:  # array
            fields.append(
                {"name": name, "type": {"type": "array", "items": pt}}
            )
            value[name] = draw(st.lists(strat, max_size=4))
        else:  # map
            fields.append(
                {"name": name, "type": {"type": "map", "values": pt}}
            )
            value[name] = draw(
                st.dictionaries(
                    st.text(max_size=8), strat, max_size=3
                )
            )
    return {"type": "record", "name": "r", "fields": fields}, value


@settings(max_examples=120, deadline=None)
@given(avro_record())
def test_compiled_avro_decoder_equals_generic(sv):
    schema, value = sv
    buf = io.BytesIO()
    encode_datum(buf, schema, value)
    payload = buf.getvalue()
    generic = decode_datum(io.BytesIO(payload), schema)
    compiled = decoder_for(schema)(payload)
    assert compiled == generic == value


# ----------------------------------------------------------- proto3 wire
_PROTO_TYPES = [
    ("int64", st.integers(-(2**63), 2**63 - 1)),
    ("int32", st.integers(-(2**31), 2**31 - 1)),
    ("sint64", st.integers(-(2**63), 2**63 - 1)),
    ("bool", st.booleans()),
    (
        "double",
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    ("string", st.text(max_size=30)),
    ("bytes", st.binary(max_size=20)),
    ("fixed64", st.integers(0, 2**64 - 1)),
    ("sfixed32", st.integers(-(2**31), 2**31 - 1)),
]


@st.composite
def proto_message(draw):
    n = draw(st.integers(1, 6))
    fnos = draw(
        st.lists(
            st.integers(1, 300), min_size=n, max_size=n, unique=True
        )
    )
    desc, value = {}, {}
    for i, fno in enumerate(fnos):
        name = f"f{i}"
        which = draw(st.integers(0, 2))
        if which == 0:
            pt, strat = draw(st.sampled_from(_PROTO_TYPES))
            desc[fno] = (name, pt)
            value[name] = draw(strat)
        elif which == 1:
            et = draw(st.sampled_from(["int64", "sint64", "double"]))
            desc[fno] = (name, f"packed_{et}")
            strat = dict(_PROTO_TYPES)[et]
            value[name] = draw(st.lists(strat, max_size=5))
        else:
            sub_pt, sub_strat = draw(st.sampled_from(_PROTO_TYPES[:6]))
            desc[fno] = (name, "message", {1: ("x", sub_pt)})
            value[name] = {"x": draw(sub_strat)}
    return desc, value


@settings(max_examples=120, deadline=None)
@given(proto_message())
def test_proto_wire_roundtrip(dv):
    desc, value = dv
    data = encode_proto_message(desc, value)
    assert decode_proto_message(desc, data) == value


@settings(max_examples=60, deadline=None)
@given(proto_message())
def test_proto_unknown_fields_always_skip(dv):
    """Decoding with a reader that knows only a SUBSET of the fields
    never errors and returns exactly the known subset (+ defaults)."""
    desc, value = dv
    data = encode_proto_message(desc, value)
    keep = sorted(desc)[: max(1, len(desc) // 2)]
    reader = {k: desc[k] for k in keep}
    out = decode_proto_message(reader, data)
    for k in keep:
        assert out[reader[k][0]] == value[reader[k][0]]


# -------------------------------------- compact-thrift reader vs writer
def _w_uvarint(out: bytearray, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_zigzag(out: bytearray, v: int) -> None:
    _w_uvarint(out, (v << 1) ^ (v >> 63))


def _write_compact_struct(fields: dict) -> bytes:
    """Local compact-protocol writer (public spec; independent of the
    reader under test). fields: {fid: ('i64'|'bin'|'double'|'bool'|
    'list_i64'|'struct', value)}."""
    out = bytearray()
    last = 0
    for fid in sorted(fields):
        tag, v = fields[fid]
        if tag == "bool":
            ttype = 1 if v else 2
        else:
            ttype = {"i64": 6, "double": 7, "bin": 8, "list_i64": 9,
                     "struct": 12}[tag]
        delta = fid - last
        if 0 < delta <= 15:
            out.append((delta << 4) | ttype)
        else:
            out.append(ttype)
            _w_zigzag(out, fid)
        last = fid
        if tag == "i64":
            _w_zigzag(out, v)
        elif tag == "double":
            out.extend(_struct.pack("<d", v))
        elif tag == "bin":
            _w_uvarint(out, len(v))
            out.extend(v)
        elif tag == "list_i64":
            if len(v) < 15:
                out.append((len(v) << 4) | 6)
            else:
                out.append(0xF6)
                _w_uvarint(out, len(v))
            for e in v:
                _w_zigzag(out, e)
        elif tag == "struct":
            out.extend(_write_compact_struct(v))
        # bool: value carried in the type nibble
    out.append(0x00)
    return bytes(out)


@st.composite
def compact_struct(draw, depth=0):
    n = draw(st.integers(0, 5))
    fids = draw(
        st.lists(st.integers(1, 400), min_size=n, max_size=n,
                 unique=True)
    )
    fields = {}
    for fid in fids:
        choices = ["i64", "bin", "double", "bool", "list_i64"]
        if depth < 2:
            choices.append("struct")
        tag = draw(st.sampled_from(choices))
        if tag == "i64":
            fields[fid] = (tag, draw(st.integers(-(2**62), 2**62)))
        elif tag == "bin":
            fields[fid] = (tag, draw(st.binary(max_size=25)))
        elif tag == "double":
            fields[fid] = (tag, draw(st.floats(
                allow_nan=False, allow_infinity=False, width=64)))
        elif tag == "bool":
            fields[fid] = (tag, draw(st.booleans()))
        elif tag == "list_i64":
            fields[fid] = (tag, draw(st.lists(
                st.integers(-(2**40), 2**40), max_size=20)))
        else:
            fields[fid] = (tag, draw(compact_struct(depth=depth + 1)))
    return fields


def _expected(fields):
    out = {}
    for fid, (tag, v) in fields.items():
        if tag == "struct":
            out[fid] = _expected(v)
        elif tag == "bin":
            out[fid] = bytes(v)
        elif tag == "list_i64":
            out[fid] = list(v)
        else:
            out[fid] = v
    return out


@settings(max_examples=120, deadline=None)
@given(compact_struct())
def test_footer_struct_reader_matches_independent_writer(fields):
    blob = _write_compact_struct(fields)
    got = pf._read_struct(io.BytesIO(blob))
    assert got == _expected(fields)
