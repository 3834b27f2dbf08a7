"""Property tests for the two round-10 wire codecs: the thrift
TBinaryProtocol (hive catalog) and the schema-driven avro binary codec
(legacy 1.4 event decode). Encode→decode must be the identity for every
well-formed value, not just the shapes the unit tests pin."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_kafka_connect_spark.sinks import thrift_proto as tp
from iceberg_kafka_connect_spark.streaming.legacy_events import (
    decode_datum,
    encode_datum,
)

# ------------------------------------------------------------------ thrift
I32 = st.integers(-(2**31), 2**31 - 1)
I64 = st.integers(-(2**63), 2**63 - 1)
SHORT_TEXT = st.text(max_size=40)


def thrift_value():
    """(tagged-encoder-input, expected-decoded-value) pairs."""
    scalar = st.one_of(
        st.tuples(st.just(tp.BOOL), st.booleans()),
        st.tuples(st.just(tp.I32), I32),
        st.tuples(st.just(tp.I64), I64),
        st.tuples(st.just(tp.DOUBLE), st.floats(allow_nan=False)),
        st.tuples(st.just(tp.STRING), SHORT_TEXT),
    )

    def extend(children):
        lists = st.tuples(st.just(tp.I64), st.lists(I64, max_size=5)).map(
            lambda t: ((tp.LIST, (t[0], t[1])), list(t[1]))
        )
        maps = st.dictionaries(SHORT_TEXT, SHORT_TEXT, max_size=4).map(
            lambda d: ((tp.MAP, (tp.STRING, tp.STRING, d)), dict(d))
        )
        structs = st.dictionaries(
            st.integers(1, 30), children, max_size=4
        ).map(
            lambda d: (
                (
                    tp.STRUCT,
                    {fid: enc for fid, (enc, _want) in d.items()},
                ),
                {fid: want for fid, (_enc, want) in d.items()},
            )
        )
        return st.one_of(lists, maps, structs)

    base = scalar.map(lambda t: ((t[0], t[1]), t[1]))
    return st.recursive(base, extend, max_leaves=8)


@settings(max_examples=120, deadline=None)
@given(thrift_value(), st.integers(0, 2**31 - 1))
def test_thrift_message_roundtrip(pair, seqid):
    (ttype, payload), want = pair
    msg = tp.encode_message(
        "m", tp.CALL, seqid, {1: (ttype, payload)}
    )
    name, mtype, got_seq, fields = tp.decode_message(io.BytesIO(msg))
    assert (name, mtype, got_seq) == ("m", tp.CALL, seqid)
    assert fields[1] == want


# -------------------------------------------------------------------- avro
def avro_schema_and_value():
    """(schema, value) pairs covering the legacy-event type lattice:
    primitives, value-first nullable unions, records, arrays, maps."""
    prim = st.one_of(
        st.tuples(st.just("long"), I64),
        st.tuples(st.just("int"), I32),
        st.tuples(st.just("boolean"), st.booleans()),
        st.tuples(st.just("double"), st.floats(allow_nan=False)),
        st.tuples(st.just("string"), SHORT_TEXT),
        st.tuples(
            st.just({"type": "fixed", "name": "f16", "size": 16}),
            st.binary(min_size=16, max_size=16),
        ),
        st.tuples(
            st.just(
                {"type": "enum", "name": "e", "symbols": ["A", "B", "C"]}
            ),
            st.sampled_from(["A", "B", "C"]),
        ),
    )

    def extend(children):
        nullable = children.flatmap(
            lambda sv: st.one_of(
                st.just(([sv[0], "null"], sv[1])),
                st.just(([sv[0], "null"], None)),
            )
        )
        arrays = children.flatmap(
            lambda sv: st.lists(st.just(sv[1]), max_size=4).map(
                lambda vs: ({"type": "array", "items": sv[0]}, vs)
            )
        )
        maps = children.flatmap(
            lambda sv: st.dictionaries(
                SHORT_TEXT, st.just(sv[1]), max_size=3
            ).map(lambda d: ({"type": "map", "values": sv[0]}, d))
        )

        def mk_record(fields):
            names = [f"f{i}" for i in range(len(fields))]
            return (
                {
                    "type": "record",
                    "name": "r",
                    "fields": [
                        {"name": n, "type": sv[0]}
                        for n, sv in zip(names, fields)
                    ],
                },
                {n: sv[1] for n, sv in zip(names, fields)},
            )

        records = st.lists(children, min_size=1, max_size=4).map(mk_record)
        return st.one_of(nullable, arrays, maps, records)

    return st.recursive(prim, extend, max_leaves=10)


@settings(max_examples=120, deadline=None)
@given(avro_schema_and_value())
def test_avro_datum_roundtrip(sv):
    schema, value = sv
    buf = io.BytesIO()
    encode_datum(buf, schema, value)
    buf.seek(0)
    got = decode_datum(buf, schema)
    assert got == value
    assert not buf.read(1)  # fully consumed, no trailing bytes
