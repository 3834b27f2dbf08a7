"""Avro Object Container File IO, self-contained and Spark-distributed.

S6 parity: the reference writes parquet / orc / avro data files according to
the ``write.format.default`` table property (data/Utilities.java:160-167).
This container ships no spark-avro connector jar and no Python avro package,
so this module implements the public Avro 1.11 spec directly:

- binary encoding: zigzag-varint ints/longs, little-endian IEEE floats,
  length-prefixed bytes/strings, index-prefixed unions, block-encoded
  arrays/maps, record fields in declaration order;
- Object Container File: ``Obj\\x01`` magic, file-metadata map carrying
  ``avro.schema`` (JSON) and ``avro.codec`` (null), 16-byte sync marker,
  blocks of (count, byte-size, records, sync).

Logical types follow the Iceberg/Avro mapping the reference relies on:
date → int/date, timestamp → long/timestamp-micros, decimal(p, s) →
bytes/decimal.

Scale shape: encoding and decoding run per-partition on executors
(``rdd.mapPartitionsWithIndex``) — the driver touches only file paths and
the embedded writer schema (a header read). This is the legitimate RDD use
case: per-partition imperative file IO for a format Spark's built-in readers
don't cover in this deployment. Files written here are standard Avro OCF,
readable by any external Avro tooling.
"""

from __future__ import annotations

import calendar
import datetime as dt
import io
import json
import os
import struct
import uuid
from decimal import Decimal

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_EPOCH = dt.date(1970, 1, 1)


# --------------------------------------------------------------- schema map
def spark_to_avro_schema(schema: T.StructType, name: str = "record") -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": _field_type(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


def _field_type(dtype: T.DataType, nullable: bool, name: str):
    t = _avro_type(dtype, name)
    return ["null", t] if nullable else t


def _avro_type(dtype: T.DataType, name: str):
    if isinstance(dtype, T.StringType):
        return "string"
    if isinstance(dtype, T.LongType):
        return "long"
    if isinstance(dtype, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.BinaryType):
        return "bytes"
    if isinstance(dtype, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        lt = (
            "local-timestamp-micros"
            if isinstance(dtype, T.TimestampNTZType)
            else "timestamp-micros"
        )
        return {"type": "long", "logicalType": lt}
    if isinstance(dtype, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dtype.precision,
            "scale": dtype.scale,
        }
    if isinstance(dtype, T.ArrayType):
        return {
            "type": "array",
            "items": _field_type(dtype.elementType, dtype.containsNull, name),
        }
    if isinstance(dtype, T.MapType):
        if not isinstance(dtype.keyType, T.StringType):
            raise ValueError("avro maps require string keys")
        return {
            "type": "map",
            "values": _field_type(dtype.valueType, dtype.valueContainsNull, name),
        }
    if isinstance(dtype, T.StructType):
        return spark_to_avro_schema(dtype, name=f"{name}_r{uuid.uuid4().hex[:6]}")
    raise ValueError(f"unsupported type for avro write: {dtype}")


def avro_to_spark_schema(avro: dict) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type(f["type"]), _is_nullable(f["type"]))
            for f in avro["fields"]
        ]
    )


def _is_nullable(t) -> bool:
    return isinstance(t, list) and "null" in t


def _strip_null(t):
    if isinstance(t, list):
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        return non_null[0]
    return t


def _spark_type(t) -> T.DataType:
    t = _strip_null(t)
    if isinstance(t, str):
        return {
            "string": T.StringType(),
            "long": T.LongType(),
            "int": T.IntegerType(),
            "double": T.DoubleType(),
            "float": T.FloatType(),
            "boolean": T.BooleanType(),
            "bytes": T.BinaryType(),
        }[t]
    lt = t.get("logicalType")
    if lt == "date":
        return T.DateType()
    if lt == "timestamp-micros":
        return T.TimestampType()
    if lt == "local-timestamp-micros":
        return T.TimestampNTZType()
    if lt == "decimal":
        return T.DecimalType(t["precision"], t["scale"])
    if t["type"] == "array":
        return T.ArrayType(_spark_type(t["items"]), _is_nullable(t["items"]))
    if t["type"] == "map":
        return T.MapType(
            T.StringType(), _spark_type(t["values"]), _is_nullable(t["values"])
        )
    if t["type"] == "record":
        return avro_to_spark_schema(t)
    raise ValueError(f"unsupported avro type: {t}")


# ----------------------------------------------------------------- encoding
def _enc_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _enc_bytes(buf: io.BytesIO, b: bytes) -> None:
    _enc_long(buf, len(b))
    buf.write(b)


def _encode(buf: io.BytesIO, dtype: T.DataType, nullable: bool, v) -> None:
    if nullable:
        if v is None:
            _enc_long(buf, 0)
            return
        _enc_long(buf, 1)
    elif v is None:
        raise ValueError("null in non-nullable avro field")
    if isinstance(dtype, T.StringType):
        _enc_bytes(buf, v.encode("utf-8"))
    elif isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        _enc_long(buf, int(v))
    elif isinstance(dtype, T.DoubleType):
        buf.write(struct.pack("<d", float(v)))
    elif isinstance(dtype, T.FloatType):
        buf.write(struct.pack("<f", float(v)))
    elif isinstance(dtype, T.BooleanType):
        buf.write(b"\x01" if v else b"\x00")
    elif isinstance(dtype, T.BinaryType):
        _enc_bytes(buf, bytes(v))
    elif isinstance(dtype, T.DateType):
        _enc_long(buf, (v - _EPOCH).days)
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # session timezone is pinned to UTC (session.tune_session); naive
        # datetimes from Spark are therefore UTC wall-clock
        micros = calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        _enc_long(buf, micros)
    elif isinstance(dtype, T.DecimalType):
        unscaled = int(v.scaleb(dtype.scale).to_integral_value())
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        _enc_bytes(buf, unscaled.to_bytes(nbytes, "big", signed=True))
    elif isinstance(dtype, T.ArrayType):
        if v:
            _enc_long(buf, len(v))
            for item in v:
                _encode(buf, dtype.elementType, dtype.containsNull, item)
        _enc_long(buf, 0)
    elif isinstance(dtype, T.MapType):
        if v:
            _enc_long(buf, len(v))
            for k, item in v.items():
                _enc_bytes(buf, k.encode("utf-8"))
                _encode(buf, dtype.valueType, dtype.valueContainsNull, item)
        _enc_long(buf, 0)
    elif isinstance(dtype, T.StructType):
        for f in dtype.fields:
            _encode(buf, f.dataType, f.nullable, v[f.name])
    else:
        raise ValueError(f"unsupported type for avro write: {dtype}")


# ----------------------------------------------------------------- decoding
class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def long(self) -> int:
        n, shift = 0, 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            n |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (n >> 1) ^ -(n & 1)  # un-zigzag

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())


def _decode(r: _Reader, dtype: T.DataType, nullable: bool):
    if nullable:
        if r.long() == 0:
            return None
    if isinstance(dtype, T.StringType):
        return r.bytes_().decode("utf-8")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return r.long()
    if isinstance(dtype, T.DoubleType):
        return struct.unpack("<d", r.raw(8))[0]
    if isinstance(dtype, T.FloatType):
        return struct.unpack("<f", r.raw(4))[0]
    if isinstance(dtype, T.BooleanType):
        return r.raw(1) == b"\x01"
    if isinstance(dtype, T.BinaryType):
        return bytearray(r.bytes_())
    if isinstance(dtype, T.DateType):
        return _EPOCH + dt.timedelta(days=r.long())
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        micros = r.long()
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
    if isinstance(dtype, T.DecimalType):
        unscaled = int.from_bytes(r.bytes_(), "big", signed=True)
        return Decimal(unscaled).scaleb(-dtype.scale)
    if isinstance(dtype, T.ArrayType):
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, dtype.elementType, dtype.containsNull))
    if isinstance(dtype, T.MapType):
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.bytes_().decode("utf-8")
                out[k] = _decode(r, dtype.valueType, dtype.valueContainsNull)
    if isinstance(dtype, T.StructType):
        return tuple(_decode(r, f.dataType, f.nullable) for f in dtype.fields)
    raise ValueError(f"unsupported avro type: {dtype}")


# -------------------------------------------------------------- file format
def _write_container(path: str, schema: T.StructType, rows) -> int:
    """Write one Avro OCF; returns the number of records written."""
    avro_schema = spark_to_avro_schema(schema)
    sync = os.urandom(SYNC_SIZE)
    body = io.BytesIO()
    count = 0
    for row in rows:
        _encode(body, schema, False, row.asDict(recursive=False) if isinstance(row, Row) else row)
        count += 1
    header = io.BytesIO()
    header.write(MAGIC)
    _enc_long(header, 2)
    _enc_bytes(header, b"avro.schema")
    _enc_bytes(header, json.dumps(avro_schema).encode("utf-8"))
    _enc_bytes(header, b"avro.codec")
    _enc_bytes(header, b"null")
    _enc_long(header, 0)
    header.write(sync)
    payload = body.getvalue()
    block = io.BytesIO()
    _enc_long(block, count)
    _enc_long(block, len(payload))
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(header.getvalue())
        if count:
            f.write(block.getvalue())
            f.write(payload)
            f.write(sync)
    os.rename(tmp, path)
    return count


def read_header_schema(path: str) -> T.StructType:
    with open(path, "rb") as f:
        data = f.read(1 << 20)  # header is tiny; schema JSON well under 1 MiB
    r = _Reader(data)
    if r.raw(4) != MAGIC:
        raise ValueError(f"not an avro container file: {path}")
    meta = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.bytes_().decode("utf-8")
            meta[k] = r.bytes_()
    return avro_to_spark_schema(json.loads(meta["avro.schema"]))


def _read_container(path: str, schema: T.StructType):
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    r.raw(4)
    while True:  # skip metadata map
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            r.bytes_()
            r.bytes_()
    r.raw(SYNC_SIZE)
    while r.pos < len(data):
        count = r.long()
        r.long()  # block byte size
        for _ in range(count):
            yield _decode(r, schema, False)
        r.raw(SYNC_SIZE)


# ------------------------------------------------------------- spark bridge
def write_avro_files(df: DataFrame, out_dir: str) -> list[str]:
    """Write each partition of ``df`` as one Avro OCF under ``out_dir``;
    executor-side, one pass. Returns the written file paths."""
    os.makedirs(out_dir, exist_ok=True)
    schema = df.schema

    def write_partition(idx: int, rows):
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return
        import itertools

        path = os.path.join(out_dir, f"part-{idx:05d}-{uuid.uuid4().hex}.avro")
        _write_container(path, schema, itertools.chain([first], it))
        yield path

    return sorted(df.rdd.mapPartitionsWithIndex(write_partition).collect())


def read_avro_files(
    spark: SparkSession, paths: list[str], schema: T.StructType | None = None
) -> DataFrame:
    """Distributed Avro OCF read: the driver reads ONE header for the writer
    schema; record decoding fans out one task per file."""
    if schema is None:
        schema = read_header_schema(paths[0])
    sc = spark.sparkContext
    rdd = sc.parallelize(paths, max(1, len(paths))).flatMap(
        lambda p: _read_container(p, schema)
    )
    return spark.createDataFrame(rdd, schema)
