"""Schema system: declared-schema mapping, value-based inference, and the
evolution diff (SURVEY.md §1.3).

Reference parity:
1. Declared Connect schema → table type
   (SchemaUtils.SchemaGenerator.toIcebergType, SchemaUtils.java:217-289):
   INT8/16/32 → int (or date/time by logical name), INT64 → long (or
   timestamp by logical name), BYTES → binary (or decimal by logical name),
   ARRAY/MAP/STRUCT recursive, anything unknown → string.
2. Value-based inference for schemaless data (SchemaUtils.java:291-352):
   integral numbers widen to LONG, fractional to DOUBLE; Map → STRUCT of
   inferred entries; nulls/empties are skipped.
3. Evolution diff (SchemaUtils.java:75-83 + SchemaUpdate.java): missing
   columns → AddColumn, int→long / float→double → UpdateType(widen),
   required→optional → MakeOptional.
"""

from __future__ import annotations

import datetime
import decimal
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# 1. declared Connect-style schema → Spark type
# ---------------------------------------------------------------------------

# Kafka Connect logical type names (SchemaUtils.java:241-253)
_LOGICAL_DATE = "org.apache.kafka.connect.data.Date"
_LOGICAL_TIME = "org.apache.kafka.connect.data.Time"
_LOGICAL_TIMESTAMP = "org.apache.kafka.connect.data.Timestamp"
_LOGICAL_DECIMAL = "org.apache.kafka.connect.data.Decimal"


def connect_to_spark_type(
    type_name: str,
    logical_name: str | None = None,
    parameters: dict | None = None,
    element=None,
    fields=None,
    key=None,
    value=None,
) -> T.DataType:
    """Map a Connect schema node (type + logical name) to a Spark type.

    ``element``/``fields``/``key``/``value`` carry pre-converted child types
    for ARRAY/STRUCT/MAP.
    """
    t = type_name.upper()
    if t in ("INT8", "INT16"):
        return T.IntegerType()
    if t == "INT32":
        if logical_name == _LOGICAL_DATE:
            return T.DateType()
        if logical_name == _LOGICAL_TIME:
            return T.LongType()  # Iceberg time → long micros (§1.2 note)
        return T.IntegerType()
    if t == "INT64":
        if logical_name == _LOGICAL_TIMESTAMP:
            return T.TimestampType()
        return T.LongType()
    if t == "FLOAT32":
        return T.FloatType()
    if t == "FLOAT64":
        return T.DoubleType()
    if t == "BOOLEAN":
        return T.BooleanType()
    if t == "STRING":
        return T.StringType()
    if t == "BYTES":
        if logical_name == _LOGICAL_DECIMAL:
            scale = int((parameters or {}).get("scale", 0))
            return T.DecimalType(38, scale)  # SchemaUtils.java:231-236
        return T.BinaryType()
    if t == "ARRAY":
        return T.ArrayType(element or T.StringType())
    if t == "MAP":
        return T.MapType(key or T.StringType(), value or T.StringType())
    if t == "STRUCT":
        return T.StructType(fields or [])
    # unknown → string fallback (SchemaUtils.java:285-287)
    return T.StringType()


# ---------------------------------------------------------------------------
# 2. value-based inference
# ---------------------------------------------------------------------------


def infer_spark_type(value) -> T.DataType | None:
    """Infer a Spark type from a python value with the reference's widening
    defaults. Returns None for null/empty (inference skipped,
    SchemaUtils.java:299-304)."""
    if value is None:
        return None
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, decimal.Decimal):
        exp = -value.as_tuple().exponent
        return T.DecimalType(38, max(exp, 0))
    if isinstance(value, int):
        return T.LongType()  # integral → long (SchemaUtils.java:306-309)
    if isinstance(value, float):
        return T.DoubleType()  # fractional → double (SchemaUtils.java:310-313)
    if isinstance(value, datetime.datetime):
        return T.TimestampType()
    if isinstance(value, datetime.date):
        return T.DateType()
    if isinstance(value, datetime.time):
        return T.LongType()  # time → long micros
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    if isinstance(value, (list, tuple)):
        if not value:
            return None  # empty list skipped (SchemaUtils.java:322-328)
        el = infer_spark_type(value[0])
        return T.ArrayType(el) if el is not None else None
    if isinstance(value, dict):
        if not value:
            return None
        fields = []
        for k, v in value.items():
            ft = infer_spark_type(v)
            if ft is not None:  # null-valued entries skipped
                fields.append(T.StructField(str(k), ft, True))
        # Map → STRUCT of inferred entries (SchemaUtils.java:329-348)
        return T.StructType(fields) if fields else None
    return T.StringType()


# ---------------------------------------------------------------------------
# 3. evolution diff
# ---------------------------------------------------------------------------

_WIDENINGS = {("integer", "long"), ("float", "double")}


@dataclass(frozen=True)
class SchemaUpdate:
    kind: str  # add_column | update_type | make_optional
    column: str
    data_type: T.DataType | None = None


def diff_schemas(current: T.StructType, incoming: T.StructType) -> list[SchemaUpdate]:
    """The reference's update accumulation (RecordConverter.java:166-229 +
    SchemaUpdate.java): additions, widenings, and required→optional."""
    updates: list[SchemaUpdate] = []
    by_name = {f.name: f for f in current.fields}
    for f in incoming.fields:
        cur = by_name.get(f.name)
        if cur is None:
            updates.append(SchemaUpdate("add_column", f.name, f.dataType))
        else:
            pair = (cur.dataType.typeName(), f.dataType.typeName())
            if pair in _WIDENINGS:
                updates.append(SchemaUpdate("update_type", f.name, f.dataType))
            if not cur.nullable and f.nullable:
                updates.append(SchemaUpdate("make_optional", f.name))
    return updates


def force_optional(schema: T.StructType) -> T.StructType:
    """Recursively mark every field nullable — the
    ``iceberg.tables.schema-force-optional`` behavior
    (SchemaUtils.java:260-280): a declared source schema's required flags
    are ignored when generating the table schema, so later sources missing
    a column never violate a required constraint."""

    def _opt(dt: T.DataType) -> T.DataType:
        if isinstance(dt, T.StructType):
            return T.StructType(
                [
                    T.StructField(f.name, _opt(f.dataType), True, f.metadata)
                    for f in dt.fields
                ]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(_opt(dt.elementType), True)
        if isinstance(dt, T.MapType):
            return T.MapType(_opt(dt.keyType), _opt(dt.valueType), True)
        return dt

    return _opt(schema)
