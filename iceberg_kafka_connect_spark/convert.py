"""Schema-directed record conversion (the reference's RecordConverter).

Reference parity: kafka-connect/src/main/java/io/tabular/iceberg/connect/data/
RecordConverter.java:89-300 — incoming rows are *coerced onto the target table
schema*: unknown fields are dropped, missing fields become NULL, and each
value is converted to the target column type with lenient parsing (numbers
from strings, timestamps from epoch-millis or ISO strings with space
separators, binary from base64, structs/maps/lists recursively, anything to
string via JSON).

Spark-first design: instead of a per-record Java loop, the conversion is a
*projection of Catalyst expressions* generated once per (input schema,
target schema) pair — fully JVM-side, no Python in the hot path, so it
vectorizes under whole-stage codegen and costs the same as a SELECT at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_stringy(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def coerce_expr(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    """Expression converting ``col`` of type ``src`` to type ``dst`` with the
    reference's lenient coercion matrix (RecordConverter.java:302-506)."""
    if src == dst:
        return col

    # ---- temporal targets: accept epoch numbers, ISO strings (lenient), native
    if isinstance(dst, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(src, (T.LongType, T.IntegerType, T.DoubleType)):
            # reference treats bare numbers as epoch-millis (RecordConverter.java:474-477)
            return F.timestamp_millis(col.cast("long"))
        if _is_stringy(src):
            # lenient ISO: allow 'T' or space separator (RecordConverter.java:497-506)
            normalized = F.replace(F.trim(col), F.lit("T"), F.lit(" "))
            return F.to_timestamp(normalized).cast(dst)
        return col.cast(dst)
    if isinstance(dst, T.DateType):
        if isinstance(src, (T.IntegerType, T.LongType)):
            # epoch-days (RecordConverter.java:409-411)
            return F.date_from_unix_date(col.cast("int"))
        return col.cast("date")

    # ---- binary target: base64 strings accepted (RecordConverter.java:396-405)
    if isinstance(dst, T.BinaryType):
        if _is_stringy(src):
            return F.unbase64(col)
        return col.cast("binary")

    # ---- string target: structured values serialized to JSON
    #      (RecordConverter.java:368-385)
    if isinstance(dst, T.StringType):
        if isinstance(src, (T.StructType, T.ArrayType, T.MapType)):
            return F.to_json(col)
        return col.cast("string")

    # ---- decimal: rescale half-up is Spark's cast default, matching the
    #      reference's HALF_UP (RecordConverter.java:338-357)
    if isinstance(dst, T.DecimalType):
        return col.cast(dst)

    # ---- nested types: recurse
    if isinstance(dst, T.ArrayType) and isinstance(src, T.ArrayType):
        return F.transform(
            col, lambda x: coerce_expr(x, src.elementType, dst.elementType)
        )
    if isinstance(dst, T.MapType) and isinstance(src, T.MapType):
        keyed = F.transform_keys(
            col, lambda k, _: coerce_expr(k, src.keyType, dst.keyType)
        )
        return F.transform_values(
            keyed, lambda _, v: coerce_expr(v, src.valueType, dst.valueType)
        )
    if isinstance(dst, T.StructType) and isinstance(src, T.StructType):
        return _coerce_struct(col, src, dst)

    # ---- everything else (numeric widening/narrowing, bool from string, ...)
    return col.cast(dst)


def _coerce_struct(col: Column, src: T.StructType, dst: T.StructType) -> Column:
    src_fields = {f.name: f for f in src.fields}
    parts = []
    for f in dst.fields:
        sf = src_fields.get(f.name)
        if sf is None:
            parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            parts.append(
                coerce_expr(col.getField(f.name), sf.dataType, f.dataType).alias(f.name)
            )
    struct = F.struct(*parts)
    # preserve NULL structs rather than materializing all-null children
    return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(struct)


def project_keys(df: DataFrame, key_paths: list[str]) -> DataFrame:
    """P4 — key projection (data/RecordProjection.java:46-164): project the
    full row onto its identifier-field subschema for equality deletes.
    Dotted paths traverse nested structs; the output column name is the leaf
    field name. Lists/maps are not projectable (same restriction as the
    reference)."""
    cols = []
    for path in key_paths:
        leaf = path.split(".")[-1]
        cols.append(F.col(path).alias(leaf))
    return df.select(*cols)


def project_to_schema(
    df: DataFrame,
    target: T.StructType,
    case_insensitive: bool = False,
    name_mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Project ``df`` onto ``target``: the Spark-native RecordConverter.

    - unknown input columns are dropped (RecordConverter.java:146-243)
    - missing target columns become typed NULLs
    - values are coerced per the matrix above
    - field resolution: exact name, then ``name_mapping`` aliases (the
      table's ``schema.name-mapping.default`` entries — value is one source
      name or a list of alternates, tried in order), then case-insensitive
      when enabled (RecordConverter.java:100-103,245-271)
    """
    src_by_name = {f.name: f for f in df.schema.fields}
    src_by_lower = {f.name.lower(): f for f in df.schema.fields}
    mapping = name_mapping or {}

    cols = []
    for f in target.fields:
        sf = src_by_name.get(f.name)
        if sf is None and f.name in mapping:
            alts = mapping[f.name]
            for alt in [alts] if isinstance(alts, str) else alts:
                sf = src_by_name.get(alt)
                if sf is not None:
                    break
        if sf is None and case_insensitive:
            sf = src_by_lower.get(f.name.lower())
        if sf is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(coerce_expr(F.col(sf.name), sf.dataType, f.dataType).alias(f.name))
    return df.select(*cols)
