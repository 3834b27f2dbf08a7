"""Mongo Debezium SMT (P9): normalize MongoDB change-stream envelopes.

Reference: transforms/MongoDebeziumTransform.java:84-189 +
io/debezium/connector/mongodb/transforms/MongoDataConverter.java (~870 LoC of
per-record BSON walking). Debezium's Mongo connector ships ``before``/
``after`` as *extended-JSON strings*, and partial updates arrive as
``updateDescription{updatedFields(json), removedFields(array)}`` plus the
``documentKey``.

Spark-first re-expression: the BSON walk becomes plan-time schema + one
vectorized from_json per column:
- create/read/full-update → row parsed from ``after``
- delete → row parsed from ``before`` (or just the key)
- partial update (no full document) → row reconstructed as
  before ⊕ updatedFields (before may be absent), removedFields → NULL, and
  the primary key bumped from documentKey when the merge left it unset —
  exactly the reference's updateDescription reconstruction
  (MongoDebeziumTransform.java:120-189)

The document schema is supplied (or inferred from a sample via
schema_of_json); extended-JSON wrappers like {"$numberLong": "5"} are
collapsed by :func:`normalize_extended_json` (the reference resolves them
through typed BSON parsing instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _op_col(op: Column) -> Column:
    return (
        F.when(op == "u", F.lit("U"))
        .when(op == "d", F.lit("D"))
        .otherwise(F.lit("I"))
    )


def mongo_debezium_transform(
    doc_schema: "T.StructType | None" = None,
    key_field: str = "_id",
    op_col: str = "op",
    before_col: str = "before",
    after_col: str = "after",
    update_desc_col: str = "updateDescription",
    document_key_col: str = "documentKey",
    ts_col: str = "ts_ms",
    strict: bool = False,
    shape=None,
):
    """Returns a transform producing one flat row per change event with a
    ``_cdc`` struct, from string-JSON envelope columns.

    ``strict=True`` mirrors the reference's malformed-record check
    (MongoDebeziumTransform.java:110-115): a non-tombstone envelope with
    none of before/after/updateDescription fails the job instead of being
    silently dropped.

    ``shape`` (a :class:`~.mongo_arrays.MongoShape`, e.g. from
    ``infer_mongo_shape(sample, array_encoding="document")``) replaces
    ``doc_schema``: documents then parse through the BSON-faithful
    variant path with the reference's ArrayEncoding semantics —
    homogeneous arrays or ``_i``-keyed document encoding
    (ArrayEncoding.java; MongoDataConverter.java:134-300)."""
    if (doc_schema is None) == (shape is None):
        raise ValueError("pass exactly one of doc_schema or shape")
    if shape is not None:
        doc_schema = shape.spark_type()

    def _parse(c) -> Column:
        if shape is not None:
            return shape.parse(F.col(c) if isinstance(c, str) else c)
        return F.from_json(F.col(c) if isinstance(c, str) else c, doc_schema)

    def _apply(df: DataFrame) -> DataFrame:
        op = F.col(op_col)
        after = _parse(after_col)
        before = _parse(before_col)
        if shape is not None:
            key_shape = type(shape)(
                "doc", fields={key_field: shape.fields[key_field]}
            )
            key = key_shape.parse(F.col(document_key_col))
        else:
            key = F.from_json(
                F.col(document_key_col),
                T.StructType(
                    [T.StructField(key_field, doc_schema[key_field].dataType)]
                ),
            )
        upd = F.col(update_desc_col)
        updated = _parse(upd.getField("updatedFields"))
        removed = upd.getField("removedFields")

        # partial-update reconstruction, exactly the reference's
        # buildAfterBsonFromPartials (MongoDebeziumTransform.java:163-189):
        # start from before (or an empty doc when capture.mode has no
        # pre-image), overlay updatedFields, drop removedFields, and bump
        # the primary key from documentKey when the merge left it unset.
        patched_fields = []
        for f in doc_schema.fields:
            dropped = removed.isNotNull() & F.array_contains(removed, f.name)
            merged = F.coalesce(
                updated.getField(f.name), before.getField(f.name)
            )
            if f.name == key_field:
                val = F.when(
                    dropped, key.getField(key_field)
                ).otherwise(F.coalesce(merged, key.getField(key_field)))
            else:
                val = F.when(
                    dropped, F.lit(None).cast(f.dataType)
                ).otherwise(merged)
            patched_fields.append(val.alias(f.name))
        patched = F.struct(*patched_fields)

        # key-only row (delete with no before document)
        key_row = F.struct(
            *[
                key.getField(f.name).alias(f.name)
                if f.name == key_field
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in doc_schema.fields
            ]
        )

        row = (
            F.when(op == "d", F.coalesce(before, key_row))
            .when((op == "u") & F.col(after_col).isNotNull(), after)
            .when((op == "u") & upd.isNotNull(), patched)
            .otherwise(after)
        )
        if strict:
            malformed = (
                F.col(after_col).isNull()
                & F.col(before_col).isNull()
                & upd.isNull()
            )
            # assert_true returns NULL when the predicate holds and raises
            # otherwise; gating on its (always-true) null-ness keeps row's
            # struct type while forcing per-row evaluation
            row = F.when(
                F.assert_true(
                    ~malformed,
                    F.concat(
                        F.lit("malformed mongo record key="),
                        F.col(document_key_col),
                    ),
                ).isNull(),
                row,
            )
        cdc = F.struct(
            _op_col(op).alias("op"),
            F.timestamp_millis(F.col(ts_col)).alias("ts"),
            key.getField(key_field).cast("string").alias("key"),
        ).alias("_cdc")
        passthrough = [
            c for c in ("topic", "partition", "offset", "timestamp") if c in df.columns
        ]
        out = df.select(row.alias("__row"), cdc, *passthrough)
        return out.filter(F.col("__row").isNotNull()).select(
            "__row.*", "_cdc", *passthrough
        )

    return _apply


def normalize_extended_json(col: Column) -> Column:
    """Collapse MongoDB extended-JSON scalar wrappers to plain JSON scalars
    so ``from_json`` with a typed document schema parses Debezium's Mongo
    payloads directly — the Spark-side stand-in for the reference's typed
    BSON walk (MongoDataConverter.java:57-300 resolves $numberLong/$date/
    $oid et al. through BsonDocument.parse):

    - ``{"$numberLong": "5"} / {"$numberInt": "5"}``  → ``5``
    - ``{"$numberDouble": "1.5"} / {"$numberDecimal": "1.5"}`` → ``1.5``
    - ``{"$date": 1393804800000}`` and
      ``{"$date": {"$numberLong": "1393804800000"}}`` → epoch-millis number
    - ``{"$oid": "<hex>"}`` → ``"<hex>"``

    Wrapper shapes are rigid (a one-key document), so a chain of vectorized
    JVM-side regexp_replace is exact on well-formed extended JSON; the one
    theoretical false positive is a *string field value* that itself
    contains an unescaped wrapper-shaped substring, which valid JSON string
    escaping precludes."""
    num = r'\{\s*"\$number(?:Long|Int)"\s*:\s*"(-?\d+)"\s*\}'
    dbl = r'\{\s*"\$number(?:Double|Decimal)"\s*:\s*"(-?[^"]+)"\s*\}'
    oid = r'\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]+")\s*\}'
    # BSON internal timestamp {"$timestamp": {"t": sec, "i": ord}} →
    # bare seconds (the reference converts TIMESTAMP via 1000L * t,
    # MongoDataConverter.java:120); binary v2 wrapper → its base64
    # string payload (decoded downstream by the typed shape)
    tsp = r'\{\s*"\$timestamp"\s*:\s*\{\s*"t"\s*:\s*(\d+)\s*,\s*"i"\s*:\s*\d+\s*\}\s*\}'
    binv2 = (
        r'\{\s*"\$binary"\s*:\s*\{\s*"base64"\s*:\s*("[A-Za-z0-9+/=]*")'
        r'\s*,\s*"subType"\s*:\s*"[0-9a-fA-F]*"\s*\}\s*\}'
    )
    out = F.regexp_replace(col, num, "$1")
    out = F.regexp_replace(out, dbl, "$1")
    # inner wrappers first ($date may nest $numberLong — handled by the
    # first pass), then bare numeric $date
    out = F.regexp_replace(out, r'\{\s*"\$date"\s*:\s*(-?\d+)\s*\}', "$1")
    out = F.regexp_replace(out, oid, "$1")
    out = F.regexp_replace(out, tsp, "$1")
    out = F.regexp_replace(out, binv2, "$1")
    return out
