"""Mongo ArrayEncoding modes (P9 completion): BSON-faithful schema
inference + typed parsing of Debezium-Mongo extended-JSON documents under
the two ``array.encoding`` options of the reference.

Reference: io/debezium/connector/mongodb/transforms/ArrayEncoding.java
(the two-value enum) + MongoDataConverter.java:33-501 — the per-record
BSON walk that builds a Kafka Connect schema (``addFieldSchema``/
``subSchema``/``testType``) and converts values (``convertFieldValue``):

- ``array`` mode: arrays stay arrays and MUST be homogeneous
  (``testType`` raises "not a homogenous array" otherwise); arrays of
  documents union the fields across all elements (``subSchema`` with the
  empty-document first pass), same-name fields must agree on BSON type
  except NULL which upgrades to the non-null type
  (``testArrayElementType``).
- ``document`` mode: an array ``[a, b]`` becomes a struct
  ``{_0: a, _1: b}`` (``arrayElementStructName``), each element with its
  own independent type — the escape hatch for mixed-type arrays.

Spark-first re-expression: Kafka Connect records carry a per-record
schema, Spark plans are fixed-schema — so the BSON walk runs ONCE over a
driver-side *sample* (pure Python, no Spark) and compiles to a
``MongoShape`` tree. The tree then emits (a) the Spark ``StructType`` and
(b) a fully JVM-side parse plan over the VARIANT type:
``parse_json(normalize_extended_json(col))`` + ``try_variant_get`` path
extraction — document-encoded arrays read ``$.field[i]`` into ``_i``
struct fields, homogeneous arrays extract whole (``array<...>`` target
types), and arrays of documents get the field-union semantics for free
(``try_variant_get`` yields NULL for a missing element field). No Python
UDFs anywhere in the value path.

BSON-type fidelity comes from walking the *extended* JSON (before
wrapper collapse): ``$numberInt``/``$numberLong``/``$numberDouble``/
``$numberDecimal``/``$oid``/``$date``/``$timestamp``/``$binary``/
``$undefined``/``$regularExpression`` map exactly as the reference's
BsonType switch does (MongoDataConverter.java:445-501): decimal128 and
object-id to string, ``$date`` to timestamp from epoch millis,
``$timestamp`` to timestamp from epoch seconds, ``$undefined`` dropped
from schema and value (the reference's silent ``default: return``),
regular expressions to ``struct<regex, options>``. Plain JSON ints land
int32 when they fit, else int64 — BsonDocument.parse's behavior.

Contract notes (documented deviations, all sample-time not record-time):
- heterogeneity errors raise at INFERENCE (driver, once) rather than per
  record — same message text as the reference so operators recognize it;
- ``$date`` is supported in its canonical numeric forms
  (``{"$date": 123}`` / ``{"$date": {"$numberLong": "123"}}``), not the
  relaxed ISO-string form (Debezium emits canonical).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1

# scalar kinds: (extraction DDL used inside array<...> targets,
#                final Spark type)
_SCALARS = {
    "string": ("string", T.StringType()),
    "int": ("int", T.IntegerType()),
    "bigint": ("bigint", T.LongType()),
    "double": ("double", T.DoubleType()),
    "boolean": ("boolean", T.BooleanType()),
    "epoch_millis": ("bigint", T.TimestampType()),
    "epoch_seconds": ("bigint", T.TimestampType()),
    "base64": ("string", T.BinaryType()),
}


class HeterogeneousArrayError(RuntimeError):
    """The reference's RuntimeException for mixed-type arrays in
    ``array`` mode (MongoDataConverter.java:448-462)."""


@dataclass
class MongoShape:
    """One node of the inferred document shape.

    kind: ``doc`` (object), ``array`` (homogeneous array, array mode),
    ``arrdoc`` (document-encoded array: struct of ``_i``), or a scalar
    kind from ``_SCALARS``.
    """

    kind: str
    fields: dict[str, "MongoShape"] = field(default_factory=dict)
    element: Optional["MongoShape"] = None

    # ---------------------------------------------------------- schema
    def spark_type(self) -> T.DataType:
        if self.kind in _SCALARS:
            return _SCALARS[self.kind][1]
        if self.kind in ("doc", "arrdoc"):
            return T.StructType(
                [
                    T.StructField(k, s.spark_type(), True)
                    for k, s in self.fields.items()
                ]
            )
        if self.kind == "array":
            return T.ArrayType(self.element.spark_type(), True)
        raise AssertionError(self.kind)

    # ------------------------------------------------------ extraction
    def _ext_ddl(self) -> str:
        """DDL of the RAW extraction type (timestamps as bigint, binary
        as base64 string) — the target passed to try_variant_get for
        whole-array pulls; ``_rebuild`` converts afterwards."""
        if self.kind in _SCALARS:
            return _SCALARS[self.kind][0]
        if self.kind == "doc":
            inner = ",".join(
                f"`{k}`:{s._ext_ddl()}" for k, s in self.fields.items()
            )
            return f"struct<{inner}>"
        if self.kind == "array":
            return f"array<{self.element._ext_ddl()}>"
        # arrdoc never occurs under an array: document mode encodes
        # EVERY array as arrdoc, so no ``array`` nodes exist there
        raise AssertionError(f"arrdoc inside an array extraction: {self}")

    def _needs_rebuild(self) -> bool:
        if self.kind in ("epoch_millis", "epoch_seconds", "base64"):
            return True
        if self.kind == "doc":
            return any(s._needs_rebuild() for s in self.fields.values())
        if self.kind == "array":
            return self.element._needs_rebuild()
        return False

    def _rebuild(self, c: Column) -> Column:
        """Post-extraction conversion pass over a typed value."""
        if self.kind == "epoch_millis":
            return F.timestamp_millis(c)
        if self.kind == "epoch_seconds":
            return F.timestamp_seconds(c)
        if self.kind == "base64":
            return F.unbase64(c)
        if self.kind == "doc":
            if not self._needs_rebuild():
                return c
            rebuilt = F.struct(
                *[
                    s._rebuild(c.getField(k)).alias(k)
                    for k, s in self.fields.items()
                ]
            )
            return F.when(c.isNull(), F.lit(None).cast(self.spark_type())).otherwise(
                rebuilt
            )
        if self.kind == "array":
            if not self._needs_rebuild():
                return c
            return F.transform(c, lambda e: self.element._rebuild(e))
        return c

    @staticmethod
    def _path_key(key: str) -> str:
        """A path step for one object key — bracket-quoted so keys with
        ``$``/dots/spaces address correctly."""
        return "['" + key.replace("'", "\\'") + "']"

    def _project(self, v: Column, path: str) -> Column:
        """Typed column for this node, extracting from variant ``v`` at
        ``path`` (``$``-relative)."""
        if self.kind in _SCALARS:
            raw = F.try_variant_get(v, path, _SCALARS[self.kind][0])
            return (
                self._rebuild(raw)
                if self.kind in ("epoch_millis", "epoch_seconds", "base64")
                else raw
            )
        if self.kind == "array":
            raw = F.try_variant_get(v, path, self._ext_ddl())
            return self._rebuild(raw)
        # doc / arrdoc: pull the sub-variant once so a missing/null
        # object becomes a NULL struct (not a struct of nulls), then
        # project children with shallow relative paths
        sub = F.try_variant_get(v, path, "variant")
        if not self.fields:  # empty document / empty array (doc mode)
            empty = F.expr("named_struct()")
            return F.when(sub.isNull(), F.lit(None).cast(self.spark_type())).otherwise(
                empty
            )
        children = []
        for k, s in self.fields.items():
            if self.kind == "arrdoc":
                # _i fields address the SOURCE array by index
                child_path = f"$[{k[1:]}]"
            else:
                child_path = "$" + self._path_key(k)
            children.append(s._project(sub, child_path).alias(k))
        return F.when(
            sub.isNull(), F.lit(None).cast(self.spark_type())
        ).otherwise(F.struct(*children))

    def parse(self, col: Column | str) -> Column:
        """Parse an extended-JSON string column into the typed struct —
        the value-side twin of the reference's ``convertRecord``."""
        from .mongo import normalize_extended_json

        c = F.col(col) if isinstance(col, str) else col
        v = F.parse_json(normalize_extended_json(c))
        return self._project(v, "$")


# --------------------------------------------------------------- inference
def _bson_scalar_kind(value, path: str) -> Optional[str]:
    """BSON-faithful scalar kind of one plain-JSON/extended-JSON value;
    None for ``$undefined`` (dropped, the reference's default-case
    return). Mirrors addFieldSchema's type switch."""
    if value is None:
        return "string"  # NULL → OPTIONAL_STRING_SCHEMA
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "int" if _INT32_MIN <= value <= _INT32_MAX else "bigint"
    if isinstance(value, float):
        return "double"
    if isinstance(value, str):
        return "string"
    if isinstance(value, dict) and _wrapper_key(value):
        w = _wrapper_key(value)
        if w == "$undefined":
            return None
        return {
            "$oid": "string",
            "$numberDecimal": "string",  # DECIMAL128 → string
            "$numberInt": "int",
            "$numberLong": "bigint",
            "$numberDouble": "double",
            "$date": "epoch_millis",
            "$timestamp": "epoch_seconds",
            "$binary": "base64",
        }.get(w) or _raise_unsupported(w, path)
    return None


def _raise_unsupported(wrapper: str, path: str):
    raise ValueError(
        f"unsupported extended-JSON wrapper {wrapper!r} at {path}"
    )


def _wrapper_key(d: dict) -> Optional[str]:
    """The extended-JSON wrapper key, if ``d`` is a typed-scalar
    wrapper. ``$regularExpression`` is handled structurally (→ doc), so
    it is NOT a scalar wrapper."""
    if d and next(iter(d)).startswith("$"):
        k = next(iter(d))
        if k != "$regularExpression":
            return k
    return None


def _walk(value, array_encoding: str, path: str, key: str) -> Optional[MongoShape]:
    """value → shape; None to drop the field (undefined)."""
    if isinstance(value, dict) and not _wrapper_key(value):
        if "$regularExpression" in value and len(value) == 1:
            # REGULAR_EXPRESSION → struct<regex, options>
            # (MongoDataConverter.java:514-519); pattern/options live
            # under the wrapper key in extended JSON, and the variant
            # path addresses the $-key directly — shape keeps the
            # reference's field names via a nested doc re-projection
            inner = MongoShape("doc")
            inner.fields["regex"] = MongoShape("string")
            inner.fields["options"] = MongoShape("string")
            return _RegexShape("doc", fields=inner.fields)
        doc = MongoShape("doc")
        for k, v in value.items():
            s = _walk(v, array_encoding, f"{path}.{k}", k)
            if s is not None:
                doc.fields[k] = s
        return doc
    if isinstance(value, list):
        if array_encoding == "document":
            arr = MongoShape("arrdoc")
            for i, el in enumerate(value):
                s = _walk(el, array_encoding, f"{path}[{i}]", key)
                if s is not None:
                    # the reference keys by ORIGINAL index
                    # (arrayElementStructName(i)) even when earlier
                    # elements were dropped
                    arr.fields[f"_{i}"] = s
            return arr
        return _walk_homogeneous_array(value, path, key)
    kind = _bson_scalar_kind(value, path)
    return MongoShape(kind) if kind else None


class _RegexShape(MongoShape):
    """$regularExpression: projects pattern/options from under the
    wrapper key into the reference's regex/options field names."""

    def _project(self, v: Column, path: str) -> Column:
        sub = F.try_variant_get(
            v, path + self._path_key("$regularExpression"), "variant"
        )
        out = F.struct(
            F.try_variant_get(sub, "$.pattern", "string").alias("regex"),
            F.try_variant_get(sub, "$.options", "string").alias("options"),
        )
        return F.when(
            sub.isNull(), F.lit(None).cast(self.spark_type())
        ).otherwise(out)


def _el_type_token(el) -> str:
    """Homogeneity token — distinct per BSON type, like testType's
    BsonType compare (int32 vs int64 ARE different types there)."""
    if isinstance(el, dict) and _wrapper_key(el):
        return _wrapper_key(el)
    if isinstance(el, dict):
        return "document"
    if isinstance(el, list):
        return "array"
    if isinstance(el, bool):
        return "boolean"
    if isinstance(el, int):
        return "int32" if _INT32_MIN <= el <= _INT32_MAX else "int64"
    if isinstance(el, float):
        return "double"
    if el is None:
        return "null"
    return "string"


def _walk_homogeneous_array(value: list, path: str, key: str) -> MongoShape:
    """array mode: homogeneity check (testType) + document-element field
    union (subSchema/testArrayElementType)."""
    arr = MongoShape("array")
    if not value:
        arr.element = MongoShape("string")  # empty → array<string>
        return arr
    t0 = _el_type_token(value[0])
    if t0 == "document":
        for el in value:
            if _el_type_token(el) != "document":
                _raise_not_homogeneous(key, path)
        arr.element = _union_documents(value, path, key)
        return arr
    if t0 == "array":
        for el in value:
            if _el_type_token(el) != "array":
                _raise_not_homogeneous(key, path)
        # each nested array re-checked against ITS first element
        subs = [_walk_homogeneous_array(el, f"{path}[]", key) for el in value]
        arr.element = subs[0]
        return arr
    for el in value:
        if _el_type_token(el) != t0:
            _raise_not_homogeneous(key, path)
    arr.element = MongoShape(_bson_scalar_kind(value[0], path))
    return arr


def _raise_not_homogeneous(key: str, path: str):
    raise HeterogeneousArrayError(
        f"Field {key} of schema {path} is not a homogenous array.\n"
        "Check option 'struct' of parameter 'array.encoding'"
    )


def _union_documents(docs: list[dict], path: str, key: str) -> MongoShape:
    """Field union across array-of-document elements, with the
    reference's two passes: empty sub-documents/arrays are skipped first
    (subSchema's emptyChecker) and only consulted when no field emerged;
    NULL upgrades to the non-null type; other per-field type conflicts
    raise (testArrayElementType)."""
    for empty_skip in (True, False):
        union: dict[str, str] = {}
        merged = MongoShape("doc")
        for d in docs:
            for k, v in d.items():
                if empty_skip and (
                    (isinstance(v, dict) and not _wrapper_key(v) and not v)
                    or (isinstance(v, list) and not v)
                ):
                    continue
                tok = _el_type_token(v)
                prev = union.get(k)
                if prev is None:
                    union[k] = tok
                    s = _walk(v, "array", f"{path}.{k}", k)
                    if s is not None:
                        merged.fields[k] = s
                elif prev != tok:
                    if prev == "null":
                        union[k] = tok  # upgrade, re-walk the real type
                        s = _walk(v, "array", f"{path}.{k}", k)
                        if s is not None:
                            merged.fields[k] = s
                    elif tok == "null":
                        pass  # keep the non-null type
                    else:
                        raise HeterogeneousArrayError(
                            f"Field {k} of schema {path} is not the same "
                            "type for all documents in the array.\n"
                            "Check option 'struct' of parameter "
                            "'array.encoding'"
                        )
        if merged.fields:
            return merged
    return merged


def infer_mongo_shape(
    sample: str | dict | list, array_encoding: str = "array"
) -> MongoShape:
    """Infer the document shape from one or more sample extended-JSON
    documents (strings or parsed dicts). With several samples the top
    document unions fields first-type-wins, same rules as array-element
    union."""
    if array_encoding not in ("array", "document"):
        raise ValueError(
            f"array.encoding must be array|document, got {array_encoding!r}"
        )
    samples = sample if isinstance(sample, list) else [sample]
    docs = [json.loads(s) if isinstance(s, str) else s for s in samples]
    if len(docs) == 1:
        shape = _walk(docs[0], array_encoding, "$", "$")
    else:
        merged: dict = {}
        for d in docs:
            for k, v in d.items():
                merged.setdefault(k, v)
        shape = _walk(merged, array_encoding, "$", "$")
    if shape is None or shape.kind != "doc":
        raise ValueError("sample must be a JSON object")
    return shape


def parse_mongo_json(
    col: Column | str,
    sample: str | dict | list | MongoShape,
    array_encoding: str = "array",
) -> Column:
    """One-call form: infer (or reuse) the shape and parse ``col``."""
    shape = (
        sample
        if isinstance(sample, MongoShape)
        else infer_mongo_shape(sample, array_encoding)
    )
    return shape.parse(col)
