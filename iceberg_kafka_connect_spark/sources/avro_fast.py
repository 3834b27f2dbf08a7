"""Compiled Avro binary decoder: schema -> closure chain, one pass.

The generic codec (streaming/legacy_events.decode_datum) re-inspects
the schema dict for every value — fine for control-topic drains, too
slow for the converter hot path (~20k rec/s single-thread measured).
This module compiles a writer schema ONCE into nested closures (one
per schema node, bound at compile time), folding the logical-type
conversions (timestamp-micros -> datetime, date -> date, decimal bytes
-> Decimal) into the same pass, so decoding a record is just a chain
of direct calls. Compiled decoders cache by canonical schema text —
one compile per writer schema per process, the same lifecycle as the
executor-side schema cache.

Wire layout is the public Avro binary spec (zigzag varints, length-
prefixed bytes/strings, block-encoded arrays/maps, union branch index).
"""

from __future__ import annotations

import base64
import json
import struct
from datetime import date, datetime, timedelta
from decimal import Decimal
from typing import Any, Callable

_EPOCH = datetime(1970, 1, 1)
_EPOCH_DAY = date(1970, 1, 1)


class AvroDecodeError(ValueError):
    pass


# readers operate on (buf: bytes, pos: int) -> (value, new_pos): no
# BytesIO object churn, just integer arithmetic over one bytes object
def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    n, shift = 0, 0
    while True:
        try:
            b = buf[pos]
        except IndexError:
            raise AvroDecodeError("truncated varint") from None
        pos += 1
        n |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (n >> 1) ^ -(n & 1), pos
        shift += 7


def compile_decoder(
    schema: Any, json_mode: bool = False
) -> Callable[[bytes, int], tuple[Any, int]]:
    """Schema node -> reader closure ``(buf, pos) -> (value, pos)``.

    ``json_mode=True`` yields JSON-READY python values (ISO strings for
    timestamps/dates, str for decimals, base64 str for bytes/fixed) so
    the converter lane's record render is one ``json.dumps(dict)`` with
    zero per-value dispatch."""
    if isinstance(schema, list):  # union
        branches = [compile_decoder(b, json_mode) for b in schema]
        nbr = len(branches)

        def _union(buf, pos, _branches=branches, _n=nbr):
            idx, pos = _read_long(buf, pos)
            if not 0 <= idx < _n:
                raise AvroDecodeError(f"bad union branch {idx}")
            return _branches[idx](buf, pos)

        return _union

    t = schema["type"] if isinstance(schema, dict) else schema
    logical = schema.get("logicalType") if isinstance(schema, dict) else None

    if t == "null":
        return lambda buf, pos: (None, pos)
    if t == "boolean":
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if t in ("int", "long"):
        if logical in ("timestamp-micros", "local-timestamp-micros"):

            def _ts_us(buf, pos, _j=json_mode):
                v, pos = _read_long(buf, pos)
                dt = _EPOCH + timedelta(microseconds=v)
                return (dt.isoformat(sep=" ") if _j else dt), pos

            return _ts_us
        if logical == "timestamp-millis":

            def _ts_ms(buf, pos, _j=json_mode):
                v, pos = _read_long(buf, pos)
                dt = _EPOCH + timedelta(milliseconds=v)
                return (dt.isoformat(sep=" ") if _j else dt), pos

            return _ts_ms
        if logical == "date":

            def _date(buf, pos, _j=json_mode):
                v, pos = _read_long(buf, pos)
                d = _EPOCH_DAY + timedelta(days=v)
                return (d.isoformat() if _j else d), pos

            return _date
        return _read_long
    if t == "float":
        unpack_f = struct.Struct("<f").unpack_from
        return lambda buf, pos: (unpack_f(buf, pos)[0], pos + 4)
    if t == "double":
        unpack_d = struct.Struct("<d").unpack_from
        return lambda buf, pos: (unpack_d(buf, pos)[0], pos + 8)
    if t == "string":

        def _string(buf, pos):
            n, pos = _read_long(buf, pos)
            end = pos + n
            return buf[pos:end].decode(), end

        return _string
    if t == "bytes":
        if logical == "decimal":
            scale = int(schema.get("scale", 0))

            def _decimal(buf, pos, _scale=scale, _j=json_mode):
                n, pos = _read_long(buf, pos)
                end = pos + n
                unscaled = int.from_bytes(
                    buf[pos:end], "big", signed=True
                )
                v = Decimal(unscaled).scaleb(-_scale)
                return (str(v) if _j else v), end

            return _decimal

        def _bytes(buf, pos, _j=json_mode):
            n, pos = _read_long(buf, pos)
            end = pos + n
            raw = bytes(buf[pos:end])
            if _j:
                return base64.b64encode(raw).decode(), end
            return raw, end

        return _bytes
    if t == "fixed":
        size = schema["size"]

        def _fixed(buf, pos, _s=size, _j=json_mode):
            raw = bytes(buf[pos:pos + _s])
            if _j:
                return base64.b64encode(raw).decode(), pos + _s
            return raw, pos + _s

        return _fixed
    if t == "enum":
        symbols = schema["symbols"]

        def _enum(buf, pos, _sym=symbols):
            i, pos = _read_long(buf, pos)
            return _sym[i], pos

        return _enum
    if t == "record":
        pairs = [
            (f["name"], compile_decoder(f["type"], json_mode))
            for f in schema["fields"]
        ]

        def _record(buf, pos, _pairs=pairs):
            out = {}
            for name, fn in _pairs:
                out[name], pos = fn(buf, pos)
            return out, pos

        return _record
    if t == "array":
        item_fn = compile_decoder(schema["items"], json_mode)

        def _array(buf, pos, _fn=item_fn):
            out = []
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)  # block byte size
                for _ in range(n):
                    v, pos = _fn(buf, pos)
                    out.append(v)

        return _array
    if t == "map":
        val_fn = compile_decoder(schema["values"], json_mode)

        def _map(buf, pos, _fn=val_fn):
            out = {}
            while True:
                n, pos = _read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _read_long(buf, pos)
                for _ in range(n):
                    klen, pos = _read_long(buf, pos)
                    kend = pos + klen
                    k = buf[pos:kend].decode()
                    out[k], pos = _fn(buf, kend)
            return out, pos

        return _map
    raise AvroDecodeError(f"unsupported avro type {t!r}")


_CACHE: dict[tuple[str, bool], Callable[[bytes], Any]] = {}


def decoder_for(schema: dict, json_mode: bool = False) -> Callable[[bytes], Any]:
    """Cached record decoder ``payload bytes -> datum`` with logical
    types already applied (the single-pass fast path)."""
    key = (
        json.dumps(schema, sort_keys=True, separators=(",", ":")),
        json_mode,
    )
    fn = _CACHE.get(key)
    if fn is None:
        inner = compile_decoder(schema, json_mode)

        def fn(payload: bytes, _inner=inner):
            value, _ = _inner(payload, 0)
            return value

        _CACHE[key] = fn
    return fn
