"""Minimal Apache Thrift TBinaryProtocol codec (stdlib only).

Just enough of the public Thrift binary wire format (strict version) to
speak the Hive Metastore protocol: messages (CALL/REPLY/EXCEPTION),
structs, maps, lists, sets, and the scalar types HMS uses. The encoder
takes explicitly-tagged values; the decoder is *generic* — it reads any
well-formed value guided by the wire type codes, returning structs as
``{field-id: value}`` dicts — which doubles as strict protocol
verification (a malformed frame fails the parse, like the SigV4 stubs
failing a bad signature).

Wire format per the public Thrift binary protocol spec
(github.com/apache/thrift/doc/specs/thrift-binary-protocol.md):
strict message header ``0x8001`` version word | message type, then
name, seqid, then a struct of fields ``(type:i8, id:i16, value)``
terminated by STOP.
"""

from __future__ import annotations

import struct
from typing import Any, BinaryIO

# thrift type codes
STOP = 0
BOOL = 2
BYTE = 3
DOUBLE = 4
I16 = 6
I32 = 8
I64 = 10
STRING = 11
STRUCT = 12
MAP = 13
SET = 14
LIST = 15

# message types
CALL = 1
REPLY = 2
EXCEPTION = 3

VERSION_1 = 0x80010000


class ThriftProtocolError(RuntimeError):
    pass


# ------------------------------------------------------------------ encode
def _enc_value(out: bytearray, ttype: int, value: Any) -> None:
    if ttype == BOOL:
        out.append(1 if value else 0)
    elif ttype == BYTE:
        out += struct.pack("!b", value)
    elif ttype == DOUBLE:
        out += struct.pack("!d", value)
    elif ttype == I16:
        out += struct.pack("!h", value)
    elif ttype == I32:
        out += struct.pack("!i", value)
    elif ttype == I64:
        out += struct.pack("!q", value)
    elif ttype == STRING:
        b = value.encode() if isinstance(value, str) else bytes(value)
        out += struct.pack("!i", len(b)) + b
    elif ttype == STRUCT:
        # value: {field_id: (ttype, value)}
        for fid, (ft, fv) in value.items():
            if fv is None:
                continue
            out += struct.pack("!bh", ft, fid)
            _enc_value(out, ft, fv)
        out.append(STOP)
    elif ttype in (LIST, SET):
        # value: (elem_ttype, [elems])
        et, elems = value
        out += struct.pack("!bi", et, len(elems))
        for e in elems:
            _enc_value(out, et, e)
    elif ttype == MAP:
        # value: (key_ttype, val_ttype, {k: v})
        kt, vt, d = value
        out += struct.pack("!bbi", kt, vt, len(d))
        for k, v in d.items():
            _enc_value(out, kt, k)
            _enc_value(out, vt, v)
    else:
        raise ThriftProtocolError(f"cannot encode thrift type {ttype}")


def encode_message(
    name: str, mtype: int, seqid: int, args: dict[int, tuple[int, Any]]
) -> bytes:
    out = bytearray()
    out += struct.pack("!I", VERSION_1 | mtype)
    _enc_value(out, STRING, name)
    out += struct.pack("!i", seqid)
    _enc_value(out, STRUCT, args)
    return bytes(out)


# ------------------------------------------------------------------ decode
def _read(f: BinaryIO, n: int) -> bytes:
    b = f.read(n)
    if b is None or len(b) != n:
        raise EOFError("thrift stream closed mid-message")
    return b


def _dec_value(f: BinaryIO, ttype: int) -> Any:
    if ttype == BOOL:
        return _read(f, 1)[0] != 0
    if ttype == BYTE:
        return struct.unpack("!b", _read(f, 1))[0]
    if ttype == DOUBLE:
        return struct.unpack("!d", _read(f, 8))[0]
    if ttype == I16:
        return struct.unpack("!h", _read(f, 2))[0]
    if ttype == I32:
        return struct.unpack("!i", _read(f, 4))[0]
    if ttype == I64:
        return struct.unpack("!q", _read(f, 8))[0]
    if ttype == STRING:
        (n,) = struct.unpack("!i", _read(f, 4))
        if n < 0 or n > 64 * 1024 * 1024:
            raise ThriftProtocolError(f"bad string length {n}")
        b = _read(f, n)
        try:
            return b.decode()
        except UnicodeDecodeError:
            return b  # binary field
    if ttype == STRUCT:
        fields: dict[int, Any] = {}
        while True:
            ft = struct.unpack("!b", _read(f, 1))[0]
            if ft == STOP:
                return fields
            (fid,) = struct.unpack("!h", _read(f, 2))
            fields[fid] = _dec_value(f, ft)
    if ttype in (LIST, SET):
        et, n = struct.unpack("!bi", _read(f, 5))
        if n < 0:
            raise ThriftProtocolError(f"bad container length {n}")
        return [_dec_value(f, et) for _ in range(n)]
    if ttype == MAP:
        kt, vt, n = struct.unpack("!bbi", _read(f, 6))
        if n < 0:
            raise ThriftProtocolError(f"bad map length {n}")
        return {_dec_value(f, kt): _dec_value(f, vt) for _ in range(n)}
    raise ThriftProtocolError(f"cannot decode thrift type {ttype}")


def decode_message(f: BinaryIO) -> tuple[str, int, int, dict[int, Any]]:
    """(name, message-type, seqid, args-struct) from an unframed binary
    stream — strict-version only, like modern HMS servers."""
    (head,) = struct.unpack("!I", _read(f, 4))
    if head & 0xFFFF0000 != VERSION_1:
        raise ThriftProtocolError(
            f"bad thrift version word 0x{head:08x} (strict binary only)"
        )
    mtype = head & 0xFF
    (nlen,) = struct.unpack("!i", _read(f, 4))
    name = _read(f, nlen).decode()
    (seqid,) = struct.unpack("!i", _read(f, 4))
    fields = _dec_value(f, STRUCT)
    return name, mtype, seqid, fields


# convenience constructors for tagged values
def t_str(v: str | None):
    return (STRING, v)


def t_i32(v: int | None):
    return (I32, v)


def t_i64(v: int | None):
    return (I64, v)


def t_bool(v: bool | None):
    return (BOOL, v)


def t_map_ss(d: dict | None):
    return (MAP, (STRING, STRING, d) if d is not None else None)


def t_struct(fields: dict | None):
    return (STRUCT, fields)


def t_list_struct(items: list | None):
    return (LIST, (STRUCT, items) if items is not None else None)
