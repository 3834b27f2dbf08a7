"""Minimal parquet footer reader: Thrift compact protocol, stdlib only.

Why: manifest entries need each data file's exact ``record_count``.
The normal path folds footers with pyarrow (sinks/stats.py), but
pyarrow's thrift deserializer REJECTS files whose schema carries a
LogicalType enum value newer than the wheel (Spark 4's VARIANT columns
today; any future type tomorrow). Thrift itself is forward-compatible —
unknown enum values are plain varints and unknown fields skip by type —
so a protocol-level walk stays correct where the typed deserializer
gives up. This module implements exactly that: the public Thrift
compact-protocol encoding (varint/zigzag ints, nibble-packed field
headers and collection headers) with full skip capability, applied to
the parquet ``FileMetaData`` struct (footer = [metadata][4-byte LE
length]["PAR1"]).

Only ``num_rows`` (FileMetaData field 3) is extracted — the one value
correctness depends on. Column bounds remain pyarrow's job: they are a
scan-planning optimization, safely omitted for files pyarrow can't
parse (a file with no bounds simply never prunes).
"""

from __future__ import annotations

import io
import struct

# compact-protocol type ids
_STOP = 0
_BOOL_TRUE = 1
_BOOL_FALSE = 2
_BYTE = 3
_I16 = 4
_I32 = 5
_I64 = 6
_DOUBLE = 7
_BINARY = 8
_LIST = 9
_SET = 10
_MAP = 11
_STRUCT = 12


class FooterError(ValueError):
    pass


def _uvarint(f: io.BytesIO) -> int:
    n, shift = 0, 0
    while True:
        b = f.read(1)
        if not b:
            raise FooterError("truncated varint")
        n |= (b[0] & 0x7F) << shift
        if not (b[0] & 0x80):
            return n
        shift += 7
        if shift > 70:
            raise FooterError("varint overflow")


def _zigzag(f: io.BytesIO) -> int:
    n = _uvarint(f)
    return (n >> 1) ^ -(n & 1)


def _skip(f: io.BytesIO, ttype: int) -> None:
    if ttype in (_BOOL_TRUE, _BOOL_FALSE):
        return
    if ttype == _BYTE:
        f.read(1)
    elif ttype in (_I16, _I32, _I64):
        _uvarint(f)
    elif ttype == _DOUBLE:
        f.read(8)
    elif ttype == _BINARY:
        f.read(_uvarint(f))
    elif ttype in (_LIST, _SET):
        head = f.read(1)[0]
        size = head >> 4
        if size == 15:
            size = _uvarint(f)
        et = head & 0x0F
        for _ in range(size):
            _skip_elem(f, et)
    elif ttype == _MAP:
        size = _uvarint(f)
        if size:
            head = f.read(1)[0]
            kt, vt = head >> 4, head & 0x0F
            for _ in range(size):
                _skip_elem(f, kt)
                _skip_elem(f, vt)
    elif ttype == _STRUCT:
        _skip_struct(f)
    else:
        raise FooterError(f"bad compact type {ttype}")


def _skip_elem(f: io.BytesIO, ttype: int) -> None:
    """Collection elements: unlike field values (where true/false ride
    the type nibble), bools inside list/set/map occupy one byte each."""
    if ttype in (_BOOL_TRUE, _BOOL_FALSE):
        f.read(1)
    else:
        _skip(f, ttype)


def _skip_struct(f: io.BytesIO) -> None:
    last_fid = 0
    while True:
        head = f.read(1)
        if not head:
            raise FooterError("truncated struct")
        if head[0] == _STOP:
            return
        delta = head[0] >> 4
        ttype = head[0] & 0x0F
        last_fid = last_fid + delta if delta else _zigzag(f)
        _skip(f, ttype)


def _struct_fields(f: io.BytesIO, wanted: dict[int, int]) -> dict[int, object]:
    """Walk one struct; return {field_id: value} for wanted (id -> type)
    entries, skipping everything else. Supported wanted types: I64."""
    out: dict[int, object] = {}
    last_fid = 0
    while True:
        head = f.read(1)
        if not head:
            raise FooterError("truncated struct")
        if head[0] == _STOP:
            return out
        delta = head[0] >> 4
        ttype = head[0] & 0x0F
        last_fid = last_fid + delta if delta else _zigzag(f)
        if last_fid in wanted and ttype == wanted[last_fid] == _I64:
            out[last_fid] = _zigzag(f)
        else:
            _skip(f, ttype)


def footer_num_rows(path: str) -> int:
    """Exact row count from the parquet footer, independent of any
    logical-type whitelist."""
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        size = fh.tell()
        if size < 12:
            raise FooterError(f"{path}: not a parquet file")
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise FooterError(f"{path}: missing PAR1 trailer")
        meta_len = struct.unpack("<I", tail[:4])[0]
        if meta_len > size - 8:
            raise FooterError(f"{path}: footer length out of range")
        fh.seek(size - 8 - meta_len)
        blob = fh.read(meta_len)
    f = io.BytesIO(blob)
    fields = _struct_fields(f, {3: _I64})  # FileMetaData.num_rows
    if 3 not in fields:
        raise FooterError(f"{path}: FileMetaData.num_rows absent")
    return int(fields[3])
