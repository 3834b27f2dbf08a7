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

Two entry points: ``footer_num_rows`` (the one value correctness
depends on) and ``footer_column_stats`` — the full protocol-level twin
of the pyarrow fold, producing the same per-column {t, min, max}
contract so typed columns written NEXT TO a variant column keep their
manifest bounds and still prune. On ordinary files it agrees with the
pyarrow fold bound-for-bound and is a strict superset (pyarrow's wheel
can't cast decimal statistics); truncated/inexact bounds sit out,
keeping pruning conservative.
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


# ------------------------------------------------ generic value reader
def _read_value(f: io.BytesIO, ttype: int):
    """Read one compact-protocol value as python data: structs become
    {field_id: (type, value)}, collections lists, BINARY bytes."""
    if ttype == _BOOL_TRUE:
        return True
    if ttype == _BOOL_FALSE:
        return False
    if ttype == _BYTE:
        return f.read(1)[0]
    if ttype in (_I16, _I32, _I64):
        return _zigzag_read(f)
    if ttype == _DOUBLE:
        return struct.unpack("<d", f.read(8))[0]
    if ttype == _BINARY:
        return f.read(_uvarint(f))
    if ttype in (_LIST, _SET):
        head = f.read(1)[0]
        size = head >> 4
        if size == 15:
            size = _uvarint(f)
        et = head & 0x0F
        if et in (_BOOL_TRUE, _BOOL_FALSE):
            return [f.read(1)[0] == 1 for _ in range(size)]
        return [_read_value(f, et) for _ in range(size)]
    if ttype == _MAP:
        size = _uvarint(f)
        out = {}
        if size:
            head = f.read(1)[0]
            kt, vt = head >> 4, head & 0x0F
            for _ in range(size):
                k = _read_value(f, kt)
                out[k] = _read_value(f, vt)
        return out
    if ttype == _STRUCT:
        return _read_struct(f)
    raise FooterError(f"bad compact type {ttype}")


def _zigzag_read(f: io.BytesIO) -> int:
    n = _uvarint(f)
    return (n >> 1) ^ -(n & 1)


def _read_struct(f: io.BytesIO) -> dict:
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
        last_fid = last_fid + delta if delta else _zigzag_read(f)
        out[last_fid] = _read_value(f, ttype)


def _footer_blob(path: str) -> bytes:
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
        return fh.read(meta_len)


# parquet physical Type enum
_T_BOOLEAN, _T_INT32, _T_INT64, _T_INT96 = 0, 1, 2, 3
_T_FLOAT, _T_DOUBLE, _T_BYTE_ARRAY, _T_FLBA = 4, 5, 6, 7
# ConvertedType values we interpret
_CT_UTF8, _CT_DECIMAL, _CT_DATE = 0, 5, 6
_CT_TS_MILLIS, _CT_TS_MICROS = 9, 10


def _leaf_logical(elem: dict) -> tuple[str | None, int]:
    """(logical tag, decimal scale) for a SchemaElement struct dict:
    tag one of utf8/date/ts_millis/ts_micros/decimal/None. Prefers the
    LogicalType union (field 10), falls back to converted_type (6)."""
    scale = elem.get(7, 0)
    lt = elem.get(10)
    if isinstance(lt, dict) and lt:
        fid = next(iter(lt))
        if fid == 1:
            return "utf8", 0
        if fid == 5:  # DECIMAL{1: scale, 2: precision}
            inner = lt[fid]
            return "decimal", inner.get(1, scale) if isinstance(
                inner, dict
            ) else scale
        if fid == 6:
            return "date", 0
        if fid == 8:  # TIMESTAMP{1: utc, 2: unit union{1 ms,2 us,3 ns}}
            unit = lt[fid].get(2) if isinstance(lt[fid], dict) else None
            if isinstance(unit, dict) and unit:
                ufid = next(iter(unit))
                if ufid == 1:
                    return "ts_millis", 0
                if ufid == 2:
                    return "ts_micros", 0
            return None, 0  # nanos etc: sit out
        return None, 0
    ct = elem.get(6)
    if ct == _CT_UTF8:
        return "utf8", 0
    if ct == _CT_DECIMAL:
        return "decimal", scale
    if ct == _CT_DATE:
        return "date", 0
    if ct == _CT_TS_MILLIS:
        return "ts_millis", 0
    if ct == _CT_TS_MICROS:
        return "ts_micros", 0
    return None, 0


def _decode_stat(raw: bytes, ptype: int, logical: str | None, scale: int):
    """Parquet plain-encoded stat bytes -> (tag, value) in the manifest
    stats contract (sinks/stats._norm tags); None = column sits out."""
    import datetime as dt
    from decimal import Decimal

    try:
        if ptype == _T_INT32:
            v = struct.unpack("<i", raw)[0]
            if logical == "date":
                return "d", (
                    dt.date(1970, 1, 1) + dt.timedelta(days=v)
                ).isoformat()
            if logical == "decimal":
                return "f", float(Decimal(v).scaleb(-scale))
            return "i", v
        if ptype == _T_INT64:
            v = struct.unpack("<q", raw)[0]
            if logical == "ts_micros":
                return "ts", (
                    dt.datetime(1970, 1, 1)
                    + dt.timedelta(microseconds=v)
                ).isoformat()
            if logical == "ts_millis":
                return "ts", (
                    dt.datetime(1970, 1, 1)
                    + dt.timedelta(milliseconds=v)
                ).isoformat()
            if logical == "decimal":
                return "f", float(Decimal(v).scaleb(-scale))
            return "i", v
        if ptype == _T_FLOAT:
            v = struct.unpack("<f", raw)[0]
            return None if v != v else ("f", v)
        if ptype == _T_DOUBLE:
            v = struct.unpack("<d", raw)[0]
            return None if v != v else ("f", v)
        if ptype == _T_BYTE_ARRAY and logical == "utf8":
            return "s", raw.decode("utf-8")
        if ptype == _T_FLBA and logical == "decimal":
            unscaled = int.from_bytes(raw, "big", signed=True)
            return "f", float(Decimal(unscaled).scaleb(-scale))
    except (struct.error, UnicodeDecodeError, OverflowError, ValueError):
        return None
    return None


def footer_column_stats(path: str) -> dict:
    """Protocol-level twin of ``stats.collect_parquet_stats``: exact
    rows + per-top-level-column {t, min, max} folded across row groups,
    readable for ANY footer (pyarrow's logical-type whitelist does not
    apply). Truncated (inexact) string bounds sit out, matching the
    conservative pruning contract."""
    md = _read_struct(io.BytesIO(_footer_blob(path)))
    rows = md.get(3)
    if not isinstance(rows, int):
        raise FooterError(f"{path}: FileMetaData.num_rows absent")
    # schema tree -> top-level leaf (name, physical type, logical, scale)
    elems = md.get(2) or []
    leaf_info: dict[str, tuple[int, str | None, int]] = {}
    if elems:
        root = elems[0]
        idx = [1]

        def _walk(depth: int, prefix: str, count: int):
            for _ in range(count):
                if idx[0] >= len(elems):
                    return
                e = elems[idx[0]]
                idx[0] += 1
                name = e.get(4, b"").decode()
                kids = e.get(5)
                full = f"{prefix}{name}"
                if kids:
                    _walk(depth + 1, f"{full}.", kids)
                elif depth == 0 and 1 in e:
                    logical, scale = _leaf_logical(e)
                    leaf_info[full] = (e[1], logical, scale)

        _walk(0, "", root.get(5, 0))
    agg: dict[str, dict] = {}
    dead: set[str] = set()
    for rg in md.get(4) or []:
        for chunk in rg.get(1) or []:
            meta = chunk.get(3)
            if not isinstance(meta, dict):
                # a chunk without inline ColumnMetaData (external
                # file_path / encrypted metadata): its column cannot be
                # identified, so NO column may claim full coverage —
                # partial bounds would wrongly prune
                return {"rows": rows, "cols": {}}
            parts = [p.decode() for p in (meta.get(3) or [])]
            name = ".".join(parts)
            if "." in name or name in dead or name not in leaf_info:
                continue
            st = meta.get(12)
            ptype, logical, scale = leaf_info[name]
            lo_raw = st.get(6) if isinstance(st, dict) else None
            hi_raw = st.get(5) if isinstance(st, dict) else None
            exact = (
                st.get(7, True) and st.get(8, True)
                if isinstance(st, dict)
                else True
            )
            lo = (
                _decode_stat(lo_raw, ptype, logical, scale)
                if lo_raw is not None
                else None
            )
            hi = (
                _decode_stat(hi_raw, ptype, logical, scale)
                if hi_raw is not None
                else None
            )
            if lo is None or hi is None or lo[0] != hi[0] or not exact:
                dead.add(name)
                agg.pop(name, None)
                continue
            cur = agg.get(name)
            if cur is None:
                agg[name] = {"t": lo[0], "min": lo[1], "max": hi[1]}
            elif cur["t"] != lo[0]:
                dead.add(name)
                agg.pop(name, None)
            else:
                cur["min"] = min(cur["min"], lo[1])
                cur["max"] = max(cur["max"], hi[1])
    return {"rows": rows, "cols": agg}
