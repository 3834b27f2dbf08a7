"""Murmur3 x86 32-bit — the hash behind Iceberg's ``bucket[N]`` partition
transform (table-spec Appendix B: hash the value's single-value binary
serialization with seed 0, then ``(h & Integer.MAX_VALUE) % N``).

Implemented from the public MurmurHash3 algorithm description (Austin
Appleby, public domain) — byte-compatible with Iceberg so exported bucket
specs prune correctly in external engines, unlike the engine-local
``bucket()`` transform (xxhash64, sinks/spec.py) which exists for layout
only.

Two paths:
- :func:`murmur3_32`: scalar bytes → signed int32 (strings, decimals,
  uuid/binary);
- :func:`murmur3_32_long`: numpy uint64 vector → int32 vector, the hot
  path for int/long/date/time/timestamp keys (all serialize as 8-byte
  little-endian longs), used inside the Arrow-batched bucket UDF.
"""

from __future__ import annotations

import struct

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 of ``data``; returns SIGNED int32 (Java semantics)."""
    h = seed & _M32
    n = len(data)
    full = n - (n % 4)
    for i in range(0, full, 4):
        k = struct.unpack_from("<I", data, i)[0]
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    tail = data[full:]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * _C1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * _C2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def murmur3_32_long(vals: np.ndarray) -> np.ndarray:
    """Vectorized murmur3_x86_32 over 8-byte little-endian serializations
    of int64 values (Iceberg's representation for int/long/date/time/
    timestamp bucket keys). Input any integer dtype; output int32."""
    v = vals.astype(np.int64, copy=False).view(np.uint64)
    h = np.zeros(v.shape, dtype=np.uint32)
    with np.errstate(over="ignore"):
        for shift in (np.uint64(0), np.uint64(32)):
            k = ((v >> shift) & np.uint64(_M32)).astype(np.uint32)
            k = k * np.uint32(_C1)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(_C2)
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)  # length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h.view(np.int32)


def iceberg_bucket_value(value, n: int) -> int | None:
    """Scalar Iceberg bucket id for a python value (spec Appendix B):
    serialize, murmur3, ``(h & MAX_INT) % n``. None → None (null keys get
    a null partition value, like Iceberg)."""
    import datetime as dt
    import decimal
    import uuid as uuidmod

    if value is None:
        return None
    if isinstance(value, bool):
        raise ValueError("boolean is not a valid bucket source type")
    if isinstance(value, int):
        raw = struct.pack("<q", value)
    elif isinstance(value, str):
        raw = value.encode("utf-8")
    elif isinstance(value, bytes):
        raw = value
    elif isinstance(value, decimal.Decimal):
        unscaled = int(value.scaleb(-value.as_tuple().exponent))
        # minimal two's-complement, exactly Java BigInteger.toByteArray():
        # length = bitLength//8 + 1 where bitLength excludes the sign bit
        # (bitLength(-128)=7 → 1 byte 0x80; bitLength(255)=8 → 2 bytes)
        jbl = (
            unscaled.bit_length()
            if unscaled >= 0
            else (-unscaled - 1).bit_length()
        )
        raw = unscaled.to_bytes(jbl // 8 + 1, "big", signed=True)
    elif isinstance(value, dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(dt.timezone.utc).replace(tzinfo=None)
        # integer arithmetic: total_seconds() is a float whose rounding
        # truncates microseconds past ~2^53/1e6 and even at small epochs
        # (epoch+1.000001s floats to 1_000_000 micros)
        micros = (value - dt.datetime(1970, 1, 1)) // dt.timedelta(
            microseconds=1
        )
        raw = struct.pack("<q", micros)
    elif isinstance(value, dt.date):
        days = (value - dt.date(1970, 1, 1)).days
        raw = struct.pack("<q", days)
    elif isinstance(value, uuidmod.UUID):
        raw = value.bytes
    else:
        raise ValueError(f"unbucketable value type {type(value).__name__}")
    return (murmur3_32(raw) & 0x7FFFFFFF) % n
