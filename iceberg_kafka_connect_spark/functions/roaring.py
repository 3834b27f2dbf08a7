"""Portable Roaring bitmap serialization (pure Python, executor-safe).

Iceberg v3 deletion vectors store each data file's deleted row ordinals
as a 64-bit Roaring bitmap in the "portable" format defined by the
public RoaringFormatSpec (https://github.com/RoaringBitmap/RoaringFormatSpec),
the same cross-implementation format Delta Lake DVs use:

- 64-bit layout: an 8-byte little-endian count of 32-bit buckets, then
  for each bucket (ascending) a 4-byte little-endian high-32-bit key
  followed by a standard 32-bit Roaring bitmap of the low 32 bits.
- 32-bit layout (no-run-container flavor, which this writer emits):
  cookie 12346 (``SERIAL_COOKIE_NO_RUNCONTAINER``, 4 bytes LE), container
  count (4 bytes LE), per-container descriptors (2-byte key, 2-byte
  cardinality-1), per-container offsets (4 bytes LE each), then the
  container payloads in key order — ARRAY containers (sorted uint16
  values) for cardinality <= 4096, BITMAP containers (8 KiB bitset)
  above. The reader also accepts the run-container cookie (12347) since
  other writers may emit runs.

Row ordinals within a parquet file fit comfortably in 64 bits; in
practice almost all DVs are a single bucket (files hold < 2^32 rows).

Reference analogue: none in the connector (it predates v3); the format
itself is the public spec above, re-implemented — not copied — here.
"""

from __future__ import annotations

import struct
from typing import Iterable

SERIAL_COOKIE_NO_RUNCONTAINER = 12346
SERIAL_COOKIE = 12347  # with run containers (read support only)
_NO_OFFSET_THRESHOLD = 4  # spec: cookie 12347 omits offsets below this
_ARRAY_MAX = 4096


def _serialize_rb32(values: list[int]) -> bytes:
    """Standard 32-bit roaring serialization of sorted unique uint32s."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = [struct.pack("<II", SERIAL_COOKIE_NO_RUNCONTAINER, len(keys))]
    for k in keys:
        out.append(struct.pack("<HH", k, len(containers[k]) - 1))
    # offsets are from the START of the serialized bitmap
    header = 8 + 4 * len(keys) + 4 * len(keys)
    payloads = []
    offsets = []
    pos = header
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            payload = struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            payload = bytes(bits)
        offsets.append(pos)
        payloads.append(payload)
        pos += len(payload)
    out.extend(struct.pack("<I", o) for o in offsets)
    out.extend(payloads)
    return b"".join(out)


def _deserialize_rb32(buf: bytes, base: int = 0) -> tuple[list[int], int]:
    """Parse one 32-bit roaring bitmap at ``buf[base:]``; returns (sorted
    values, bytes consumed)."""
    (cookie16,) = struct.unpack_from("<H", buf, base)
    run_format = cookie16 == SERIAL_COOKIE
    if run_format:
        (cookie_word,) = struct.unpack_from("<I", buf, base)
        n = (cookie_word >> 16) + 1
        bitmap_of_runs = buf[base + 4 : base + 4 + (n + 7) // 8]
        pos = base + 4 + (n + 7) // 8
    else:
        cookie_word, n = struct.unpack_from("<II", buf, base)
        if cookie_word != SERIAL_COOKIE_NO_RUNCONTAINER:
            raise ValueError(f"not a roaring bitmap (cookie {cookie_word})")
        bitmap_of_runs = b""
        pos = base + 8
    descs = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        descs.append((key, card_m1 + 1))
        pos += 4
    if not run_format or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n  # offsets — payloads follow in order anyway
    values: list[int] = []
    for i, (key, card) in enumerate(descs):
        is_run = bool(bitmap_of_runs) and bool(
            bitmap_of_runs[i // 8] & (1 << (i % 8))
        )
        hi = key << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | v for v in vals)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & -b
                    values.append(hi | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
    return values, pos - base


def serialize_bitmap64(positions: Iterable[int]) -> bytes:
    """Portable 64-bit roaring serialization of a set of non-negative
    ints (deduplicated, any order)."""
    uniq = sorted(set(positions))
    if uniq and uniq[0] < 0:
        raise ValueError("positions must be non-negative")
    buckets: dict[int, list[int]] = {}
    for v in uniq:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<Q", len(buckets))]
    for hi in sorted(buckets):
        out.append(struct.pack("<I", hi))
        out.append(_serialize_rb32(buckets[hi]))
    return b"".join(out)


def deserialize_bitmap64(buf: bytes) -> list[int]:
    """Inverse of ``serialize_bitmap64`` (accepts run containers too)."""
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    pos = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (hi,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        lows, consumed = _deserialize_rb32(buf, pos)
        pos += consumed
        values.extend((hi << 32) | v for v in lows)
    return values
