"""Puffin file format (Iceberg spec "Puffin file format"): a container
for statistics and deletion-vector blobs.

Layout (all per the public spec):

    Magic  Blob1  Blob2 ...  Magic  FooterPayload  FooterPayloadSize  Flags  Magic

- ``Magic`` is the 4 bytes ``0x50 0x46 0x41 0x31`` ("PFA1").
- ``FooterPayload`` is UTF-8 JSON (optionally gzip — this writer emits
  it uncompressed, flag bit 0 clear) describing the blobs:
  ``{"blobs": [{"type": ..., "fields": [...], "snapshot-id": ...,
  "sequence-number": ..., "offset": ..., "length": ...,
  "properties": {...}}, ...], "properties": {...}}``.
- ``FooterPayloadSize`` is a 4-byte little-endian int; ``Flags`` is 4
  bytes (bit 0 of byte 0 = footer payload gzip-compressed).

Deletion-vector blobs use type ``deletion-vector-v1`` framed exactly as
the Iceberg v3 spec ("Deletion vector serialization") prescribes:

    length(4B big-endian) | magic D1 D3 39 64 | portable-64-bit-roaring
    vector | CRC-32(4B big-endian, over magic+vector)

where ``length`` counts the magic + vector bytes (not itself, not the
CRC). The vector payload is the portable 64-bit roaring serialization
(``functions/roaring.py``) of the deleted row ordinals of ONE data
file, with the referenced file and cardinality recorded in the blob
properties. ``frame_dv_blob``/``unframe_dv_blob`` apply/validate the
framing, so a conforming v3 reader can parse these blobs byte-for-byte.

Reference analogue: none (the connector predates v3 DVs); format per the
public Iceberg Puffin spec, re-implemented here.
"""

from __future__ import annotations

import gzip
import json
import struct
import zlib
from dataclasses import dataclass, field

MAGIC = b"PFA1"
FLAG_FOOTER_COMPRESSED = 0x01  # byte 0, bit 0

DV_BLOB_TYPE = "deletion-vector-v1"
DV_MAGIC = b"\xd1\xd3\x39\x64"  # spec: "a 4-byte magic sequence, D1 D3 39 64"


def frame_dv_blob(vector: bytes) -> bytes:
    """Wrap a portable-serialized bitmap in the v3 DV blob framing."""
    body = DV_MAGIC + vector
    return (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def unframe_dv_blob(blob: bytes) -> bytes:
    """Validate the v3 DV framing and return the bitmap payload."""
    if len(blob) < 12:
        raise ValueError(f"DV blob too small ({len(blob)} bytes)")
    (body_len,) = struct.unpack(">I", blob[:4])
    if len(blob) != 4 + body_len + 4:
        raise ValueError(
            f"DV blob length mismatch: header says {body_len}, "
            f"blob holds {len(blob) - 8}"
        )
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(f"bad DV magic {body[:4]!r}")
    (crc,) = struct.unpack(">I", blob[4 + body_len :])
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise ValueError("DV blob CRC-32 mismatch")
    return body[4:]


@dataclass
class BlobMeta:
    type: str
    offset: int
    length: int
    properties: dict = field(default_factory=dict)
    fields: list = field(default_factory=list)
    snapshot_id: str | None = None
    sequence_number: int | None = None


class PuffinWriter:
    """Incremental writer: blobs stream in one at a time (bounded
    memory — a maintenance job over millions of files never holds more
    than one blob), footer written on close."""

    def __init__(
        self,
        path: str,
        file_properties: dict | None = None,
        snapshot_id: str | None = None,
        sequence_number: int | None = None,
    ):
        self._f = open(path, "wb")
        self._f.write(MAGIC)
        self._props = dict(file_properties or {})
        self._snapshot_id = snapshot_id
        self._sequence_number = sequence_number
        self.metas: list[BlobMeta] = []

    def add_blob(self, btype: str, properties: dict, data: bytes) -> BlobMeta:
        off = self._f.tell()
        self._f.write(data)
        meta = BlobMeta(
            type=btype,
            offset=off,
            length=len(data),
            properties=dict(properties),
            snapshot_id=self._snapshot_id,
            sequence_number=self._sequence_number,
        )
        self.metas.append(meta)
        return meta

    def close(self) -> list[BlobMeta]:
        payload = json.dumps(
            {
                "blobs": [
                    {
                        "type": m.type,
                        "fields": m.fields,
                        "snapshot-id": m.snapshot_id,
                        "sequence-number": m.sequence_number,
                        "offset": m.offset,
                        "length": m.length,
                        "properties": m.properties,
                    }
                    for m in self.metas
                ],
                "properties": self._props,
            }
        ).encode("utf-8")
        self._f.write(MAGIC)
        self._f.write(payload)
        self._f.write(struct.pack("<I", len(payload)))
        self._f.write(struct.pack("<I", 0))  # flags: footer uncompressed
        self._f.write(MAGIC)
        self._f.close()
        return self.metas

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        else:
            self._f.close()


def write_puffin(
    path: str,
    blobs: list[tuple[str, dict, bytes]],
    file_properties: dict | None = None,
    snapshot_id: str | None = None,
    sequence_number: int | None = None,
) -> list[BlobMeta]:
    """Write ``blobs`` as ``(type, properties, data)`` triples; returns
    their recorded metadata (offsets/lengths for manifest entries)."""
    w = PuffinWriter(
        path,
        file_properties=file_properties,
        snapshot_id=snapshot_id,
        sequence_number=sequence_number,
    )
    for btype, props, data in blobs:
        w.add_blob(btype, props, data)
    return w.close()


def read_puffin_footer(path: str) -> dict:
    """Parse the footer; returns the payload JSON dict."""
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        if size < 4 + 12 + 4:
            raise ValueError(f"{path}: too small to be a puffin file")
        f.seek(0)
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: bad leading magic")
        f.seek(size - 12)
        tail = f.read(12)
        payload_size, flags = struct.unpack("<II", tail[:8])
        if tail[8:] != MAGIC:
            raise ValueError(f"{path}: bad trailing magic")
        f.seek(size - 12 - payload_size)
        payload = f.read(payload_size)
        # FooterPayload is preceded by its own Magic
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != MAGIC:
            raise ValueError(f"{path}: bad footer magic")
    if flags & FLAG_FOOTER_COMPRESSED:
        payload = gzip.decompress(payload)
    return json.loads(payload.decode("utf-8"))


def dv_payload(blob: bytes) -> bytes:
    """Bitmap payload of a DV blob: the framed v3 form is validated and
    unwrapped; a bare portable bitmap (written before the framing landed)
    passes through. Detection is unambiguous — a bare bitmap starts with
    an 8-byte little-endian map count, so bytes 4:8 are the count's high
    half (zero for any realistic map count), never the DV magic."""
    if len(blob) >= 8 and blob[4:8] == DV_MAGIC:
        return unframe_dv_blob(blob)
    return blob


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(f"{path}: truncated blob at {offset}+{length}")
    return data
