"""Puffin file format — reader + fixture writer, from the published
spec (https://iceberg.apache.org/puffin-spec/).

Puffin is the sidecar container Iceberg v3 stores DELETION VECTORS in
(blob type ``deletion-vector-v1``), replacing v2's position-delete
parquet files. Layout:

    Magic | Blob_1 ... Blob_n | Magic FooterPayload FooterPayloadSize Flags Magic

- ``Magic`` = ``0x50 0x46 0x41 0x31`` ("PFA1").
- ``FooterPayload``: UTF-8 JSON ``{"blobs": [...], "properties": {}}``
  — each blob entry carries ``type``, ``fields``, ``snapshot-id``,
  ``sequence-number``, ``offset``, ``length``, ``properties``
  (DVs put ``referenced-data-file`` + ``cardinality`` there).
- ``FooterPayloadSize``: 4-byte little-endian int.
- ``Flags``: 4 bytes; bit 0 of byte 0 = footer payload is
  LZ4-compressed (REFUSED here by name — lz4 is not in this
  environment; uncompressed footers are the default everywhere).

``deletion-vector-v1`` blob content (Iceberg v3 spec, Delete Formats):

    vector length (4B big-endian) | magic 0xD1 0xD3 0x39 0x64 |
    64-bit roaring bitmap, PORTABLE serialization | CRC-32 (4B BE)

where ``vector length`` counts the magic + bitmap bytes and the CRC
covers the same span. The portable 64-bit roaring codec lives in
:mod:`dataflowex_spark.sources.roaring`
(``roaring64_portable_*`` — distinct from Delta's RoaringBitmapArray).
"""

import json
import os
import struct
import zlib

from dataflowex_spark.sources.roaring import (
    roaring64_portable_deserialize,
    roaring64_portable_serialize,
)

MAGIC = b"PFA1"
DV_MAGIC = b"\xd1\xd3\x39\x64"
DV_BLOB_TYPE = "deletion-vector-v1"


class PuffinError(NotImplementedError):
    """File requires Puffin capabilities this reader lacks."""


def read_puffin_footer(path: str) -> dict:
    """Parse and return the footer payload JSON (validating both
    magics); refuses compressed footers by name."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(4)
        if head != MAGIC:
            raise PuffinError(f"not a Puffin file (bad magic): {path}")
        f.seek(size - 12)
        tail = f.read(12)
        payload_size = struct.unpack("<i", tail[0:4])[0]
        flags = tail[4:8]
        if tail[8:12] != MAGIC:
            raise PuffinError(f"truncated Puffin footer: {path}")
        if flags[0] & 0x01:
            raise PuffinError(
                "Puffin footer compression (lz4) not supported"
            )
        f.seek(size - 12 - payload_size)
        payload = f.read(payload_size)
        f.seek(size - 12 - payload_size - 4)
        if f.read(4) != MAGIC:
            raise PuffinError(
                f"Puffin footer start magic missing: {path}"
            )
    return json.loads(payload.decode("utf-8"))


def _decode_dv_blob(data: bytes) -> list[int]:
    """``deletion-vector-v1`` blob bytes → sorted positions, with
    length / magic / CRC-32 validation."""
    (vec_len,) = struct.unpack_from(">i", data, 0)
    if data[4:8] != DV_MAGIC:
        raise PuffinError(
            f"deletion-vector-v1 blob magic mismatch: {data[4:8]!r}"
        )
    body = data[4 : 4 + vec_len]  # magic + serialized bitmap
    (crc,) = struct.unpack_from(">I", data, 4 + vec_len)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        raise PuffinError("deletion-vector-v1 blob CRC mismatch")
    return roaring64_portable_deserialize(body[4:])


def read_puffin_dvs(path: str) -> list[tuple[str, list[int]]]:
    """Every deletion vector in the file, as
    ``(referenced-data-file, sorted positions)`` — non-DV blob types
    (stats sketches etc.) are optional metadata and skip; a DV blob
    without its required ``referenced-data-file`` property refuses."""
    footer = read_puffin_footer(path)
    out = []
    with open(path, "rb") as f:
        for blob in footer.get("blobs", []):
            if blob.get("type") != DV_BLOB_TYPE:
                continue  # theta sketches etc.: advisory stats
            props = blob.get("properties") or {}
            ref = props.get("referenced-data-file")
            if not ref:
                raise PuffinError(
                    "deletion-vector-v1 blob lacks "
                    "referenced-data-file"
                )
            f.seek(int(blob["offset"]))
            data = f.read(int(blob["length"]))
            positions = _decode_dv_blob(data)
            card = props.get("cardinality")
            if card is not None and int(card) != len(positions):
                raise PuffinError(
                    f"DV cardinality {card} != decoded "
                    f"{len(positions)} positions"
                )
            out.append((ref, positions))
    return out


def write_puffin_dvs(
    path: str,
    dvs: dict[str, list[int]],
    snapshot_id: int = 1,
    sequence_number: int = 1,
) -> list[dict]:
    """Write a Puffin file holding one ``deletion-vector-v1`` blob
    per referenced data file — the v3 writer twin of
    :func:`read_puffin_dvs` (used by both fixtures and the v3 DML
    path). Returns the footer's blob-metadata entries (offset /
    length / referenced-data-file / cardinality) so the caller can
    stamp per-DV manifest entries (``content_offset`` /
    ``content_size_in_bytes`` per the v3 manifest shape)."""
    blobs_meta = []
    body = bytearray(MAGIC)
    for ref in sorted(dvs):
        positions = sorted(set(int(p) for p in dvs[ref]))
        bitmap = roaring64_portable_serialize(positions)
        vec = DV_MAGIC + bitmap
        blob = (
            struct.pack(">i", len(vec))
            + vec
            + struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF)
        )
        blobs_meta.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": len(body),
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(positions)),
                },
            }
        )
        body.extend(blob)
    payload = json.dumps(
        {"blobs": blobs_meta, "properties": {}}
    ).encode("utf-8")
    body.extend(MAGIC)
    body.extend(payload)
    body.extend(struct.pack("<i", len(payload)))
    body.extend(b"\x00\x00\x00\x00")  # flags: uncompressed
    body.extend(MAGIC)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(bytes(body))
    return blobs_meta
