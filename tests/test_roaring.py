"""Roaring/Z85/DV-file codecs (Delta deletion-vector storage stack):
spec vectors, container-kind roundtrips, and corruption detection.
No Spark needed — pure byte-level checks."""

import os
import struct
import zlib

import pytest

from dataflowex_spark.sources.roaring import (
    ROARING_ARRAY_MAGIC,
    bitmap_array_deserialize,
    bitmap_array_serialize,
    decode_dv_descriptor,
    inline_dv_descriptor,
    read_dv_file,
    roaring32_deserialize,
    roaring32_serialize,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_rfc_vector():
    # the ZeroMQ RFC 32 reference vector
    assert z85_encode(b"\x86\x4f\xd2\x6f\xb5\x59\xf7\x5b") == "HelloWorld"
    assert z85_decode("HelloWorld") == b"\x86\x4f\xd2\x6f\xb5\x59\xf7\x5b"
    with pytest.raises(ValueError, match="divisible by 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode('"""""')


def test_roaring32_array_and_bitmap_containers():
    # array containers across two 64Ki chunks
    vals = [1, 5, 65535, 65536, 131072 + 9]
    buf = roaring32_serialize(vals)
    out, used = roaring32_deserialize(buf)
    assert out == vals and used == len(buf)
    # >4096 values in one chunk forces a BITMAP container
    dense = list(range(0, 13000, 2))
    buf = roaring32_serialize(dense)
    out, used = roaring32_deserialize(buf)
    assert out == dense and used == len(buf)
    # an 8 KiB container really was emitted
    assert len(buf) > 8192


def test_roaring32_run_container_decodes():
    """The writer never emits runs, but real DVs do — hand-build a
    run-aware (cookie 12347) bitmap with one RUN container."""
    # cookie: low16=12347, high16=count-1=0; 1 flag byte, run bit set
    buf = struct.pack("<I", 12347) + bytes([0b1])
    buf += struct.pack("<HH", 0, 9)  # key 0, cardinality-1 = 9
    # < NO_OFFSET_THRESHOLD containers → no offset block
    buf += struct.pack("<H", 2)  # two runs
    buf += struct.pack("<HH", 4, 3)  # 4..7
    buf += struct.pack("<HH", 100, 5)  # 100..105
    out, used = roaring32_deserialize(buf)
    assert out == [4, 5, 6, 7, 100, 101, 102, 103, 104, 105]
    assert used == len(buf)


def test_bitmap_array_spans_high_words():
    pos = [0, 1, (1 << 32) + 5, (3 << 32) + 2]
    data = bitmap_array_serialize(pos)
    (magic,) = struct.unpack_from("<i", data, 0)
    assert magic == ROARING_ARRAY_MAGIC
    assert bitmap_array_deserialize(data) == pos
    with pytest.raises(ValueError, match="magic"):
        bitmap_array_deserialize(b"\x00\x00\x00\x00" + data[4:])


def test_dv_file_crc_and_size_guards(tmp_path):
    path = str(tmp_path / "dv.bin")
    (desc,) = write_dv_file(path, [[2, 4, 8]])
    assert read_dv_file(path, desc["offset"], desc["sizeInBytes"]) == [
        2, 4, 8
    ]
    # flip one payload byte → CRC mismatch
    raw = bytearray(open(path, "rb").read())
    raw[desc["offset"] + 6] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC-32"):
        read_dv_file(path, desc["offset"], desc["sizeInBytes"])
    # declared size disagreement refuses before any decode
    write_dv_file(path, [[2, 4, 8]])
    with pytest.raises(ValueError, match="sizeInBytes"):
        read_dv_file(path, desc["offset"], desc["sizeInBytes"] + 4)


def test_descriptor_storage_types(tmp_path):
    import uuid

    root = str(tmp_path)
    # inline
    inline = inline_dv_descriptor([7, 9])
    assert decode_dv_descriptor(root, inline) == [7, 9]
    # relative-UUID ("u"): prefix + z85(uuid), file under the prefix
    u = uuid.uuid4()
    rel = os.path.join(root, "ab")
    data = bitmap_array_serialize([1, 2, 3])
    os.makedirs(rel)
    with open(os.path.join(rel, f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(b"\x01")
        off = f.tell()
        f.write(struct.pack(">i", len(data)) + data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    desc = {
        "storageType": "u",
        "pathOrInlineDv": "ab" + z85_encode(u.bytes),
        "offset": off,
        "sizeInBytes": len(data),
        "cardinality": 3,
    }
    assert decode_dv_descriptor(root, desc) == [1, 2, 3]
    with pytest.raises(ValueError, match="storageType"):
        decode_dv_descriptor(root, {"storageType": "x", "sizeInBytes": 0})
