"""Baseline TIFF decoder tests over hand-assembled files — IFD
construction, strip math, and the two compressions are written out
independently of the decoder (conformance-by-construction, like
test_gif.py), covering both byte orders, PackBits, TIFF-dialect LZW
(MSB-first + EarlyChange), the horizontal predictor, palettes,
white-is-zero, and honest errors."""

import struct

import numpy as np
import pytest

from dataflowex_spark.operators.tiff import decode_tiff


def _tiff(tags, data_blobs, endian="<"):
    """Assemble: header + IFD (+ external value areas) + data blobs.
    `tags` = [(tag, type, values)]; blob offsets are patched via the
    special value 'BLOB<i>'."""
    sig = b"II*\x00" if endian == "<" else b"MM\x00*"
    # layout: header(8) + ifd + external values + blobs
    n = len(tags)
    ifd_size = 2 + 12 * n + 4
    ext = bytearray()
    ext_base = 8 + ifd_size
    entries = b""
    # first pass: compute blob offsets after externals (two passes)
    type_size = {1: 1, 3: 2, 4: 4}
    ext_len = 0
    for _tag, typ, vals in tags:
        total = type_size[typ] * len(vals)
        if total > 4:
            ext_len += total
    blob_off = ext_base + ext_len
    blob_offsets = []
    for b in data_blobs:
        blob_offsets.append(blob_off)
        blob_off += len(b)

    for tag, typ, vals in tags:
        vals = [
            blob_offsets[int(v[4:])] if isinstance(v, str) else v
            for v in vals
        ]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        total = type_size[typ] * len(vals)
        packed = struct.pack(endian + fmt * len(vals), *vals)
        if total <= 4:
            val_field = packed.ljust(4, b"\0")
        else:
            val_field = struct.pack(endian + "I", ext_base + len(ext))
            ext += packed
        entries += struct.pack(endian + "HH", tag, typ)
        entries += struct.pack(endian + "I", len(vals)) + val_field
    ifd = struct.pack(endian + "H", n) + entries + b"\0\0\0\0"
    out = sig + struct.pack(endian + "I", 8) + ifd + ext
    for b in data_blobs:
        out += b
    return bytes(out)


def _lzw_literal_tiff(data: bytes) -> bytes:
    """Literal-only TIFF LZW stream (CLEAR + symbols + EOI), packing
    MSB-first and bumping width EARLY exactly as a conformant decoder
    expects — an independent statement of the packing rules."""
    bits = []

    def emit(code, width):
        for i in range(width - 1, -1, -1):
            bits.append((code >> i) & 1)

    width, next_code = 9, 258
    emit(256, width)
    prev = False
    for b in data:
        emit(b, width)
        if prev:
            next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        prev = True
    emit(257, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << (7 - j)
        out.append(byte)
    return bytes(out)


def _packbits(data: bytes) -> bytes:
    """Naive PackBits: runs of >=3 as repeats, else literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 126:
            j += 1
        if j - i >= 2:
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:
            k = i
            while (
                k < n
                and k - i < 127
                and not (
                    k + 2 < n and data[k] == data[k + 1] == data[k + 2]
                )
            ):
                k += 1
            out += bytes([k - i - 1]) + data[i:k]
            i = k
    return bytes(out)


def _base_tags(w, h, spp, comp, photo, strip_blobs, extra=()):
    return [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [8] * spp),
        (259, 3, [comp]),
        (262, 3, [photo]),
        (273, 4, [f"BLOB{i}" for i in range(len(strip_blobs))]),
        (277, 3, [spp]),
        (278, 4, [max(1, h // len(strip_blobs))]),
        (279, 4, [len(b) for b in strip_blobs]),
        *extra,
    ]


def test_uncompressed_rgb_both_endians():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for endian in ("<", ">"):
        t = _tiff(
            _base_tags(3, 2, 3, 1, 2, [px.tobytes()]),
            [px.tobytes()],
            endian,
        )
        w, h, ch, arr = decode_tiff(t)
        assert (w, h, ch) == (3, 2, 3)
        assert np.array_equal(arr, px)


def test_packbits_gray_and_white_is_zero():
    row = bytes([7] * 10 + [1, 2, 3])  # run + literals
    enc = _packbits(row * 2)
    t = _tiff(_base_tags(13, 2, 1, 32773, 1, [enc]), [enc])
    _, _, ch, arr = decode_tiff(t)
    assert ch == 1 and arr[0, 0, 0] == 7 and arr[1, 12, 0] == 3
    # photometric 0 inverts
    t0 = _tiff(_base_tags(13, 2, 1, 32773, 0, [enc]), [enc])
    _, _, _, inv = decode_tiff(t0)
    assert inv[0, 0, 0] == 255 - 7


def test_lzw_with_width_growth_and_multi_strip():
    # 300 bytes/strip forces the 9->10 bit width bump mid-stream
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (4, 150), dtype=np.uint8)
    strips = [
        _lzw_literal_tiff(px[:2].tobytes()),
        _lzw_literal_tiff(px[2:].tobytes()),
    ]
    t = _tiff(_base_tags(150, 4, 1, 5, 1, strips), strips)
    _, _, _, arr = decode_tiff(t)
    assert np.array_equal(arr[:, :, 0], px)


def test_lzw_dictionary_hit_and_predictor():
    # predictor 2: stored bytes are per-channel row deltas
    px = np.array([[10, 20, 30, 40, 50]], dtype=np.uint8)
    deltas = np.array([[10, 10, 10, 10, 10]], dtype=np.uint8)
    # real LZW compression path: "10" repeated exercises dict hits —
    # hand stream: CLEAR, 10, 258?... use literal encoder (decoder dict
    # correctness is covered by the GIF KwKwK test; here width+EOI)
    enc = _lzw_literal_tiff(deltas.tobytes())
    t = _tiff(
        _base_tags(5, 1, 1, 5, 1, [enc], extra=((317, 3, [2]),)), [enc]
    )
    _, _, _, arr = decode_tiff(t)
    assert arr[0, :, 0].tolist() == px[0].tolist()


def test_palette_tiff():
    idx = bytes([0, 1, 2, 1])
    # ColorMap: 16-bit entries, all reds then greens then blues
    cm = [65535, 0, 32896] + [0, 65535, 0] + [0, 0, 65535]
    t = _tiff(
        _base_tags(4, 1, 1, 1, 3, [idx], extra=((320, 3, cm),)), [idx]
    )
    _, _, ch, arr = decode_tiff(t)
    assert ch == 3
    assert arr[0, 0].tolist() == [255, 0, 0]
    assert arr[0, 1].tolist() == [0, 255, 0]
    assert arr[0, 2].tolist() == [128, 0, 255]  # 32896>>8=128 blue=255
    assert arr[0, 3].tolist() == [0, 255, 0]


def test_honest_errors():
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"NOTTIFF!")
    px = bytes(4)
    t = _tiff(
        _base_tags(2, 2, 1, 1, 1, [px], extra=((322, 4, [64]),)), [px]
    )
    with pytest.raises(NotImplementedError, match="tiled"):
        decode_tiff(t)
    t16 = _tiff(
        [
            (256, 4, [2]), (257, 4, [2]), (258, 3, [16]),
            (259, 3, [1]), (262, 3, [1]),
            (273, 4, ["BLOB0"]), (277, 3, [1]),
            (278, 4, [2]), (279, 4, [8]),
        ],
        [bytes(8)],
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_tiff(t16)


def test_tiff_through_decode_image():
    from dataflowex_spark.operators.multimodal import decode_image

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    t = _tiff(_base_tags(2, 2, 3, 1, 2, [px.tobytes()]), [px.tobytes()])
    d = decode_image(t)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert np.array_equal(d["pixels"], px)


def test_planar_configuration_refused():
    """PlanarConfiguration=2 (separate planes) must raise the honest
    NotImplementedError — reshaping planar strips as chunky would
    silently scramble channels (r6 advice closure). Chunky value 1
    stated explicitly still decodes."""
    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    planar = _tiff(
        _base_tags(2, 2, 3, 1, 2, [px.tobytes()], extra=((284, 3, [2]),)),
        [px.tobytes()],
    )
    with pytest.raises(NotImplementedError, match="[Pp]lanar"):
        decode_tiff(planar)
    chunky = _tiff(
        _base_tags(2, 2, 3, 1, 2, [px.tobytes()], extra=((284, 3, [1]),)),
        [px.tobytes()],
    )
    _, _, _, arr = decode_tiff(chunky)
    assert np.array_equal(arr, px)
    # planar on a 1-sample image is harmless (planes == chunky)
    g = bytes(range(4))
    mono = _tiff(
        _base_tags(2, 2, 1, 1, 1, [g], extra=((284, 3, [2]),)), [g]
    )
    _, _, ch, _ = decode_tiff(mono)
    assert ch == 1
