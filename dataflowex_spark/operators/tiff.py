"""From-scratch baseline TIFF decoder: IFD tag parsing (both byte
orders), strip assembly, PackBits RLE, TIFF-variant LZW (MSB-first
codes, EarlyChange width bump), horizontal-differencing predictor,
gray / RGB / palette / white-is-zero photometrics — pure stdlib +
numpy.

TIFF is the scanned-document / archival format web crawls and
document-AI corpora are full of; it completes the repo's real-codec
family (JPEG, PNG, GIF, BMP, netpbm, WAV). Note the LZW here is NOT
the GIF one (`gif.py`): TIFF packs codes MSB-first and grows the code
width ONE CODE EARLY (the "EarlyChange" quirk every conformant reader
must implement) — the two dialects sharing a name is a classic codec
trap, so they are deliberately separate implementations with separate
conformance tests.

Scope (honest edges, same policy as the other codecs): 8-bit samples,
strip-organized baseline images; tiles, 16-bit, CCITT fax codings,
and JPEG-in-TIFF raise NotImplementedError (the optional-PIL hook
upstream picks those up when available).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR = 284
_PREDICTOR, _COLORMAP = 317, 320
_TILE_TAGS = (322, 323, 324, 325)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 9: 4}


def _read_ifd(data: bytes, endian: str):
    off = struct.unpack(endian + "I", data[4:8])[0]
    n = struct.unpack(endian + "H", data[off : off + 2])[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = data[off + 2 + 12 * i : off + 14 + 12 * i]
        tag, typ = struct.unpack(endian + "HH", e[:4])
        count = struct.unpack(endian + "I", e[4:8])[0]
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        raw = e[8:12] if total <= 4 else data[
            struct.unpack(endian + "I", e[8:12])[0] :
        ][:total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I", 6: "b", 7: "B", 9: "i"}[typ]
        tags[tag] = list(struct.unpack(endian + fmt * count, raw[:total]))
    return tags


def _unpackbits(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:  # literal run of c+1
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:  # repeat next byte 257-c times
            out += data[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _lzw_decode_tiff(data: bytes) -> bytes:
    """TIFF LZW: 8-bit symbols, CLEAR=256, EOI=257, codes packed
    MSB-first, width starts at 9 and bumps EARLY (when the next
    assignable code is one below the width limit)."""
    CLEAR, EOI = 256, 257
    nbits = len(data) * 8
    bitpos = 0

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte = bitpos >> 3
        chunk = int.from_bytes(data[byte : byte + 4].ljust(4, b"\0"), "big")
        val = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        return val

    def reset():
        return {i: bytes([i]) for i in range(256)}, 9, 258

    table, width, next_code = reset()
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None or code == EOI:
            return bytes(out)
        if code == CLEAR:
            table, width, next_code = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"tiff: bad LZW code {code}")
        out += entry
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
        # EarlyChange: bump when the NEXT code would hit the limit
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        prev = entry


def decode_tiff(payload: bytes):
    """Decode a baseline TIFF → (w, h, channels, ndarray[h,w,c]
    uint8). Raises ValueError for non-TIFF payloads and
    NotImplementedError for out-of-scope variants."""
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("tiff: bad signature")
    tags = _read_ifd(payload, endian)
    if any(t in tags for t in _TILE_TAGS):
        raise NotImplementedError("tiff: tiled organization unsupported")
    w = tags[_WIDTH][0]
    h = tags[_HEIGHT][0]
    spp = tags.get(_SPP, [1])[0]
    # planar (separate-plane) sample layout would silently decode as
    # channel-scrambled chunky data if reshaped below — honest refusal
    if tags.get(_PLANAR, [1])[0] == 2 and spp > 1:
        raise NotImplementedError(
            "tiff: PlanarConfiguration=2 (planar) unsupported"
        )
    bits = tags.get(_BITS, [8] * spp)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"tiff: only 8-bit samples (got {bits})")
    comp = tags.get(_COMPRESSION, [1])[0]
    photo = tags.get(_PHOTOMETRIC, [1])[0]
    pred = tags.get(_PREDICTOR, [1])[0]
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_COUNTS]
    raw = bytearray()
    for o, c in zip(offsets, counts):
        chunk = payload[o : o + c]
        if comp == 1:
            raw += chunk
        elif comp == 5:
            raw += _lzw_decode_tiff(chunk)
        elif comp == 32773:
            raw += _unpackbits(chunk)
        else:
            raise NotImplementedError(f"tiff: compression {comp} unsupported")
    need = w * h * spp
    if len(raw) < need:
        raise ValueError("tiff: strip data underrun")
    arr = np.frombuffer(bytes(raw[:need]), dtype=np.uint8).reshape(h, w, spp)
    if pred == 2:  # horizontal differencing: cumsum along the row
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif pred != 1:
        raise NotImplementedError(f"tiff: predictor {pred} unsupported")
    if photo == 3:  # palette
        if _COLORMAP not in tags:
            raise ValueError("tiff: palette image without ColorMap")
        cm = tags[_COLORMAP]
        n = len(cm) // 3
        # 16-bit colormap entries; high byte is the 8-bit value
        pal = (
            np.array(cm, dtype=np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)
        arr = pal[np.minimum(arr[:, :, 0], n - 1)]
        return w, h, 3, np.ascontiguousarray(arr)
    if photo == 0:  # white-is-zero gray
        arr = 255 - arr
    elif photo not in (1, 2):
        raise NotImplementedError(f"tiff: photometric {photo} unsupported")
    return w, h, arr.shape[2], np.ascontiguousarray(arr)
