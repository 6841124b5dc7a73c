"""Native JPEG codec (baseline + progressive) — pure stdlib + numpy, no imaging library.

Mirrors the reference's stance that media payloads are opaque bytes the
pipeline must be able to decode on executors without native deps
[R: Gridsum.DataflowEx README # "Dataflow as a processing unit"] — the
engine side (schema, batching, mapInPandas plumbing) lives in
``operators/multimodal.py``; this module is the codec it calls.

Scope (honest about it):

- DECODE: baseline sequential DCT (SOF0/SOF1) AND progressive
  (SOF2), 8-bit, grayscale or YCbCr with sampling factors 1–2
  (covers 4:4:4, 4:2:2, 4:2:0 — the overwhelming majority of
  real-world JPEGs), restart markers, and stream-defined
  quant/Huffman tables redefinable between scans. Progressive
  support is complete: spectral selection, successive approximation
  (DC and AC refinement scans, including the correction-bit walk and
  multi-block EOB runs in both conventions — T.81 G.2). Arithmetic
  coding, hierarchical, 12-bit, and CMYK raise
  ``NotImplementedError`` so the optional-PIL hook / honest error in
  ``decode_image`` takes over.
- ENCODE: baseline (``encode_jpeg``) and progressive
  (``encode_jpeg_progressive``: DC successive approximation +
  per-component AC spectral scans), quality-scaled Annex-K
  quantization, standard Annex-K Huffman tables, 4:4:4 or 4:2:0
  chroma subsampling, grayscale or RGB. Used by tests and fixtures
  to synthesize real compressed payloads; progressive and baseline
  encodings of one image decode bit-identically (the round-trip law).

Entropy (Huffman) coding is bit-serial Python — acceptable because the
per-row work in a 100 TB pipeline is dominated by the surrounding I/O
and this path exists for correctness plumbing; swap in PIL/turbojpeg
via the documented hook for throughput-critical media corpora. The
DCT/IDCT, color transforms, and up/down-sampling are vectorized numpy
over whole planes.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K) and derived constants
# --------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits per code length 1..16, symbol values) — Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    order: list[tuple[int, int]] = []
    for s in range(15):
        idx = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            idx.reverse()  # even anti-diagonals run bottom-left → top-right
        order.extend(idx)
    return order


_ZZ = _zigzag_order()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])
# inverse: position in natural (row-major) order of each zigzag index
_UNZZ = np.empty(64, dtype=np.int64)
for _k, (_r, _c) in enumerate(_ZZ):
    _UNZZ[_k] = _r * 8 + _c


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_DCT = _dct_matrix()


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(ln, code): v for v, (code, ln) in _build_codes(bits, vals).items()}


def quality_scaled(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # T.81 byte stuffing
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    zz = block[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.nonzero(zz[1:])[0]
    end = int(nz[-1]) + 1 if nz.size else 0
    run = 0
    for i in range(1, end + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if end < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every 8x8 block of a (H,W) plane
    (H,W multiples of 8). Returns int32 [H//8, W//8, 8, 8]."""
    h, w = plane.shape
    blocks = (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        - 128.0
    )
    coefs = np.einsum("ux,ijxy,vy->ijuv", _DCT, blocks, _DCT)
    q = np.round(coefs / qtab).astype(np.int32)
    return q


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 ndarray [h,w,1|3] as a baseline JFIF JPEG.

    ``subsampling``: "4:4:4" (no chroma subsampling) or "4:2:0"
    (2x2 chroma decimation — the common web default). Grayscale
    input ignores the subsampling argument. ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs (what
    parallel decoders key on; also exercises the decoder's restart
    resync path)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    sub = subsampling == "4:2:0" and ch == 3

    qy = quality_scaled(QUANT_LUMA, quality)
    qc = quality_scaled(QUANT_CHROMA, quality)

    f = arr.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [f[:, :, 0]]

    if sub:
        ypad = _pad_edge(planes[0], 16)
        hh, ww = ypad.shape
        chroma = []
        for p in planes[1:]:
            p = _pad_edge(p, 16)
            p = p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            chroma.append(p)
        qplanes = [_fdct_quant(ypad, qy)] + [_fdct_quant(c, qc) for c in chroma]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        padded = [_pad_edge(p, 8) for p in planes]
        qplanes = [
            _fdct_quant(p, qy if i == 0 else qc) for i, p in enumerate(padded)
        ]
        samp = [(1, 1)] * ch

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    preds = [0] * ch
    state = {"mcu": 0, "rst": 0}

    def _mcu_boundary() -> None:
        if restart_interval and state["mcu"] and state["mcu"] % restart_interval == 0:
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (state["rst"] % 8)])
            state["rst"] += 1
            preds[:] = [0] * ch
        state["mcu"] += 1

    if ch == 1:
        blocks = qplanes[0]
        for by in range(blocks.shape[0]):
            for bx in range(blocks.shape[1]):
                _mcu_boundary()
                preds[0] = _encode_block(bw, blocks[by, bx], preds[0], dc_y, ac_y)
    elif not sub:
        nby, nbx = qplanes[0].shape[:2]
        for by in range(nby):
            for bx in range(nbx):
                _mcu_boundary()
                for ci in range(3):
                    dc_t, ac_t = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
                    preds[ci] = _encode_block(
                        bw, qplanes[ci][by, bx], preds[ci], dc_t, ac_t
                    )
    else:
        mcu_y = qplanes[0].shape[0] // 2
        mcu_x = qplanes[0].shape[1] // 2
        for my in range(mcu_y):
            for mx in range(mcu_x):
                _mcu_boundary()
                for sy in range(2):
                    for sx in range(2):
                        preds[0] = _encode_block(
                            bw,
                            qplanes[0][my * 2 + sy, mx * 2 + sx],
                            preds[0],
                            dc_y,
                            ac_y,
                        )
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        bw, qplanes[ci][my, mx], preds[ci], dc_c, ac_c
                    )
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    zz_qy = qy[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += _marker(0xDB, bytes([0x00]) + zz_qy)
    if ch == 3:
        zz_qc = qc[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        out += _marker(0xDB, bytes([0x01]) + zz_qc)
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for ci in range(ch):
        hi, vi = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1)
    out += _marker(0xC0, sof)
    out += _marker(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _marker(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if ch == 3:
        out += _marker(
            0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        )
        out += _marker(
            0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
        )
    if restart_interval:
        out += _marker(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ch])
    for ci in range(ch):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise NotImplementedError("JPEG entropy stream truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                # Marker in the bitstream (EOI / next segment): a
                # conformant stream only needs pad bits past here.
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        self.acc &= (1 << self.n) - 1
        return bit

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.n = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("missing restart marker")


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise NotImplementedError("invalid JPEG Huffman code")


def _receive_extend(reader: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = reader.read_bits(s)
    if v < (1 << (s - 1)):
        v -= (1 << s) - 1
    return v


def _next_marker_pos(d: bytes, pos: int) -> int:
    """First offset at/after ``pos`` holding a real marker (FF xx,
    xx not a stuffing 00 or restart RSTn)."""
    while pos + 1 < len(d):
        if (
            d[pos] == 0xFF
            and d[pos + 1] != 0x00
            and not (0xD0 <= d[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    return len(d)


def _decode_baseline_scan(
    reader: _BitReader,
    comps,
    scan: dict,
    stores,
    dc_tables: dict,
    ac_tables: dict,
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> None:
    """The sequential-DCT interleaved scan: full 64-coefficient blocks
    in MCU order, DC diff coding, run/size AC with ZRL/EOB."""
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                reader.sync_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan[c["id"]]
                dct = dc_tables[td]
                act = ac_tables[ta]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _decode_huff(reader, dct)
                        diff = _receive_extend(reader, s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError("AC index overflow")
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        stores[ci][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu_count += 1


def _decode_progressive_scan(
    reader: _BitReader,
    scan_comps,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> None:
    """One progressive SOS: accumulate into each component's zigzag
    coefficient store. ``scan_comps`` = list of (store, comp, dc_table,
    ac_table, bw, bh) where (bw, bh) are the component's
    NON-INTERLEAVED block dims (spec A.2.2: ceil(ceil(dim·ci/cmax)/8)
    — the padded MCU grid is only walked by interleaved scans).

    Implements all four progressive block codings (T.81 G.2):
    DC first (diff << Al), DC refine (one bit per block),
    AC first (EOBRUN + run/size << Al),
    AC refine (correction bits + newly-significant ±1<<Al).
    """
    interleaved = len(scan_comps) > 1
    p1 = 1 << al

    if ss == 0:
        # ---- DC scan ----
        preds = [0] * len(scan_comps)
        units = []  # flat list of (comp index, row, col) data units
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    for i, (_st, c, *_rest) in enumerate(scan_comps):
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                units.append(
                                    (i, my * c["v"] + by, mx * c["h"] + bx)
                                )
            per_mcu = sum(c["v"] * c["h"] for _s, c, *_r in scan_comps)
        else:
            _st, _c, _dc, _ac, bw, bh = scan_comps[0]
            units = [(0, r, cc) for r in range(bh) for cc in range(bw)]
            per_mcu = 1
        mcu_done = 0
        for n, (i, r, cc) in enumerate(units):
            if (
                restart_interval
                and n % per_mcu == 0
                and mcu_done
                and mcu_done % restart_interval == 0
            ):
                reader.sync_restart()
                preds = [0] * len(scan_comps)
            store, _c, dct, _ac, _bw, _bh = scan_comps[i]
            if ah == 0:
                s = _decode_huff(reader, dct)
                diff = _receive_extend(reader, s)
                preds[i] += diff
                store[r, cc, 0] = preds[i] << al
            else:
                if reader.read_bit():
                    store[r, cc, 0] |= p1
            if n % per_mcu == per_mcu - 1:
                mcu_done += 1
        return

    # ---- AC scan: exactly one component (T.81 B.2.3) ----
    if interleaved:
        raise NotImplementedError("progressive AC scan with ns > 1")
    store, _c, _dct, act, bw, bh = scan_comps[0]
    m1 = -p1
    eobrun = 0
    done = 0
    for r in range(bh):
        for cc in range(bw):
            if (
                restart_interval
                and done
                and done % restart_interval == 0
            ):
                reader.sync_restart()
                eobrun = 0
            done += 1
            zz = store[r, cc]
            if ah == 0:
                # AC first scan
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huff(reader, act)
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr < 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += reader.read_bits(rr)
                            break
                        k += 16  # ZRL
                        continue
                    k += rr
                    if k > se:
                        raise NotImplementedError("AC index overflow")
                    zz[k] = _receive_extend(reader, s) << al
                    k += 1
            else:
                # AC refinement scan (T.81 G.2 / libjpeg shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_huff(reader, act)
                        rr, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if rr < 15:
                                # refine EOBRUN INCLUDES the current
                                # block: its remaining nonzero-history
                                # coefficients still get correction
                                # bits (the tail loop below), then the
                                # decrement consumes this block — the
                                # libjpeg convention; contrast the
                                # first-scan (1<<rr)-1 where break IS
                                # the block's termination
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += reader.read_bits(rr)
                                break
                            # rr == 15: run of 16 zero-history coefs
                        else:
                            if s != 1:
                                raise NotImplementedError(
                                    "invalid refinement magnitude"
                                )
                            val = p1 if reader.read_bit() else m1
                        # advance over rr zero-history coefficients,
                        # correcting nonzero-history ones on the way
                        while k <= se:
                            if zz[k] != 0:
                                if reader.read_bit() and (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] > 0 else m1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    # EOB run: still append correction bits to every
                    # remaining nonzero-history coefficient
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] > 0 else m1
                        k += 1
                    eobrun -= 1


def decode_jpeg(payload: bytes):
    """Decode a baseline (SOF0/SOF1) or PROGRESSIVE (SOF2) JPEG.
    Returns (w, h, channels, ndarray[h,w,c]) or None if the payload
    does not start with SOI (not a JPEG). Raises NotImplementedError
    for arithmetic/hierarchical/12-bit/CMYK variants (so callers can
    fall through to the optional PIL hook). Progressive streams
    accumulate coefficients scan by scan (spectral selection AND
    successive approximation, DC and AC refinement, EOB runs,
    restart markers, tables redefined between scans) and IDCT once."""
    if not payload or payload[:2] != b"\xff\xd8":
        return None
    d = payload
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    frame = None
    scan = None
    progressive = False
    stores = None
    geo = None  # (mcux, mcuy, hmax, vmax, per-comp block dims)
    n_scans = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        seg = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    vals = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.int32)
                    i += 128
                tab = np.zeros(64, dtype=np.int32)
                tab[_UNZZ] = vals
                qtables[tq] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                i += 17 + nv
                table = _build_decode_table(bits, vals)
                (dc_tables if tc == 0 else ac_tables)[th] = table
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG not supported")
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": fw, "h": fh, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax not in (1, 2) or vmax not in (1, 2):
                raise NotImplementedError(
                    "sampling factors above 2 not supported"
                )
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            dims = []
            for c in comps:
                cw = -(-fw * c["h"] // hmax)
                ch_ = -(-fh * c["v"] // vmax)
                dims.append((-(-cw // 8), -(-ch_ // 8)))
            geo = (mcux, mcuy, hmax, vmax, dims)
            stores = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1) and progressive (SOF2) "
                "JPEG are decoded natively"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = seg[0]
            sel = []
            for si in range(ns):
                cid, tdta = seg[1 + si * 2 : 3 + si * 2]
                sel.append((cid, tdta >> 4, tdta & 0x0F))
            ss_, se_, ahal = seg[1 + ns * 2 : 4 + ns * 2]
            ah_, al_ = ahal >> 4, ahal & 0x0F
            scan = sel
            n_scans += 1
            comps = frame["comps"]
            mcux, mcuy, hmax, vmax, dims = geo
            reader = _BitReader(d, pos + 2 + seglen)
            if progressive:
                scan_comps = []
                for cid, td, ta in sel:
                    ci = next(
                        i for i, c in enumerate(comps) if c["id"] == cid
                    )
                    scan_comps.append(
                        (
                            stores[ci],
                            comps[ci],
                            dc_tables.get(td),
                            ac_tables.get(ta),
                            dims[ci][0],
                            dims[ci][1],
                        )
                    )
                _decode_progressive_scan(
                    reader, scan_comps, ss_, se_, ah_, al_,
                    restart_interval, mcux, mcuy,
                )
            else:
                _decode_baseline_scan(
                    reader,
                    comps,
                    {cid: (td, ta) for cid, td, ta in sel},
                    stores,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                    mcux,
                    mcuy,
                )
            pos = _next_marker_pos(d, reader.pos)
            continue
        pos += 2 + seglen
    if frame is None or scan is None:
        raise NotImplementedError("JPEG missing SOF/SOS")

    comps = frame["comps"]
    mcux, mcuy, hmax, vmax, dims = geo
    w, h = frame["w"], frame["h"]

    # dequantize + IDCT per component (vectorized over all blocks)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        rows, cols = stores[ci].shape[:2]
        coefs = np.zeros((rows, cols, 64), dtype=np.float64)
        coefs[:, :, _UNZZ] = stores[ci]
        coefs = coefs.reshape(rows, cols, 8, 8) * q
        pix = np.einsum("xu,ijuv,yv->ijxy", _DCT.T, coefs, _DCT.T) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8)
        # upsample to full resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return w, h, 1, out
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
    return w, h, 3, out


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:2:0",
) -> bytes:
    """Encode a PROGRESSIVE (SOF2) JFIF JPEG with the classic 4-phase
    scan script:

    1. interleaved DC first scan at Al=1 (successive approximation);
    2. interleaved DC refinement scan (Ah=1 → one bit per block);
    3. per-component AC spectral scan 1–63 at Al=0, with real EOB-run
       batching (consecutive all-zero-AC blocks collapse into EOBn
       codes — the progressive-only coding baseline JPEG lacks);
    4. (AC refinement is exercised by a hand-built conformance stream
       in tests — this encoder's script stops at Al=0 AC.)

    Quantized coefficients are identical to :func:`encode_jpeg` at the
    same settings, so progressive and baseline encodings of one image
    must DECODE IDENTICALLY — the round-trip law the tests pin."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError("encode_jpeg_progressive expects 1 or 3 channels")
    sub = subsampling == "4:2:0" and ch == 3

    qy = quality_scaled(QUANT_LUMA, quality)
    qc = quality_scaled(QUANT_CHROMA, quality)
    f = arr.astype(np.float64)
    if ch == 3:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [f[:, :, 0]]
    if sub:
        ypad = _pad_edge(planes[0], 16)
        hh, ww = ypad.shape
        chroma = []
        for p in planes[1:]:
            p = _pad_edge(p, 16)
            chroma.append(p.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3)))
        qplanes = [_fdct_quant(ypad, qy)] + [_fdct_quant(c, qc) for c in chroma]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        padded = [_pad_edge(p, 8) for p in planes]
        qplanes = [
            _fdct_quant(p, qy if i == 0 else qc) for i, p in enumerate(padded)
        ]
        samp = [(1, 1)] * ch
    # zigzag coefficient view [nby, nbx, 64]
    zplanes = [qp[:, :, _ZZ_ROWS, _ZZ_COLS] for qp in qplanes]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # non-interleaved (true) block dims per component
    dims = []
    for ci in range(ch):
        cw = -(-w * samp[ci][0] // hmax)
        ch_ = -(-h * samp[ci][1] // vmax)
        dims.append((-(-cw // 8), -(-ch_ // 8)))

    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    def dc_units():
        """Interleaved MCU order over (ci, by, bx)."""
        if ch == 1:
            nby, nbx = zplanes[0].shape[:2]
            for by in range(nby):
                for bx in range(nbx):
                    yield 0, by, bx
            return
        mcuy = zplanes[0].shape[0] // samp[0][1]
        mcux = zplanes[0].shape[1] // samp[0][0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ch):
                    hi, vi = samp[ci]
                    for sy in range(vi):
                        for sx in range(hi):
                            yield ci, my * vi + sy, mx * hi + sx

    # scan 1: DC first, Al=1
    bw1 = _BitWriter()
    preds = [0] * ch
    for ci, by, bx in dc_units():
        v = int(zplanes[ci][by, bx, 0]) >> 1
        diff = v - preds[ci]
        preds[ci] = v
        s = _category(diff)
        code, ln = (dc_y if ci == 0 else dc_c)[s]
        bw1.write(code, ln)
        if s:
            bw1.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw1.flush()

    # scan 2: DC refine, Ah=1 Al=0 — raw bits
    bw2 = _BitWriter()
    for ci, by, bx in dc_units():
        bw2.write(int(zplanes[ci][by, bx, 0]) & 1, 1)
    bw2.flush()

    # scans 3..: AC spectral 1-63 per component, EOB-run batched
    ac_scans = []
    for ci in range(ch):
        codes = ac_y if ci == 0 else ac_c
        bwx = _BitWriter()
        eobrun = 0

        def flush_eob():
            # Annex-K AC tables define only EOB0 (0x00) — the longer
            # EOBn symbols (0x10..0xE0) need custom Huffman tables, so
            # each pending block end is emitted as its own EOB0 (less
            # compact, same semantics). The decoder's EOBn>1 path is
            # conformance-tested with a hand-built custom-DHT stream.
            nonlocal eobrun
            while eobrun:
                code, ln = codes[0x00]
                bwx.write(code, ln)
                eobrun -= 1

        bwidth, bheight = dims[ci]
        for by in range(bheight):
            for bx in range(bwidth):
                zz = zplanes[ci][by, bx]
                nz = np.nonzero(zz[1:])[0]
                if nz.size == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                last = int(nz[-1]) + 1
                run = 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = codes[0xF0]
                        bwx.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = codes[(run << 4) | s]
                    bwx.write(code, ln)
                    bwx.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    eobrun += 1
        flush_eob()
        bwx.flush()
        ac_scans.append(bwx.buf)

    out = bytearray(b"\xff\xd8")
    out += _marker(
        0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
    )
    out += _marker(
        0xDB, bytes([0x00]) + qy[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    )
    if ch == 3:
        out += _marker(
            0xDB,
            bytes([0x01]) + qc[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes(),
        )
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for ci in range(ch):
        hi, vi = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1)
    out += _marker(0xC2, sof)  # SOF2: progressive
    out += _marker(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _marker(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if ch == 3:
        out += _marker(
            0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS) + bytes(DC_CHROMA_VALS)
        )
        out += _marker(
            0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS) + bytes(AC_CHROMA_VALS)
        )

    def sos(comps_sel, ss, se, ah, al):
        seg = bytes([len(comps_sel)])
        for cid, td, ta in comps_sel:
            seg += bytes([cid, (td << 4) | ta])
        seg += bytes([ss, se, (ah << 4) | al])
        return _marker(0xDA, seg)

    all_dc = [(ci + 1, 0 if ci == 0 else 1, 0) for ci in range(ch)]
    out += sos(all_dc, 0, 0, 0, 1) + bw1.buf
    out += sos(all_dc, 0, 0, 1, 0) + bw2.buf
    for ci in range(ch):
        out += sos(
            [(ci + 1, 0, 0 if ci == 0 else 1)], 1, 63, 0, 0
        ) + ac_scans[ci]
    out += b"\xff\xd9"
    return bytes(out)
