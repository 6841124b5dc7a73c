"""From-scratch GIF decoder (GIF87a/GIF89a): header + color tables,
extension handling, full variable-width LZW decompression, interlace
reordering, multi-frame composition with transparency — pure
stdlib + numpy, no imaging library.

Joins the repo's real-codec family (baseline JPEG in ``jpeg.py``, PNG
and netpbm in ``multimodal.py``, PCM-WAV audio): GIF is the one
common web-crawl image format those left uncovered, and — being an
ANIMATION container — it also feeds the video frame-sampling path
(`multimodal.sample_frames`) with real decoded frames.

Scope (honest edges, same policy as the other codecs):
- full LZW (variable code width 3–12 bits, CLEAR/EOI, dict growth) —
  the actual compression, not the "uncompressed GIF" subset;
- interlaced images de-interlaced (the 8/8/4/2 row passes);
- multi-frame: frames composite onto the logical screen canvas
  honoring the GCE transparency index; disposal methods 0/1 (keep)
  and 2 (restore-to-background) are implemented, 3 (restore-to-
  previous) raises NotImplementedError;
- no GIF writer — tests hand-assemble streams bit by bit, which
  doubles as an independent check of the bit-packing rules.

Like the other codecs this never touches Spark: `multimodal` calls it
inside Arrow-batched `mapInPandas`, so decode runs executor-side and
frames never cross a shuffle.
"""

from __future__ import annotations

import numpy as np


class _ByteReader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.d):
            raise ValueError("gif: truncated stream")
        out = self.d[self.pos : self.pos + n]
        self.pos += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        b = self.take(2)
        return b[0] | (b[1] << 8)

    def sub_blocks(self) -> bytes:
        """Concatenate data sub-blocks (length-prefixed, 0-terminated)."""
        parts = []
        while True:
            n = self.u8()
            if n == 0:
                return b"".join(parts)
            parts.append(self.take(n))


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: codes packed LSB-first, width starts at
    min_code_size+1 and grows with the dictionary up to 12 bits;
    CLEAR resets, EOI terminates."""
    clear = 1 << min_code_size
    eoi = clear + 1

    # bit cursor over the little-endian bitstream
    nbits = len(data) * 8
    bitpos = 0

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte = bitpos >> 3
        shift = bitpos & 7
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        bitpos += width
        return (chunk >> shift) & ((1 << width) - 1)

    def reset():
        return (
            {i: (i,) for i in range(clear)},
            min_code_size + 1,
            clear + 2,
        )

    table, width, next_code = reset()
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        code = read_code(width)
        if code is None or code == eoi:
            return out
        if code == clear:
            table, width, next_code = reset()
            prev = None
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"gif: bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.empty(h, dtype=np.int64)
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            order[y] = i
            i += 1
    return rows[order]


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF to full-logical-screen RGB arrays
    (uint8 [h, w, 3]), composited in order with transparency and
    disposal semantics applied."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    r = _ByteReader(payload)
    r.take(6)
    width, height = r.u16(), r.u16()
    packed = r.u8()
    bg_index = r.u8()
    r.u8()  # aspect ratio
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(r.take(3 * n), dtype=np.uint8).reshape(n, 3)

    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    # canvas allocation is DEFERRED to the first image descriptor:
    # a garbage payload that happens to start with "GIF8" yields junk
    # width/height here (e.g. ~28k x ~30k = a 2.5 GB allocation) and
    # used to stall the quarantine path for minutes before the block
    # parse rejected it; structural validation must come first.
    canvas: np.ndarray | None = None

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        block = r.u8()
        if block == 0x3B:  # trailer
            return frames
        if block == 0x21:  # extension
            label = r.u8()
            data = r.sub_blocks()
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if (flags & 1) else None
                if disposal == 3:
                    raise NotImplementedError(
                        "gif: disposal=3 (restore-to-previous) not supported"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unexpected block 0x{block:02x}")

        left, top = r.u16(), r.u16()
        fw, fh = r.u16(), r.u16()
        ipacked = r.u8()
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = np.frombuffer(r.take(3 * n), dtype=np.uint8).reshape(n, 3)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("gif: image has no color table")

        min_code = r.u8()
        indices = _lzw_decode(r.sub_blocks(), min_code)
        if len(indices) < fw * fh:
            raise ValueError("gif: LZW underrun")
        if canvas is None:
            canvas = np.empty((height, width, 3), dtype=np.uint8)
            canvas[:] = bg_rgb
        idx = np.asarray(indices[: fw * fh], dtype=np.int32).reshape(fh, fw)
        if ipacked & 0x40:
            idx = _deinterlace(idx)

        region = canvas[top : top + fh, left : left + fw]
        rgb = palette[np.clip(idx, 0, len(palette) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())

        if disposal == 2:  # restore region to background
            canvas[top : top + fh, left : left + fw] = bg_rgb
        transparent = None
        disposal = 0


def decode_gif(payload: bytes):
    """First frame as the (w, h, channels, ndarray) tuple the other
    image codecs return — the single-image entry point."""
    frames = decode_gif_frames(payload)
    if not frames:
        raise ValueError("gif: no frames")
    arr = frames[0]
    h, w, ch = arr.shape
    return w, h, ch, arr
