"""From-scratch GIF decoder tests: hand-assembled streams (the bit
packing is written out independently of the decoder, so these double
as a conformance check of the LSB-first variable-width code rules),
covering literal LZW with width growth, the KwKwK case, interlace
reordering, multi-frame composition, transparency, disposal=2, and
honest errors."""

import numpy as np
import pytest

from dataflowex_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
)


def _pack_lsb(codes_widths):
    bits = []
    for code, width in codes_widths:
        for i in range(width):
            bits.append((code >> i) & 1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i : i + 8]):
            b |= bit << j
        out.append(b)
    return bytes(out)


def _lzw_literal(indices, min_code_size):
    """Emit every pixel as a literal code, tracking the decoder's
    dictionary growth so widths match."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    next_code = clear + 2
    seq = [(clear, width)]
    prev = False
    for s in indices:
        seq.append((s, width))
        if prev:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = True
    seq.append((eoi, width))
    return _pack_lsb(seq)


def _sub_blocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


PALETTE = bytes(
    [0, 0, 0,  255, 0, 0,  0, 255, 0,  0, 0, 255]  # K R G B
)


def _gif(frames, w, h, gce=None, interlace_flags=None, trailer=True):
    """Assemble a GIF89a: global 4-color table, then (left, top, fw,
    fh, indices) frames; `gce` maps frame index -> raw 4-byte GCE
    payload."""
    out = bytearray(b"GIF89a")
    out += bytes([w & 255, w >> 8, h & 255, h >> 8])
    out.append(0x80 | 0x01)  # GCT present, size field 1 -> 4 colors
    out += bytes([0, 0])  # bg index 0, no aspect
    out += PALETTE
    for i, (left, top, fw, fh, idx) in enumerate(frames):
        if gce and i in gce:
            out += bytes([0x21, 0xF9, 4]) + gce[i] + bytes([0])
        out.append(0x2C)
        out += bytes(
            [left & 255, left >> 8, top & 255, top >> 8,
             fw & 255, fw >> 8, fh & 255, fh >> 8]
        )
        out.append((interlace_flags or {}).get(i, 0))
        out.append(2)  # LZW min code size
        out += _sub_blocks(_lzw_literal(idx, 2))
    if trailer:
        out.append(0x3B)
    return bytes(out)


def test_single_frame_literal_lzw_with_width_growth():
    # 3x3: enough pixels that next_code crosses 8 and width grows to 4
    idx = [0, 1, 2, 3, 0, 1, 2, 3, 1]
    w_, h_, ch, arr = decode_gif(_gif([(0, 0, 3, 3, idx)], 3, 3))
    assert (w_, h_, ch) == (3, 3, 3)
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    want = pal[np.array(idx).reshape(3, 3)]
    assert np.array_equal(arr, want)


def test_lzw_kwkwk_dictionary_case():
    # hand-built compressed stream: CLEAR,1,6,7,EOI decodes to [1]*6
    codes = [(4, 3), (1, 3), (6, 3), (7, 3), (5, 4)]  # width grows at 7->8
    data = _pack_lsb(codes)
    out = bytearray(b"GIF89a")
    out += bytes([6, 0, 1, 0, 0x81, 0, 0]) + PALETTE
    out += bytes([0x2C, 0, 0, 0, 0, 6, 0, 1, 0, 0, 2])
    out += _sub_blocks(data) + bytes([0x3B])
    _, _, _, arr = decode_gif(bytes(out))
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(arr, np.tile(pal[1], (1, 6, 1)))


def test_interlaced_rows_reordered():
    # 1x8 column image, interlaced: storage order is rows 0,4,2,6,1,3,5,7
    stored = [0, 1, 2, 3, 0, 1, 2, 3]
    g = _gif(
        [(0, 0, 1, 8, stored)], 1, 8, interlace_flags={0: 0x40}
    )
    _, _, _, arr = decode_gif(g)
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    # pass order: y=0,4 then 2,6 then 1,3,5,7 (no 8-row second pass rows)
    # stored row k lands at display row order[k]
    display = [None] * 8
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    for k, y in enumerate(order):
        display[y] = stored[k]
    want = pal[np.array(display).reshape(8, 1)]
    assert np.array_equal(arr, want)


def test_multiframe_composition_transparency_disposal():
    # frame 0: full 2x2 red; frame 1: 1x1 green at (1,1) with
    # transparency on index 0 and disposal=2 (restore bg after)
    f0 = (0, 0, 2, 2, [1, 1, 1, 1])
    f1 = (1, 1, 1, 1, [2])
    f2 = (0, 0, 1, 1, [3])
    gce = {1: bytes([(2 << 2) | 1, 0, 0, 0])}  # disposal=2, transp idx 0
    frames = decode_gif_frames(_gif([f0, f1, f2], 2, 2, gce=gce))
    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    assert len(frames) == 3
    assert np.array_equal(frames[0], np.tile(pal[1], (2, 2, 1)))
    # frame 1: green painted over red at (1,1)
    assert np.array_equal(frames[1][1, 1], pal[2])
    assert np.array_equal(frames[1][0, 0], pal[1])
    # frame 2: disposal=2 restored (1,1) to background (black), new
    # blue pixel at (0,0)
    assert np.array_equal(frames[2][0, 0], pal[3])
    assert np.array_equal(frames[2][1, 1], pal[0])


def test_honest_errors():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF" + bytes(20))
    with pytest.raises(NotImplementedError, match="disposal"):
        gce = {0: bytes([(3 << 2), 0, 0, 0])}
        decode_gif(_gif([(0, 0, 1, 1, [1])], 1, 1, gce=gce))
    with pytest.raises(ValueError, match="truncated|unexpected"):
        decode_gif(_gif([(0, 0, 1, 1, [1])], 1, 1, trailer=False))


def test_gif_through_spark_decode_and_frame_sampling(spark):
    """Integration: a GIF payload decodes through the media feature
    path, and an animated GIF fans out through sample_frames with
    per-frame netpbm payloads that re-decode to the composited
    frames."""
    from pyspark.sql import Row

    from dataflowex_spark.operators import multimodal

    pal = np.frombuffer(PALETTE, dtype=np.uint8).reshape(4, 3)
    g = _gif(
        [(0, 0, 2, 2, [1, 1, 1, 1]), (0, 0, 2, 2, [2, 2, 2, 2]),
         (0, 0, 2, 2, [3, 3, 3, 3])],
        2, 2,
    )
    d = multimodal.decode_image(g)
    assert (d["width"], d["height"], d["channels"]) == (2, 2, 3)
    assert np.array_equal(d["pixels"][0, 0], pal[1])

    rows = [
        Row(media=Row(uri="mem://anim.gif", media_type="image/gif",
                      payload=bytearray(g), meta={})),
    ]
    df = spark.createDataFrame(
        rows, schema=f"media struct<{multimodal.MEDIA_SCHEMA}>"
    )
    out = multimodal.sample_frames(df, every_n=2, max_frames=4).collect()
    got = {r.frame_index: bytes(r.frame) for r in out}
    assert set(got) == {0, 2}  # frames 0 and 2 of 3
    f2 = multimodal.decode_image(got[2])
    assert np.array_equal(f2["pixels"][1, 1], pal[3])


def test_gif_garbage_header_rejects_without_canvas_allocation():
    """A payload that merely starts with 'GIF8' must be REJECTED by
    structural parsing before any canvas allocation: garbage header
    bytes decode to huge logical-screen dims (here ~28k x ~30k — a
    2.5 GB canvas) and the quarantine path used to stall minutes per
    junk payload allocating it (r12). Must raise promptly instead."""
    import time

    import pytest as _pytest

    from dataflowex_spark.operators.gif import decode_gif

    t0 = time.time()
    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a not decodable")
    assert time.time() - t0 < 10.0
