"""Native baseline JPEG codec tests (operators/jpeg.py) and its
integration with the multimodal mapInPandas plumbing.

Real compressed payloads are SYNTHESIZED by our own encoder (standard
Annex-K tables, real Huffman entropy coding, real DCT) and decoded by
our own decoder — no imaging library involved on either side, so the
compressed-media path is exercised for real in this container.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from dataflowex_spark.operators import multimodal
from dataflowex_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    quality_scaled,
    QUANT_LUMA,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_jpeg_roundtrip_rgb(sub):
    img = _gradient(40, 56)
    payload = encode_jpeg(img, quality=90, subsampling=sub)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    w, h, ch, dec = decode_jpeg(payload)
    assert (w, h, ch) == (56, 40, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth gradient at q90 reconstructs closely; 4:2:0 loses chroma
    assert err.max() <= (4 if sub == "4:4:4" else 8)
    assert err.mean() < 2.0


def test_jpeg_roundtrip_gray_and_odd_dims():
    g = _gradient(33, 41)[:, :, :1]
    w, h, ch, dec = decode_jpeg(encode_jpeg(g, quality=90))
    assert (w, h, ch) == (41, 33, 1)
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 3

    # odd dims force edge padding in both 8- and 16-multiple grids
    img = _gradient(33, 41)
    for sub in ("4:4:4", "4:2:0"):
        w, h, ch, dec = decode_jpeg(encode_jpeg(img, quality=85, subsampling=sub))
        assert (w, h, ch) == (41, 33, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3.0


@pytest.mark.parametrize("ri", [1, 5])
def test_jpeg_restart_markers(ri):
    """DRI/RSTn: encoder emits restart markers, decoder resyncs and
    resets DC prediction at each — bit-exact vs the no-restart path."""
    img = _gradient(48, 64)
    plain = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0"))[3]
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=90, subsampling="4:2:0", restart_interval=ri)
    )[3]
    assert np.array_equal(plain, with_rst)


def test_jpeg_noise_stress_and_byte_stuffing():
    """Dense random content maximizes entropy-coded 0xFF bytes (byte
    stuffing) and long AC runs (ZRL); decode must still parse and
    reconstruct within quantization error."""
    rng = np.random.RandomState(11)
    noise = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
    payload = encode_jpeg(noise, quality=95, subsampling="4:4:4")
    assert b"\xff\x00" in payload  # stuffing actually happened
    _, _, _, dec = decode_jpeg(payload)
    assert np.abs(dec.astype(int) - noise.astype(int)).mean() < 8.0


def test_jpeg_rejects_out_of_scope_variants():
    assert decode_jpeg(b"P6 1 1 255 xyz") is None  # not a JPEG at all
    # progressive (SOF2) decodes natively since r5 — the still-out-of-
    # scope class is arithmetic coding (SOF9)
    arith = b"\xff\xd8\xff\xc9" + bytes([0, 8]) + bytes(6) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="sequential|progressive"):
        decode_jpeg(arith)
    headerless = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(headerless)


def test_jpeg_quality_scaling_monotone():
    q10 = quality_scaled(QUANT_LUMA, 10)
    q50 = quality_scaled(QUANT_LUMA, 50)
    q95 = quality_scaled(QUANT_LUMA, 95)
    assert (q10 >= q50).all() and (q50 >= q95).all()
    assert q95.min() >= 1 and q10.max() <= 255
    # lower quality → smaller payload
    img = _gradient(32, 32)
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, quality=90))


def test_jpeg_through_decode_image_dispatch():
    """decode_image recognizes JPEG after netpbm/PNG probes."""
    img = _gradient(24, 16)
    d = multimodal.decode_image(encode_jpeg(img, quality=92, subsampling="4:4:4"))
    assert (d["width"], d["height"], d["channels"]) == (16, 24, 3)
    assert np.abs(d["pixels"].astype(int) - img.astype(int)).mean() < 2.0


def test_jpeg_spark_features_and_resize(spark):
    """End-to-end through the Spark plumbing: JPEG payloads decode to
    true dimensions in extract_media_features(real_decode=True) and
    re-size through resize_images — exactly like the netpbm/PNG paths."""
    rows = [
        Row(
            media=Row(
                uri=f"mem://jpg{i}",
                media_type="image/jpeg",
                payload=bytearray(
                    encode_jpeg(
                        _gradient(9 + i, 16 + i),
                        quality=90,
                        subsampling="4:2:0" if i % 2 else "4:4:4",
                    )
                ),
                meta={},
            )
        )
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, schema=f"media struct<{multimodal.MEDIA_SCHEMA}>"
    )
    feats = {
        r.uri: (r.width, r.height)
        for r in multimodal.extract_media_features(df, real_decode=True).collect()
    }
    assert feats == {f"mem://jpg{i}": (16 + i, 9 + i) for i in range(3)}

    resized = multimodal.resize_images(df, width=8, height=4).collect()
    assert len(resized) == 3
    for r in resized:
        d = multimodal.decode_image(bytes(r.payload))
        assert (d["width"], d["height"]) == (8, 4)


def test_phash_invariance_and_discrimination(spark):
    """pHash must be stable under lossy JPEG re-encode (few Hamming
    bits) and far for genuinely different images; undecodable rows
    quarantine with ok=false."""
    from dataflowex_spark.operators.jpeg import decode_jpeg
    from pyspark.sql import Row

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, size=(48, 48, 3)).astype(np.float64)
    for _ in range(3):
        base[1:-1, 1:-1] = (
            base[:-2, 1:-1] + base[2:, 1:-1]
            + base[1:-1, :-2] + base[1:-1, 2:] + base[1:-1, 1:-1]
        ) / 5
    img = np.clip(base, 0, 255).astype(np.uint8)
    reenc = decode_jpeg(encode_jpeg(img, quality=85))[3]
    other = np.roll(img, 17, axis=0)[::-1].copy()

    rows = [
        Row(media=Row(uri="orig", media_type="image/x-portable-pixmap",
                      payload=bytearray(multimodal.encode_ppm(img)), meta={})),
        Row(media=Row(uri="reenc", media_type="image/x-portable-pixmap",
                      payload=bytearray(multimodal.encode_ppm(reenc)), meta={})),
        Row(media=Row(uri="other", media_type="image/x-portable-pixmap",
                      payload=bytearray(multimodal.encode_ppm(other)), meta={})),
        Row(media=Row(uri="junk", media_type="image/gif",
                      payload=bytearray(b"GIF89a not decodable"), meta={})),
    ]
    df = spark.createDataFrame(
        rows, schema=f"media struct<{multimodal.MEDIA_SCHEMA}>"
    )
    got = {r.uri: r for r in multimodal.phash_images(df).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert got["orig"].ok and got["reenc"].ok and got["other"].ok
    assert ham(got["orig"].phash, got["reenc"].phash) <= 10
    assert ham(got["orig"].phash, got["other"].phash) >= 14
    assert got["junk"].ok is False and got["junk"].phash is None


def test_jpeg_roundtrip_property_random():
    """Randomized codec properties (no Spark needed):

    1. For ARBITRARY content, dims, subsampling, quality, and restart
       intervals: the bitstream parses and dimensions round-trip
       exactly (structural soundness — no size/mode combination can
       corrupt the MCU geometry).
    2. At high quality without chroma loss (q≥92, 4:4:4) the pixel
       error is tightly bounded even for pure noise, the codec's
       hardest content (quantization steps are small at q≥92)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        h=st.integers(8, 40),
        w=st.integers(8, 40),
        ch=st.sampled_from([1, 3]),
        sub=st.sampled_from(["4:4:4", "4:2:0"]),
        q=st.integers(35, 98),
        ri=st.sampled_from([0, 0, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check_structural(h, w, ch, sub, q, ri, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        payload = encode_jpeg(img, quality=q, subsampling=sub, restart_interval=ri)
        dw, dh, dch, dec = decode_jpeg(payload)
        assert (dw, dh, dch) == (w, h, ch)
        assert dec.dtype == np.uint8 and dec.shape == (h, w, ch)

    @settings(max_examples=10, deadline=None)
    @given(
        h=st.integers(8, 32),
        w=st.integers(8, 32),
        ch=st.sampled_from([1, 3]),
        q=st.integers(92, 98),
        seed=st.integers(0, 2**31 - 1),
    )
    def check_high_quality(h, w, ch, q, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        _, _, _, dec = decode_jpeg(encode_jpeg(img, quality=q, subsampling="4:4:4"))
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 10.0
        assert err.max() < 70

    check_structural()
    check_high_quality()


def test_jpeg_422_decode_path():
    """4:2:2 chroma subsampling (h=2, v=1 — the broadcast-video
    flavor our encoder doesn't emit): handcraft a conformant stream
    with the codec's own primitives and verify the decoder's
    horizontal-only upsampling path reconstructs it."""
    import struct

    from dataflowex_spark.operators import jpeg as J

    def encode_422(arr, quality=92):
        h, w, _ = arr.shape
        qy = J.quality_scaled(J.QUANT_LUMA, quality)
        qc = J.quality_scaled(J.QUANT_CHROMA, quality)
        f = arr.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        ypad = J._pad_edge(y, 16)
        chroma = []
        for p in (cb, cr):
            pp = J._pad_edge(p, 16)
            chroma.append(pp.reshape(pp.shape[0], pp.shape[1] // 2, 2).mean(axis=2))
        qp_y = J._fdct_quant(ypad, qy)
        qp_c = [J._fdct_quant(c, qc) for c in chroma]
        dc_y = J._build_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
        ac_y = J._build_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
        dc_c = J._build_codes(J.DC_CHROMA_BITS, J.DC_CHROMA_VALS)
        ac_c = J._build_codes(J.AC_CHROMA_BITS, J.AC_CHROMA_VALS)
        bw = J._BitWriter()
        preds = [0, 0, 0]
        for my in range(qp_y.shape[0]):
            for mx in range(qp_y.shape[1] // 2):
                for sx in range(2):
                    preds[0] = J._encode_block(
                        bw, qp_y[my, mx * 2 + sx], preds[0], dc_y, ac_y
                    )
                for ci in (1, 2):
                    preds[ci] = J._encode_block(
                        bw, qp_c[ci - 1][my, mx], preds[ci], dc_c, ac_c
                    )
        bw.flush()
        out = bytearray(b"\xff\xd8")
        out += J._marker(
            0xE0, b"JFIF\x00" + struct.pack(">BBBHHBB", 1, 1, 0, 1, 1, 0, 0)
        )
        zz = lambda q: q[J._ZZ_ROWS, J._ZZ_COLS].astype(np.uint8).tobytes()  # noqa: E731
        out += J._marker(0xDB, bytes([0]) + zz(qy))
        out += J._marker(0xDB, bytes([1]) + zz(qc))
        sof = struct.pack(">BHHB", 8, h, w, 3)
        sof += struct.pack(">BBB", 1, (2 << 4) | 1, 0)  # Y: h=2, v=1
        sof += struct.pack(">BBB", 2, (1 << 4) | 1, 1)
        sof += struct.pack(">BBB", 3, (1 << 4) | 1, 1)
        out += J._marker(0xC0, sof)
        out += J._marker(
            0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS)
        )
        out += J._marker(
            0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS)
        )
        out += J._marker(
            0xC4,
            bytes([0x01]) + bytes(J.DC_CHROMA_BITS) + bytes(J.DC_CHROMA_VALS),
        )
        out += J._marker(
            0xC4,
            bytes([0x11]) + bytes(J.AC_CHROMA_BITS) + bytes(J.AC_CHROMA_VALS),
        )
        out += J._marker(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        out += bw.buf + b"\xff\xd9"
        return bytes(out)

    img = _gradient(16, 32)
    w, h, ch, dec = decode_jpeg(encode_422(img))
    assert (w, h, ch) == (32, 16, 3)
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 10 and err.mean() < 3.0


def test_progressive_roundtrip_equals_baseline():
    """Progressive (SOF2) and baseline encodings of one image carry
    IDENTICAL quantized coefficients, so they must decode to
    bit-identical pixels — gray, 4:4:4 and 4:2:0, including odd sizes
    that give the luma plane more padded MCU blocks than its
    non-interleaved scan dims (the A.2.2 trap)."""
    from dataflowex_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.RandomState(21)
    cases = [
        ((40, 56, 3), "4:4:4"),
        ((41, 49, 3), "4:2:0"),  # odd: padded grid > scan dims
        ((24, 17, 1), "4:4:4"),
    ]
    for shape, ss in cases:
        img = rng.randint(0, 256, size=shape).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=80, subsampling=ss))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=80, subsampling=ss)
        )
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3]), (shape, ss)


def test_progressive_ac_successive_approximation_conformance():
    """Hand-built SOF2 stream exercising AC successive approximation:
    first AC scan at Al=1 (coefficients >>1), then the Ah=1->Al=0
    REFINEMENT scan — correction bits on already-nonzero history,
    a newly-significant +-1 insertion, and an EOB that must still
    apply correction bits to the rest of the current block. Expected
    pixels computed independently from the target coefficients."""
    import struct

    from dataflowex_spark.operators.jpeg import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _DCT,
        _UNZZ,
        _build_codes,
        _marker,
    )

    dc = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    def put(bw, codes, sym):
        c, ln = codes[sym]
        bw.write(c, ln)

    # scan 1: DC(0,0,Ah=0,Al=0) — DC = 16 (category 5)
    s1 = _BitWriter()
    put(s1, dc, 5)
    s1.write(16, 5)
    s1.flush()
    # scan 2: AC first (1,63,0,1): zigzag k1=+2, k2=-3, EOB
    s2 = _BitWriter()
    put(s2, ac, 0x02)           # r=0, s=2
    s2.write(2, 2)              # +2
    put(s2, ac, 0x02)
    s2.write(0, 2)              # -3 (extend: -3 + 3 = 0)
    put(s2, ac, 0x00)           # EOB
    s2.flush()
    # scan 3: AC refine (1,63,1,0): k1 4->5 (corr 1), k2 -6 (corr 0),
    # newly significant +1 at k4 after skipping one zero-history (k3)
    s3 = _BitWriter()
    put(s3, ac, 0x11)           # r=1 zero-history skip, s=1
    s3.write(1, 1)              # sign: positive
    s3.write(1, 1)              # correction for k1: 4 -> 5
    s3.write(0, 1)              # correction for k2: -6 stays
    put(s3, ac, 0x00)           # EOB1: tail-corrects rest (no bits)
    s3.flush()

    qt = bytes([0x00]) + bytes([1] * 64)  # quant table: all ones
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + _marker(0xDB, qt)
        + _marker(0xC2, sof)
        + _marker(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + _marker(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        + _marker(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes(s1.buf)
        + _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + bytes(s2.buf)
        + _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + bytes(s3.buf)
        + b"\xff\xd9"
    )
    w, h, ch, got = decode_jpeg(payload)
    assert (w, h, ch) == (8, 8, 1)

    zz = np.zeros(64)
    zz[0], zz[1], zz[2], zz[4] = 16, 5, -6, 1
    coefs = np.zeros(64)
    coefs[_UNZZ] = zz
    pix = (
        np.einsum("xu,uv,yv->xy", _DCT.T, coefs.reshape(8, 8), _DCT.T)
        + 128.0
    )
    want = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], want)


def test_progressive_eobrun_multiblock_conformance():
    """EOB runs spanning MULTIPLE blocks, first-scan and refine-scan
    conventions both: a custom AC Huffman table supplies the EOBn>0
    symbol (0x10) Annex-K baseline tables lack. 4 blocks: the first
    carries one AC coefficient refined 4->5; an EOB2+ext run ends it
    and skips the rest — in the refine scan the run must still apply
    the first block's correction bit before skipping."""
    import struct

    from dataflowex_spark.operators.jpeg import (
        DC_LUMA_BITS,
        DC_LUMA_VALS,
        _BitWriter,
        _DCT,
        _UNZZ,
        _build_codes,
        _marker,
    )

    AC_BITS = [0, 0, 6] + [0] * 13  # six 3-bit codes
    AC_VALS = [0x00, 0x10, 0x01, 0x02, 0x11, 0xF0]
    ac = _build_codes(AC_BITS, AC_VALS)
    dc = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)

    def put(bw, codes, sym):
        c, ln = codes[sym]
        bw.write(c, ln)

    s1 = _BitWriter()  # DC scan: 4 blocks, all zero diffs
    for _ in range(4):
        put(s1, dc, 0)
    s1.flush()

    s2 = _BitWriter()  # AC first (Al=1): blk0 k1=+2, EOB2(ext=1), EOB0
    put(s2, ac, 0x02)
    s2.write(2, 2)          # +2
    put(s2, ac, 0x10)       # EOBn, rr=1
    s2.write(1, 1)          # ext -> eobrun=(1<<1)-1+1=2 (blk0 end + 2)
    put(s2, ac, 0x00)       # blk3: EOB0
    s2.flush()

    s3 = _BitWriter()  # AC refine (Ah=1): EOBn covering 3 blocks
    put(s3, ac, 0x10)       # rr=1 -> eobrun=(1<<1)+ext
    s3.write(1, 1)          # ext -> 3 (blocks 0..2)
    s3.write(1, 1)          # blk0 tail correction: k1 4 -> 5
    put(s3, ac, 0x00)       # blk3: EOB1, no corrections
    s3.flush()

    sof = struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + _marker(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _marker(0xC2, sof)
        + _marker(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + _marker(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
        + _marker(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes(s1.buf)
        + _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + bytes(s2.buf)
        + _marker(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + bytes(s3.buf)
        + b"\xff\xd9"
    )
    w, h, ch, got = decode_jpeg(payload)
    assert (w, h, ch) == (32, 8, 1)

    zz = np.zeros(64)
    zz[1] = 5
    coefs = np.zeros(64)
    coefs[_UNZZ] = zz
    pix = (
        np.einsum("xu,uv,yv->xy", _DCT.T, coefs.reshape(8, 8), _DCT.T)
        + 128.0
    )
    blk0 = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :8, 0], blk0)
    assert (got[:, 8:, 0] == 128).all()  # skipped blocks: DC-only gray
