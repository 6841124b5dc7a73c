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
    prog = b"\xff\xd8\xff\xc2" + bytes([0, 8]) + bytes(6) + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(prog)
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
