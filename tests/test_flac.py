"""FLAC decoder conformance over hand-assembled streams: the encoder
below is written INDEPENDENTLY from the public spec (bit-writer up,
its own CRC8/CRC16, its own Rice packer) — conformance-by-
construction, like test_gif/test_tiff. FLAC is lossless, so every
round-trip asserts EXACT sample equality, covering: verbatim /
constant / fixed / LPC subframes, Rice partitions (orders 0–2, both
methods, escape partitions), wasted bits, all four channel
assignments, multi-frame streams, UTF-8 frame numbers, and honest
errors (bad CRC, truncation, >24-bit)."""

from __future__ import annotations

import numpy as np
import pytest

from dataflowex_spark.operators.flac import decode_flac


class _W:
    """MSB-first bit writer."""

    def __init__(self):
        self.bits: list[int] = []

    def w(self, value: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def ws(self, value: int, n: int):
        self.w(value & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def _crc_poly(data: bytes, width: int, poly: int) -> int:
    """Plain long-division CRC (init 0, no reflection) — the form the
    FLAC spec uses for both CRC-8 (poly 0x07) and CRC-16 (0x8005)."""
    reg = 0
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for byte in data:
        for i in range(7, -1, -1):
            inbit = (byte >> i) & 1
            msb = (reg & top) and 1
            reg = (reg << 1) & mask
            if msb ^ inbit:
                reg ^= poly
    return reg


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    n_extra = 1
    while n >= (1 << (6 * n_extra + (6 - n_extra))):
        n_extra += 1
    head_bits = 6 - n_extra
    parts = []
    v = n
    for _ in range(n_extra):
        parts.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (head_bits + 1)) & 0xFF | v
    out = [lead] + parts[::-1]
    return bytes(out)


def _rice_encode(w: _W, values: list[int], param: int):
    for v in values:
        # zigzag: positive -> 2v, negative -> -2v-1
        z = (v << 1) if v >= 0 else (((-v) << 1) - 1)
        q, r = z >> param, z & ((1 << param) - 1)
        for _ in range(q):
            w.w(0, 1)
        w.w(1, 1)
        if param:
            w.w(r, param)


def _streaminfo(rate: int, channels: int, bps: int, total: int) -> bytes:
    w = _W()
    w.w(4096, 16)
    w.w(4096, 16)
    w.w(0, 24)
    w.w(0, 24)
    w.w(rate, 20)
    w.w(channels - 1, 3)
    w.w(bps - 1, 5)
    w.w(total, 36)
    body = w.bytes() + bytes(16)  # md5 zeroed (not verified)
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _frame(
    subframe_writers,
    block_size: int,
    ch_code: int,
    frame_no: int = 0,
    bs_code_and_extra=None,
) -> bytes:
    """Assemble one frame: header (+CRC8), subframes, pad, CRC16."""
    w = _W()
    w.w(0x3FFE, 14)
    w.w(0, 1)
    w.w(0, 1)  # fixed blocksize strategy
    if bs_code_and_extra is None:
        bs_code_and_extra = (6, [(block_size - 1, 8)])
    w.w(bs_code_and_extra[0], 4)
    w.w(0, 4)  # sample rate from streaminfo
    w.w(ch_code, 4)
    w.w(0, 3)  # sample size from streaminfo
    w.w(0, 1)
    hdr_partial = w.bytes()
    hdr_partial += _utf8_number(frame_no)
    for val, nbits in bs_code_and_extra[1]:
        assert nbits % 8 == 0
        hdr_partial += val.to_bytes(nbits // 8, "big")
    hdr = hdr_partial + bytes([_crc_poly(hdr_partial, 8, 0x07)])

    body = _W()
    for sub in subframe_writers:
        sub(body)
    frame = hdr + body.bytes()
    return frame + _crc_poly(frame, 16, 0x8005).to_bytes(2, "big")


def _sub_verbatim(samples, bps):
    def go(w: _W):
        w.w(0, 1)
        w.w(1, 6)
        w.w(0, 1)  # no wasted bits
        for s in samples:
            w.ws(s, bps)

    return go


def _sub_constant(value, bps):
    def go(w: _W):
        w.w(0, 1)
        w.w(0, 6)
        w.w(0, 1)
        w.ws(value, bps)

    return go


def _sub_fixed(samples, order, bps, param, po=0, escape_last=False):
    """Fixed-order subframe: warmup + Rice residual (partition order
    po; optionally the LAST partition is an escape partition)."""
    coefs = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[
        order
    ]
    resid = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        resid.append(samples[i] - pred)

    def go(w: _W):
        w.w(0, 1)
        w.w(8 + order, 6)
        w.w(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        w.w(0, 2)  # 4-bit rice method
        w.w(po, 4)
        n_part = 1 << po
        idx = 0
        for p in range(n_part):
            n = (len(samples) >> po) - (order if p == 0 else 0)
            chunk = resid[idx : idx + n]
            idx += n
            if escape_last and p == n_part - 1:
                w.w(15, 4)
                raw = max(
                    (abs(v).bit_length() + 1 for v in chunk), default=1
                )
                w.w(raw, 5)
                for v in chunk:
                    w.ws(v, raw)
            else:
                w.w(param, 4)
                _rice_encode(w, chunk, param)

    return go


def _sub_lpc(samples, coefs, shift, bps, param=6, precision=12):
    order = len(coefs)
    resid = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        resid.append(samples[i] - (acc >> shift))

    def go(w: _W):
        w.w(0, 1)
        w.w(32 + order - 1, 6)
        w.w(0, 1)
        for s in samples[:order]:
            w.ws(s, bps)
        w.w(precision - 1, 4)
        w.ws(shift, 5)
        for c in coefs:
            w.ws(c, precision)
        w.w(1, 2)  # 5-bit rice2 method, for coverage
        w.w(0, 4)
        w.w(param, 5)
        _rice_encode(w, resid, param)

    return go


def _sub_wasted(samples, bps, wasted):
    """Verbatim subframe with ``wasted`` trailing zero bits dropped."""

    def go(w: _W):
        w.w(0, 1)
        w.w(1, 6)
        w.w(1, 1)
        for _ in range(wasted - 1):
            w.w(0, 1)
        w.w(1, 1)
        for s in samples:
            w.ws(s >> wasted, bps - wasted)

    return go


def _sine(n, period, amp, phase=0.0):
    return [
        int(round(amp * np.sin(2 * np.pi * (i + phase) / period)))
        for i in range(n)
    ]


def test_verbatim_and_constant_roundtrip():
    n = 64
    left = _sine(n, 17, 1000)
    data = _streaminfo(8000, 2, 16, n) + _frame(
        [_sub_verbatim(left, 16), _sub_constant(-42, 16)], n, 1
    )
    d = decode_flac(data)
    assert (d["sample_rate"], d["channels"], d["bits"]) == (8000, 2, 16)
    assert d["n_samples"] == n
    assert d["samples"][:, 0].tolist() == left
    assert d["samples"][:, 1].tolist() == [-42] * n


def test_fixed_orders_rice_partitions_and_escape():
    n = 128
    for order in (0, 1, 2, 3, 4):
        sig = _sine(n, 31, 5000)
        data = _streaminfo(16000, 1, 16, n) + _frame(
            [_sub_fixed(sig, order, 16, param=7, po=2, escape_last=True)],
            n,
            0,
        )
        d = decode_flac(data)
        assert d["samples"][:, 0].tolist() == sig, f"order {order}"


def test_lpc_subframe_roundtrip():
    n = 96
    sig = _sine(n, 23, 3000)
    # arbitrary quantized predictor; residuals computed to match
    coefs = [900, -300, 120]
    data = _streaminfo(22050, 1, 16, n) + _frame(
        [_sub_lpc(sig, coefs, shift=9, bps=16)], n, 0
    )
    d = decode_flac(data)
    assert d["samples"][:, 0].tolist() == sig


def test_stereo_decorrelation_modes_exact():
    n = 64
    left = _sine(n, 13, 7000)
    right = _sine(n, 19, 6500, phase=3.0)
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]

    # left/side (code 8): left then side (side gets bps+1)
    ls = _streaminfo(8000, 2, 16, n) + _frame(
        [_sub_verbatim(left, 16), _sub_verbatim(side, 17)], n, 8
    )
    d = decode_flac(ls)
    assert d["samples"][:, 0].tolist() == left
    assert d["samples"][:, 1].tolist() == right

    # right/side (code 9): side first
    rs = _streaminfo(8000, 2, 16, n) + _frame(
        [_sub_verbatim(side, 17), _sub_verbatim(right, 16)], n, 9
    )
    d = decode_flac(rs)
    assert d["samples"][:, 0].tolist() == left
    assert d["samples"][:, 1].tolist() == right

    # mid/side (code 10)
    ms = _streaminfo(8000, 2, 16, n) + _frame(
        [_sub_verbatim(mid, 16), _sub_verbatim(side, 17)], n, 10
    )
    d = decode_flac(ms)
    assert d["samples"][:, 0].tolist() == left
    assert d["samples"][:, 1].tolist() == right


def test_wasted_bits_and_multiframe_stream():
    n = 32
    a = [v & ~0b111 for v in _sine(n, 9, 4000)]  # 3 wasted bits
    b = _sine(n, 11, 2000)
    data = (
        _streaminfo(44100, 1, 16, 2 * n)
        + _frame([_sub_wasted(a, 16, 3)], n, 0)
        + _frame([_sub_verbatim(b, 16)], n, 0, frame_no=1)
    )
    d = decode_flac(data)
    assert d["n_samples"] == 2 * n
    assert d["samples"][:n, 0].tolist() == a
    assert d["samples"][n:, 0].tolist() == b
    assert abs(d["duration_s"] - 2 * n / 44100) < 1e-9


def test_flac_honest_errors():
    n = 16
    sig = _sine(n, 5, 100)
    good = _streaminfo(8000, 1, 16, n) + _frame(
        [_sub_verbatim(sig, 16)], n, 0
    )
    with pytest.raises(ValueError, match="signature"):
        decode_flac(b"NOTFLAC" + good)
    # flip a bit inside the frame body -> CRC-16 must catch it
    bad = bytearray(good)
    bad[-5] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt the frame header -> CRC-8 must catch it
    bad2 = bytearray(good)
    si_len = len(_streaminfo(8000, 1, 16, n))
    bad2[si_len + 2] ^= 0x01
    with pytest.raises(ValueError, match="CRC|sync|reserved"):
        decode_flac(bytes(bad2))
    with pytest.raises(ValueError, match="truncated|STREAMINFO"):
        decode_flac(b"fLaC" + bytes(3))
    # 32-bit streaminfo -> honest NotImplementedError
    w32 = _streaminfo(8000, 1, 32, n)
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_flac(w32 + _frame([_sub_verbatim(sig, 32)], n, 0))


def test_flac_through_decode_audio():
    from dataflowex_spark.operators.multimodal import decode_audio

    n = 48
    sig = _sine(n, 7, 1200)
    payload = _streaminfo(8000, 1, 16, n) + _frame(
        [_sub_fixed(sig, 2, 16, param=6)], n, 0
    )
    d = decode_audio(payload)
    assert d["sample_rate"] == 8000 and d["channels"] == 1
    assert d["n_samples"] == n
    assert d["samples"][:, 0].tolist() == sig


def test_flac_through_spark_audio_features(spark):
    """The Spark-side plumbing: FLAC payloads flow through the SAME
    mapInPandas featurize path as WAV (decode_audio dispatches on the
    fLaC signature), mixed in one batch with a WAV row and a
    pointer-only row — per-row feature parity with the analytic
    signal, null features for the pointer row, no crashed batch."""
    import math

    from pyspark.sql import Row, functions as F

    from dataflowex_spark.operators.multimodal import (
        encode_wav,
        extract_audio_features,
    )

    rate, secs = 8000, 2
    n = rate * secs
    amp = 0.25
    sine = [
        int(round(amp * 32767 * np.sin(2 * np.pi * 440 * i / rate)))
        for i in range(n)
    ]
    flac = _streaminfo(rate, 1, 16, n) + b"".join(
        _frame(
            [_sub_fixed(sine[i : i + 4096], 2, 16, param=8)],
            min(4096, n - i),
            0,
            frame_no=i // 4096,
            bs_code_and_extra=(7, [(min(4096, n - i) - 1, 16)]),
        )
        for i in range(0, n, 4096)
    )
    wav = encode_wav(np.array(sine, dtype=np.int16), rate)
    rows = [
        Row(uri="mem://a.flac", media_type="audio/flac",
            payload=bytearray(flac), meta={}),
        Row(uri="mem://b.wav", media_type="audio/wav",
            payload=bytearray(wav), meta={}),
        Row(uri="mem://c.mp3", media_type="audio/mp3",
            payload=None, meta={}),
    ]
    df = spark.createDataFrame(
        rows,
        "uri string, media_type string, payload binary, "
        "meta map<string,string>",
    ).select(F.struct("uri", "media_type", "payload", "meta").alias("media"))
    got = {r.uri: r for r in extract_audio_features(df).collect()}
    fl, wv = got["mem://a.flac"], got["mem://b.wav"]
    assert fl.sample_rate == rate and fl.channels == 1
    assert abs(fl.duration_s - secs) < 1e-9
    # identical samples -> identical features as the WAV twin
    assert abs(fl.rms - wv.rms) < 1e-9 and abs(fl.peak - wv.peak) < 1e-9
    assert abs(fl.rms - amp / math.sqrt(2)) < 0.01
    assert got["mem://c.mp3"].sample_rate is None
