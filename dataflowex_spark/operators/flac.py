"""From-scratch FLAC decoder (RFC 9639 / the public FLAC format
spec): metadata-block walk, frame-header parsing (all block-size /
sample-rate / sample-size encodings, UTF-8 frame numbers, CRC-8
verified), subframe types CONSTANT / VERBATIM / FIXED(0–4) /
LPC(1–32) with wasted-bits, Rice-coded residual partitions (both
4- and 5-bit parameter methods, escape partitions), and all four
channel assignments (independent, left/side, right/side, mid/side) —
pure stdlib + numpy.

FLAC is the dominant LOSSLESS audio format in speech/music corpora
(LibriVox, podcast archives, MusicBrainz dumps ship FLAC); a curation
pipeline that can only read WAV pays a transcode over the whole
corpus before it can featurize. Losslessness also makes the decoder
exactly testable: decode(encode(x)) must equal x bit-for-bit, which
the conformance tests pin with an INDEPENDENT spec-derived encoder
(same conformance-by-construction discipline as test_gif/test_tiff).

Scope (honest edges, house codec policy): sample sizes 8/12/16/20/24
bits; variable block sizes, inter-frame sample-count checks, and CRC
verification (frame CRC-16 and header CRC-8 both enforced — a
bitreader desync fails loudly, never returns garbage). 32-bit
samples raise NotImplementedError.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _Bits:
    """MSB-first bit reader with byte-aligned views (for CRC spans)."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8  # bit position

    def read(self, n: int) -> int:
        if self.pos + n > len(self.data) * 8:
            raise ValueError("flac: bitstream truncated")
        out = 0
        pos = self.pos
        data = self.data
        while n:
            byte = data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, n)
            shift = avail - take
            out = (out << take) | ((byte >> shift) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise ValueError("flac: bad UTF-8 coded number")
    v = first & (mask - 1)
    for _ in range(n_extra):
        b = bits.read(8)
        if b >> 6 != 0b10:
            raise ValueError("flac: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _decode_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    po = bits.read(4)
    if block_size % (1 << po) != 0:
        raise ValueError("flac: partition order does not divide block size")
    out: list[int] = []
    for p in range(1 << po):
        n = (block_size >> po) - (order if p == 0 else 0)
        param = bits.read(param_bits)
        if param == escape:
            raw = bits.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(bits.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    sf_type = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        v = bits.read_signed(eff)
        samples = [v] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0..4
        order = sf_type - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(
                c * samples[-1 - j] for j, c in enumerate(coefs)
            )
            samples.append(r + pred)
    elif sf_type >= 32:  # LPC, order 1..32
        order = sf_type - 31
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        for r in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> dict:
    """Decode a FLAC stream → ``{sample_rate, channels, bits,
    n_samples, duration_s, samples (ndarray[n, ch] int32)}``. Raises
    ValueError for non-FLAC/corrupt payloads and NotImplementedError
    for out-of-scope variants (32-bit samples)."""
    if payload is None or payload[:4] != b"fLaC":
        raise ValueError("flac: bad signature")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("flac: truncated metadata")
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length < 34:
                raise ValueError("flac: short STREAMINFO")
            b = _Bits(body)
            b.read(16)  # min block
            b.read(16)  # max block
            b.read(24)  # min frame
            b.read(24)  # max frame
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    si_rate, si_channels, si_bps, si_total = streaminfo
    if si_bps > 24:
        raise NotImplementedError("flac: >24-bit samples unsupported")

    bits = _Bits(payload, pos)
    chans: list[list[int]] = [[] for _ in range(si_channels)]
    n_decoded = 0
    while (si_total == 0 or n_decoded < si_total) and bits.byte_pos() < len(
        payload
    ) - 1:
        frame_start = bits.byte_pos()
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {frame_start}")
        if bits.read(1) != 0:
            raise ValueError("flac: reserved frame-header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1) != 0:
            raise ValueError("flac: reserved frame-header bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("flac: reserved block-size code 0")
        elif bs_code in _BLOCK_SIZES:
            block_size = _BLOCK_SIZES[bs_code]
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si_rate
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = bits.read(8) * 1000
        elif sr_code == 13:
            rate = bits.read(16)
        elif sr_code == 14:
            rate = bits.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code")
        if ss_code == 0:
            bps = si_bps
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise ValueError(f"flac: reserved sample-size code {ss_code}")
        if bps > 24:
            raise NotImplementedError("flac: >24-bit samples unsupported")
        bits.align()
        crc8_span = payload[frame_start : bits.byte_pos()]
        if _crc8(crc8_span) != bits.read(8):
            raise ValueError("flac: frame-header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            if n_ch != si_channels:
                raise ValueError("flac: frame/streaminfo channel mismatch")
            sub = [
                _decode_subframe(bits, block_size, bps)
                for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if si_channels != 2:
                raise ValueError("flac: stereo decorrelation on non-stereo")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                right = [l - s for l, s in zip(left, side)]
                sub = [left, right]
            elif ch_code == 9:  # right/side (side first)
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                sub = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    lr = (m << 1) | (s & 1)
                    left.append((lr + s) >> 1)
                    right.append((lr - s) >> 1)
                sub = [left, right]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")

        bits.align()
        frame_span = payload[frame_start : bits.byte_pos()]
        if _crc16(frame_span) != bits.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        for c, s in zip(chans, sub):
            c.extend(s)
        n_decoded += block_size

    if si_total:
        chans = [c[:si_total] for c in chans]
    n = len(chans[0]) if chans else 0
    samples = np.array(chans, dtype=np.int64).T.astype(np.int32)
    return {
        "sample_rate": si_rate,
        "channels": si_channels,
        "bits": si_bps,
        "n_samples": n,
        "duration_s": n / si_rate if si_rate else 0.0,
        "samples": samples.reshape(n, si_channels),
    }
