"""MPEG Layer III (MP3) BITSTREAM PARSER — frames, side info, bit
reservoir, scalefactor structure — and the curation features they
carry, from scratch against the PUBLIC specs (ISO/IEC 11172-3 for
MPEG-1, ISO/IEC 13818-3 for MPEG-2 LSF).

Scope, stated honestly (the codec-module discipline says a silent
misread is the worst failure mode — its corollary is that a decoder
built on GUESSED constants is a silent misread factory):

- **Implemented and verified**: sync walk + header decode, CRC slot,
  side-info bit layout for MPEG-1 (17/32 bytes: main_data_begin 9,
  scfsi, 2 granules × per-channel part2_3_length/big_values/
  global_gain/scalefac_compress/window-switching trees) and MPEG-2
  LSF (9/17 bytes: main_data_begin 8, 1 granule, 9-bit
  scalefac_compress), the bit-reservoir assembly model
  (main_data_begin back-pointers), and the scalefactor-length
  arithmetic (MPEG-1 slen table; LSF partition arithmetic) — enough
  to account for every bit of part2 and bound part3 (Huffman) bits.
  Verified two independent ways: hand-built conformance frames from
  the test-side side-info WRITER below, and a real third-party
  LAME-encoded file (structural invariants across every frame:
  field ranges, reservoir consistency, part2 ≤ part2_3).
- **Refused, with the reason in the error**: spectral (Huffman →
  PCM) decode. Layer III requantization needs the ISO constant
  tables — Huffman code tables B.7 (≈2000 arbitrary codewords) and
  the synthesis-window table B.3 (512 non-derivable coefficients).
  Those tables are DATA, not algorithm; this environment has no
  copy to transcribe from, and reconstructing them from memory
  would produce a decoder that LOOKS complete while emitting wrong
  samples. FLAC (`operators/flac.py`) decodes fully because FLAC is
  table-free (Rice codes + integer LPC are algorithmic); Layer III
  is not. `decode_mp3_pcm` raises ``NotImplementedError`` naming
  the exact missing tables.

Why side info alone earns its place in a 100 TB curation pipeline:
``global_gain`` (8 bits/granule/channel) is the decoder's loudness
anchor — its time series is a dynamics/loudness envelope without
touching Huffman data; ``block_type==2`` (short windows) marks
transient density (speech/percussion vs steady tone); per-granule
``part2_3_length`` is the encoder's own bit-allocation signal
(spectral complexity). All three come from a FIXED-SIZE prefix of
each frame — the scan is sequential, payload-local, and runs inside
``mapInPandas`` like every other codec here (payloads never
shuffle).

Public-spec anchors: ISO 11172-3 §2.4.1.7 (side info layout),
§2.4.2.7 (scalefac_compress slen table), ISO 13818-3 §2.4.3.2 (LSF
scalefactor partitions); frame header per the shared probe in
``operators/multimodal.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_BITRATES_V1_L3 = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320]
_BITRATES_V2_L3 = [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                   144, 160]
_RATES = {"1": [44100, 48000, 32000], "2": [22050, 24000, 16000],
          "2.5": [11025, 12000, 8000]}

# ISO 11172-3 Table B.6: scalefac_compress → (slen1, slen2)
_SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
_SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]
# scalefactor band COUNTS per MPEG-1 granule: bands 0..10 use slen1,
# 11..20 use slen2 (long blocks); short blocks: 0..5 / 6..11 ×3
_MPEG1_SF_BITS_LONG = (11, 10)  # bands × (slen1, slen2)
_MPEG1_SF_BITS_SHORT = (6, 6)  # per window


class Mp3Error(ValueError):
    """Structurally invalid Layer III bitstream."""


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


@dataclass
class GranuleInfo:
    part2_3_length: int
    big_values: int
    global_gain: int
    scalefac_compress: int
    window_switching: bool
    block_type: int
    mixed_block: bool
    table_select: tuple
    subblock_gain: tuple
    region0_count: int
    region1_count: int
    preflag: int
    scalefac_scale: int
    count1table_select: int


@dataclass
class FrameInfo:
    offset: int
    version: str
    bitrate: int
    sample_rate: int
    channels: int
    frame_bytes: int
    crc: bool
    main_data_begin: int
    scfsi: tuple
    granules: list = field(default_factory=list)  # [gr][ch] GranuleInfo


def _parse_header(data: bytes, pos: int):
    if pos + 4 > len(data):
        return None
    if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
        return None
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    ver_bits = (b1 >> 3) & 3
    layer = 4 - ((b1 >> 1) & 3)
    if ver_bits == 1 or layer != 3:
        return None
    protection = not (b1 & 1)  # 0 ⇒ CRC present
    br_idx = (b2 >> 4) & 15
    sr_idx = (b2 >> 2) & 3
    pad = (b2 >> 1) & 1
    mode = (b3 >> 6) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
    bitrate = (
        _BITRATES_V1_L3 if version == "1" else _BITRATES_V2_L3
    )[br_idx - 1] * 1000
    rate = _RATES[version][sr_idx]
    spf = 1152 if version == "1" else 576
    frame_bytes = (spf // 8) * bitrate // rate + pad
    channels = 1 if mode == 3 else 2
    return version, bitrate, rate, channels, frame_bytes, protection


def _parse_granule(r: _BitReader, lsf: bool) -> GranuleInfo:
    part2_3 = r.read(12)
    big_values = r.read(9)
    if big_values > 288:
        raise Mp3Error(f"big_values {big_values} > 288")
    global_gain = r.read(8)
    scalefac_compress = r.read(9 if lsf else 4)
    window_switching = bool(r.read(1))
    if window_switching:
        block_type = r.read(2)
        if block_type == 0:
            raise Mp3Error("window_switching with block_type 0")
        mixed = bool(r.read(1))
        tabs = (r.read(5), r.read(5))
        sub = (r.read(3), r.read(3), r.read(3))
        # region counts implicit for switched blocks (spec fixed)
        region0, region1 = (7 if block_type != 2 or mixed else 8), 36
        return GranuleInfo(
            part2_3, big_values, global_gain, scalefac_compress,
            True, block_type, mixed, tabs, sub, region0, region1,
            0, 0, 0,  # preflag/scalefac_scale/count1: _finish_flags
        )
    tabs = (r.read(5), r.read(5), r.read(5))
    region0 = r.read(4)
    region1 = r.read(3)
    return GranuleInfo(
        part2_3, big_values, global_gain, scalefac_compress,
        False, 0, False, tabs, (), region0, region1, 0, 0, 0
    )


def _finish_flags(r: _BitReader, g: GranuleInfo, lsf: bool) -> None:
    g.preflag = 0 if lsf else r.read(1)
    g.scalefac_scale = r.read(1)
    g.count1table_select = r.read(1)


def parse_side_info(
    data: bytes, pos: int, version: str, channels: int, crc: bool
) -> FrameInfo:
    """Parse one frame's side info (header at byte ``pos``)."""
    lsf = version != "1"
    side_start = pos + 4 + (2 if crc else 0)
    n_gr = 1 if lsf else 2
    side_bytes = (
        (9 if channels == 1 else 17)
        if lsf
        else (17 if channels == 1 else 32)
    )
    if side_start + side_bytes > len(data):
        raise Mp3Error("truncated side info")
    r = _BitReader(data, side_start * 8)
    main_data_begin = r.read(8 if lsf else 9)
    r.read((1 if channels == 1 else 2) if lsf
           else (5 if channels == 1 else 3))  # private bits
    scfsi = tuple(
        tuple(r.read(1) for _ in range(4)) for _ in range(channels)
    ) if not lsf else tuple(() for _ in range(channels))
    granules = []
    for _gr in range(n_gr):
        chs = []
        for _ch in range(channels):
            g = _parse_granule(r, lsf)
            _finish_flags(r, g, lsf)
            chs.append(g)
        granules.append(chs)
    used = r.pos - side_start * 8
    if used != side_bytes * 8:
        raise Mp3Error(
            f"side info used {used} bits, layout says {side_bytes * 8}"
        )
    return FrameInfo(
        offset=pos,
        version=version,
        bitrate=0,
        sample_rate=0,
        channels=channels,
        frame_bytes=0,
        crc=crc,
        main_data_begin=main_data_begin,
        scfsi=scfsi,
        granules=granules,
    )


def mpeg1_scalefactor_bits(g: GranuleInfo, scfsi_ch=None,
                           first_granule=True) -> int:
    """part2 (scalefactor) bit count for an MPEG-1 granule — ISO
    11172-3 Table B.6 slen arithmetic. ``scfsi_ch`` (4 group flags)
    suppresses re-sent groups in granule 1."""
    slen1, slen2 = _SLEN1[g.scalefac_compress], _SLEN2[g.scalefac_compress]
    if g.window_switching and g.block_type == 2:
        if g.mixed_block:
            return 17 * slen1 + 18 * slen2
        return 18 * slen1 + 18 * slen2
    groups = [6 * slen1, 5 * slen1, 5 * slen2, 5 * slen2]
    if not first_granule and scfsi_ch:
        groups = [
            0 if flag else bits for flag, bits in zip(scfsi_ch, groups)
        ]
    return sum(groups)


# ISO 13818-3 §2.4.3.2: scalefactor-band counts per partition
# (rows: the three scalefac_compress ranges for normal channels, then
# the three int_scalefac ranges for the intensity-coded channel;
# columns: long / short / mixed block) — short counts are per-window
# slots (12 short bands × 3 windows = 36 total)
_LSF_NSFB = [
    [(6, 5, 5, 5), (9, 9, 9, 9), (6, 9, 9, 9)],
    [(6, 5, 7, 3), (9, 9, 12, 6), (6, 9, 12, 6)],
    [(11, 10, 0, 0), (18, 18, 0, 0), (15, 18, 0, 0)],
    [(7, 7, 7, 0), (12, 12, 12, 0), (6, 15, 12, 0)],
    [(6, 6, 6, 3), (12, 9, 9, 6), (6, 12, 9, 6)],
    [(8, 8, 5, 0), (15, 12, 9, 0), (6, 18, 9, 0)],
]


def lsf_scalefactor_bits(g: GranuleInfo, intensity_ch: bool = False) -> int:
    """part2 (scalefactor) bit count for an MPEG-2 LSF granule — ISO
    13818-3 §2.4.3.2 partition arithmetic over the 9-bit
    scalefac_compress; ``intensity_ch`` selects the halved
    int_scalefac ranges used by the intensity-coded channel."""
    sc = g.scalefac_compress
    if intensity_ch:
        sc >>= 1
        if sc < 180:
            slen, row = (sc // 36, (sc % 36) // 6, sc % 6, 0), 3
        elif sc < 244:
            sc -= 180
            slen, row = ((sc % 64) >> 4, (sc % 16) >> 2, sc & 3, 0), 4
        else:
            sc -= 244
            slen, row = (sc // 3, sc % 3, 0, 0), 5
    elif sc < 400:
        slen, row = (
            (sc >> 4) // 5, (sc >> 4) % 5, (sc & 15) >> 2, sc & 3
        ), 0
    elif sc < 500:
        sc -= 400
        slen, row = ((sc >> 2) // 5, (sc >> 2) % 5, sc & 3, 0), 1
    else:
        sc -= 500
        slen, row = (sc // 3, sc % 3, 0, 0), 2
    short = g.window_switching and g.block_type == 2
    kind = (2 if g.mixed_block else 1) if short else 0
    nr = _LSF_NSFB[row][kind]
    return sum(n * s for n, s in zip(nr, slen))


def iter_frames(data: bytes, limit: int | None = None):
    """Yield (FrameInfo, header fields) for each Layer III frame;
    resyncs across junk; raises Mp3Error on structural violations
    inside a synced frame."""
    pos = 0
    if data[:3] == b"ID3":
        size = (
            (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        )
        pos = 10 + size
    n = 0
    while pos + 4 <= len(data):
        h = _parse_header(data, pos)
        if h is None:
            pos += 1
            continue
        version, bitrate, rate, channels, frame_bytes, crc = h
        if pos + frame_bytes > len(data):
            break  # truncated tail frame
        fi = parse_side_info(data, pos, version, channels, crc)
        fi.bitrate = bitrate
        fi.sample_rate = rate
        fi.frame_bytes = frame_bytes
        yield fi
        n += 1
        if limit is not None and n >= limit:
            return
        pos += frame_bytes


def check_reservoir(frames: list[FrameInfo]) -> None:
    """Validate the bit-reservoir chain: each frame's
    main_data_begin must not reach back past the main data that
    PRECEDING frames actually carried (ISO 11172-3 §2.4.2.3: the
    reservoir is bounned by prior frames' unused main-data space).
    Raises Mp3Error on violation."""
    carried = 0  # main-data bytes available from earlier frames
    for i, f in enumerate(frames):
        if f.main_data_begin > carried:
            raise Mp3Error(
                f"frame {i}: main_data_begin {f.main_data_begin} "
                f"reaches past the {carried} reservoir bytes prior "
                "frames carried"
            )
        lsf = f.version != "1"
        side = (9 if f.channels == 1 else 17) if lsf else (
            17 if f.channels == 1 else 32
        )
        this_main = f.frame_bytes - 4 - (2 if f.crc else 0) - side
        carried = min(carried + this_main, 511 if not lsf else 255)
    return None


def side_info_features(data: bytes, max_frames: int = 100000) -> dict:
    """Curation features from side info alone (no Huffman decode):

    - ``gain_mean`` / ``gain_std`` / ``gain_range``: the
      global_gain envelope over all granules×channels — the
      decoder's loudness anchor, a dynamics signal;
    - ``short_block_ratio``: fraction of granules using short
      (block_type 2) windows — transient density;
    - ``bits_mean`` / ``bits_p95``: per-granule part2_3_length —
      the encoder's own spectral-complexity signal;
    - ``frames`` / ``duration_s`` / ``sample_rate`` /
      ``channels``.
    """
    import numpy as np

    gains, bits, shorts, total = [], [], 0, 0
    frames = 0
    rate = ch = None
    version = None
    for fi in iter_frames(data, limit=max_frames):
        frames += 1
        rate, ch, version = fi.sample_rate, fi.channels, fi.version
        for chs in fi.granules:
            for g in chs:
                gains.append(g.global_gain)
                bits.append(g.part2_3_length)
                total += 1
                if g.window_switching and g.block_type == 2:
                    shorts += 1
    if not frames:
        raise Mp3Error("no Layer III frames found")
    spf = 1152 if version == "1" else 576
    ga = np.array(gains, dtype=np.float64)
    ba = np.array(bits, dtype=np.float64)
    return {
        "frames": frames,
        "sample_rate": rate,
        "channels": ch,
        "duration_s": frames * spf / rate,
        "gain_mean": float(ga.mean()),
        "gain_std": float(ga.std()),
        "gain_range": int(ga.max() - ga.min()),
        "short_block_ratio": shorts / total,
        "bits_mean": float(ba.mean()),
        "bits_p95": float(np.percentile(ba, 95)),
    }


def decode_mp3_pcm(data: bytes):
    """Layer III spectral decode to PCM: HONESTLY REFUSED.

    The requantization/synthesis chain needs two ISO constant
    tables that are pure data with no derivation: the Huffman code
    tables (ISO 11172-3 Table B.7 — ~2000 arbitrary codewords
    across 17 distinct tables) and the synthesis polyphase window
    (Table B.3 — 512 optimized prototype-filter coefficients).
    This environment holds no copy of either; a decoder built on
    reconstructed-from-memory constants would emit plausible but
    WRONG samples — the exact failure mode the codec modules exist
    to avoid (contrast FLAC, `operators/flac.py`, which decodes
    fully because its spec is table-free). Everything BEFORE the
    constant-table stages — framing, side info, reservoir,
    scalefactor structure — is implemented and verified above."""
    raise NotImplementedError(
        "MP3 spectral decode requires ISO 11172-3 constant tables "
        "(Huffman Table B.7, synthesis window Table B.3) that are "
        "not available in this environment to transcribe; refusing "
        "rather than decode with guessed constants. Side-info "
        "features (side_info_features) and the header probe "
        "(multimodal.mp3_probe) are implemented and verified."
    )


# ---------------------------------------------------------------------
# Conformance-frame writer (fixtures ONLY — the codec-module
# discipline: an independent encoder proves the parser; tests and the
# oracled q425 both build streams with it)
# ---------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            chunk = self.bits[i : i + 8]
            for bit in chunk:
                b = (b << 1) | bit
            b <<= 8 - len(chunk)
            out.append(b)
        return bytes(out)


def build_conformance_frame(
    version: str,
    granules: list[list[dict]],
    channels: int = 1,
    main_data_begin: int = 0,
    scfsi=None,
    bitrate_idx: int = 9,
    sr_idx: int = 0,
) -> bytes:
    """One complete Layer III frame: header + side info + zero-fill
    main data, sized by the header arithmetic. ``granules`` is
    [gr][ch] dicts with part2_3/big_values/global_gain/
    scalefac_compress (+ optional short/mixed/tabs/sub/region/
    preflag/scalefac_scale/count1)."""
    lsf = version != "1"
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    hdr = bytearray([0xFF, 0xE0 | (ver_bits << 3) | (1 << 1) | 1])
    hdr.append((bitrate_idx << 4) | (sr_idx << 2))
    hdr.append((3 if channels == 1 else 0) << 6)
    w = _BitWriter()
    w.write(main_data_begin, 8 if lsf else 9)
    w.write(0, (1 if channels == 1 else 2) if lsf
            else (5 if channels == 1 else 3))
    if not lsf:
        for ch in range(channels):
            for i in range(4):
                w.write((scfsi or [[0] * 4] * channels)[ch][i], 1)
    for gr in granules:
        for g in gr:
            w.write(g["part2_3"], 12)
            w.write(g["big_values"], 9)
            w.write(g["global_gain"], 8)
            w.write(g["scalefac_compress"], 9 if lsf else 4)
            w.write(1 if g.get("short") else 0, 1)
            if g.get("short"):
                w.write(2, 2)
                w.write(1 if g.get("mixed") else 0, 1)
                for t in g.get("tabs", (0, 0)):
                    w.write(t, 5)
                for s in g.get("sub", (0, 0, 0)):
                    w.write(s, 3)
            else:
                for t in g.get("tabs", (0, 0, 0)):
                    w.write(t, 5)
                w.write(g.get("region0", 0), 4)
                w.write(g.get("region1", 0), 3)
            if not lsf:
                w.write(g.get("preflag", 0), 1)
            w.write(g.get("scalefac_scale", 0), 1)
            w.write(g.get("count1", 0), 1)
    side = w.bytes()
    br = (
        _BITRATES_V1_L3 if version == "1" else _BITRATES_V2_L3
    )[bitrate_idx - 1] * 1000
    rate = _RATES[version][sr_idx]
    spf = 1152 if version == "1" else 576
    frame_bytes = (spf // 8) * br // rate
    body = bytes(hdr) + side
    if len(body) > frame_bytes:
        raise Mp3Error("side info exceeds frame size")
    return body + b"\x00" * (frame_bytes - len(body))
