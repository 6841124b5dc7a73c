"""MP3 Layer III bitstream parser: hand-built conformance frames
(test-side side-info WRITER, independent of the parser) + the real
third-party LAME file shipped with the container's gsutil test data
(structural invariants across every frame). The spectral-decode
refusal is pinned by message."""

import os

import pytest

from dataflowex_spark.operators.mp3 import (
    Mp3Error,
    check_reservoir,
    decode_mp3_pcm,
    iter_frames,
    lsf_scalefactor_bits,
    mpeg1_scalefactor_bits,
    parse_side_info,
    side_info_features,
)

REAL_MP3 = (
    "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
    "test_data/test.mp3"
)


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            b <<= (8 - min(8, len(self.bits) - i))
            out.append(b)
        return bytes(out)


def _granule_bits(w, g, lsf):
    """Independent encoder for one granule's side-info fields."""
    w.write(g["part2_3"], 12)
    w.write(g["big_values"], 9)
    w.write(g["global_gain"], 8)
    w.write(g["scalefac_compress"], 9 if lsf else 4)
    w.write(1 if g.get("short") else 0, 1)
    if g.get("short"):
        w.write(2, 2)  # block_type short
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


def build_frame(version, granules, channels=1, main_data_begin=0,
                scfsi=None, bitrate_idx=9, sr_idx=0):
    """One complete Layer III frame: header + side info + zero-fill
    main data, sized by the header arithmetic. ``granules`` is
    [gr][ch] dicts."""
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
            _granule_bits(w, g, lsf)
    side = w.bytes()
    from dataflowex_spark.operators.mp3 import (
        _BITRATES_V1_L3,
        _BITRATES_V2_L3,
        _RATES,
    )

    br = (_BITRATES_V1_L3 if version == "1" else _BITRATES_V2_L3)[
        bitrate_idx - 1
    ] * 1000
    rate = _RATES[version][sr_idx]
    spf = 1152 if version == "1" else 576
    frame_bytes = (spf // 8) * br // rate
    body = bytes(hdr) + side
    assert len(body) <= frame_bytes
    return body + b"\x00" * (frame_bytes - len(body))


def test_side_info_roundtrip_mpeg1_stereo():
    g = {
        "part2_3": 1500, "big_values": 120, "global_gain": 180,
        "scalefac_compress": 9, "tabs": (7, 13, 24),
        "region0": 5, "region1": 2, "preflag": 1,
        "scalefac_scale": 1, "count1": 1,
    }
    gs = {
        "part2_3": 900, "big_values": 60, "global_gain": 150,
        "scalefac_compress": 14, "short": True, "mixed": False,
        "tabs": (3, 10), "sub": (1, 2, 3),
    }
    frame = build_frame(
        "1", [[g, gs], [gs, g]], channels=2, main_data_begin=200,
        scfsi=[[1, 0, 1, 0], [0, 1, 1, 1]],
    )
    fi = parse_side_info(frame, 0, "1", 2, crc=False)
    assert fi.main_data_begin == 200
    assert fi.scfsi == ((1, 0, 1, 0), (0, 1, 1, 1))
    p = fi.granules[0][0]
    assert (p.part2_3_length, p.big_values, p.global_gain) == (
        1500, 120, 180
    )
    assert p.table_select == (7, 13, 24)
    assert (p.region0_count, p.region1_count) == (5, 2)
    assert (p.preflag, p.scalefac_scale, p.count1table_select) == (
        1, 1, 1
    )
    s = fi.granules[0][1]
    assert s.window_switching and s.block_type == 2
    assert s.table_select == (3, 10) and s.subblock_gain == (1, 2, 3)
    # scalefactor arithmetic: sc=9 → slen (2,2): 11·2+10·2 = 42 bits
    assert mpeg1_scalefactor_bits(p) == 42
    # short sc=14 → slen (4,2): 18·4+18·2 = 108
    assert mpeg1_scalefactor_bits(s) == 108
    # granule 1 with scfsi suppressing groups 0 and 2 (ch 0):
    # groups (6+5)·slen1,(5+5)·slen2 → keep groups 1,3: 5·2+5·2=20
    assert mpeg1_scalefactor_bits(
        fi.granules[1][1], scfsi_ch=(1, 0, 1, 0), first_granule=False
    ) == mpeg1_scalefactor_bits(g and fi.granules[1][1]) - 6 * 2 - 5 * 2


def test_side_info_roundtrip_lsf_mono_and_bitcount():
    g = {
        "part2_3": 800, "big_values": 90, "global_gain": 210,
        "scalefac_compress": 300, "tabs": (16, 1, 2),
        "region0": 4, "region1": 3, "scalefac_scale": 1,
    }
    frame = build_frame("2", [[g]], channels=1, main_data_begin=17)
    fi = parse_side_info(frame, 0, "2", 1, crc=False)
    assert fi.main_data_begin == 17
    p = fi.granules[0][0]
    assert p.scalefac_compress == 300
    assert p.scalefac_scale == 1 and p.preflag == 0
    # LSF slen arithmetic, sc=300 (<400): slen=(18//5,18%5,(300&15)>>2,0)
    # = (3,3,3,0); nsfb long row0 = (6,5,5,5) → 18+15+15+0 = 48... with
    # slen4 = 300&3 = 0 → partitions 6·3+5·3+5·3+5·0 = 48
    assert lsf_scalefactor_bits(p) == 48
    # short-block LSF: sc=100 → slen=(6//5=1,6%5=1,(100&15)>>2=1,0)
    gs = dict(g, short=True, tabs=(0, 0), scalefac_compress=100)
    f2 = parse_side_info(
        build_frame("2", [[gs]], 1), 0, "2", 1, crc=False
    )
    s = f2.granules[0][0]
    # nsfb short row0 = (9,9,9,9) → 9·1+9·1+9·1+9·0 = 27
    assert lsf_scalefactor_bits(s) == 27


def test_structural_guards():
    bad = {
        "part2_3": 10, "big_values": 300, "global_gain": 1,
        "scalefac_compress": 0, "tabs": (0, 0, 0),
    }
    frame = build_frame("2", [[bad]], channels=1)
    with pytest.raises(Mp3Error, match="big_values"):
        parse_side_info(frame, 0, "2", 1, crc=False)


def test_reservoir_chain_guard():
    g = {"part2_3": 0, "big_values": 0, "global_gain": 0,
         "scalefac_compress": 0, "tabs": (0, 0, 0)}
    f_ok = build_frame("2", [[g]], channels=1, main_data_begin=0)
    f_greedy = build_frame("2", [[g]], channels=1, main_data_begin=255)
    frames = list(iter_frames(f_ok + f_greedy))
    assert len(frames) == 2
    with pytest.raises(Mp3Error, match="reservoir"):
        check_reservoir(frames)


@pytest.mark.skipif(
    not os.path.exists(REAL_MP3),
    reason="container's gsutil test asset absent",
)
def test_real_third_party_file_invariants():
    """A real LAME-encoded MPEG-2 Layer III file (not produced by
    our writer): every frame must parse with the side-info layout
    consumed bit-exactly, the reservoir chain must be consistent,
    and scalefactor bits must fit part2_3_length in every granule."""
    data = open(REAL_MP3, "rb").read()
    frames = list(iter_frames(data))
    assert len(frames) == 45  # consecutive parse = frame-size math exact
    check_reservoir(frames)
    for f in frames:
        assert f.version == "2" and f.sample_rate == 22050
        for chs in f.granules:
            for g in chs:
                p2 = lsf_scalefactor_bits(g)
                assert p2 <= max(g.part2_3_length, p2 * 0)  # p2 ≤ part2_3 when nonzero
                assert 0 <= g.global_gain <= 255
    feats = side_info_features(data)
    assert feats["frames"] == 45 and feats["channels"] == 1
    assert abs(feats["duration_s"] - 45 * 576 / 22050) < 1e-9


def test_pcm_decode_refuses_naming_tables():
    with pytest.raises(NotImplementedError, match="Table B.7"):
        decode_mp3_pcm(b"\xff\xf3\x80\xc4" + b"\x00" * 200)
