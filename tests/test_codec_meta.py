"""MP3 / H.264 header-metadata parsers (ext/codec_meta.py): exact
parses of hand-built spec-conformant streams, plus the mapInPandas
stage plumbing."""

from __future__ import annotations

import struct

import pytest

from aws_greengrass_labs_database_influxdb_spark.ext.codec_meta import (
    H264Error,
    Mp3Error,
    _BitReader,
    _unescape,
    codec_metadata,
    parse_h264,
    parse_mp3,
)


# ---------------------------------------------------------------- MP3

def mp3_frame(kbps_idx: int, version="1", layer=3, sr_idx=0, mode=0,
              pad=0) -> bytes:
    """Build one MPEG audio frame (header + zero payload)."""
    vbits = {"1": 3, "2": 2, "2.5": 0}[version]
    lbits = {1: 3, 2: 2, 3: 1}[layer]
    header = (
        0x7FF << 21 | vbits << 19 | lbits << 17 | 1 << 16  # no CRC
        | kbps_idx << 12 | sr_idx << 10 | pad << 9 | mode << 6
    )
    from aws_greengrass_labs_database_influxdb_spark.ext.codec_meta import (
        _mp3_frame,
    )

    size = _mp3_frame(header)["size"]
    return struct.pack(">I", header) + b"\x00" * (size - 4)


def test_mp3_cbr_mpeg1_layer3():
    """10 frames of 44.1 kHz 128 kbps stereo: exact counts/duration."""
    blob = mp3_frame(9) * 10  # idx 9 = 128 kbps in the MPEG-1 L3 table
    m = parse_mp3(blob)
    assert m["version"] == "1" and m["layer"] == 3
    assert m["sample_rate"] == 44100 and m["channels"] == 2
    assert m["n_frames"] == 10
    assert m["duration_ms"] == 10 * 1152 * 1000 // 44100  # 261
    # 417-byte frames -> byte-weighted average re-derives ~128
    assert m["bitrate_kbps"] == round(417 * 10 * 8 * 44100 / (11520 * 1000))
    assert m["vbr"] is False


def test_mp3_id3v2_skip_and_id3v1_ignore():
    tag_size = 100
    id3 = b"ID3\x04\x00\x00" + bytes(
        [(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
         (tag_size >> 7) & 0x7F, tag_size & 0x7F]
    ) + b"\x00" * tag_size
    id3v1 = b"TAG" + b"\x00" * 125
    m = parse_mp3(id3 + mp3_frame(9) * 4 + id3v1)
    assert m["n_frames"] == 4


def test_mp3_mpeg2_layer3_mono():
    """MPEG-2 halves samples/frame: 576 @ 22.05 kHz, 64 kbps mono."""
    blob = mp3_frame(8, version="2", sr_idx=0, mode=3) * 6  # idx 8 = 64
    m = parse_mp3(blob)
    assert m["version"] == "2" and m["channels"] == 1
    assert m["sample_rate"] == 22050
    assert m["duration_ms"] == 6 * 576 * 1000 // 22050


def test_mp3_xing_vbr():
    """Xing tag frame: excluded from audio stats, marks VBR, carries
    the frame count."""
    first = bytearray(mp3_frame(9))  # stereo MPEG-1 -> side info 32
    xo = 4 + 32
    first[xo: xo + 4] = b"Xing"
    first[xo + 4: xo + 8] = struct.pack(">I", 1)  # FRAMES flag
    first[xo + 8: xo + 12] = struct.pack(">I", 8)
    body = mp3_frame(9) * 5 + mp3_frame(11) * 3  # mixed bitrates
    m = parse_mp3(bytes(first) + body)
    assert m["vbr"] is True
    assert m["n_frames"] == 8  # 5 + 3 audio frames; tag frame excluded


def test_mp3_garbage_raises():
    with pytest.raises(Mp3Error):
        parse_mp3(b"\x00" * 64)


def test_mp3_resync_before_first_frame():
    m = parse_mp3(b"\x12\x34\x56" + mp3_frame(9) * 2)
    assert m["n_frames"] == 2


# -------------------------------------------------------------- H.264

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v: int):
        k = v + 1
        nbits = k.bit_length()
        self.u(0, nbits - 1)
        self.u(k, nbits)
        return self

    def se(self, v: int):
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def bytes(self) -> bytes:
        bits = self.bits + [1] + [0] * ((8 - (len(self.bits) + 1) % 8) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            out.append(int("".join(map(str, bits[i: i + 8])), 2))
        return bytes(out)


def make_sps(profile=66, level=31, pw_mbs=80, ph_units=45, fmof=1,
             crop=None, chroma=1) -> bytes:
    w = _BitWriter()
    w.u(profile, 8).u(0, 8).u(level, 8).ue(0)  # sps_id
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        w.ue(chroma).ue(0).ue(0).u(0, 1).u(0, 1)  # no scaling matrix
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0).ue(0)  # poc_type 0 + log2_max_poc
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps
    w.ue(pw_mbs - 1).ue(ph_units - 1)
    w.u(fmof, 1)
    if not fmof:
        w.u(0, 1)
    w.u(1, 1)  # direct_8x8
    if crop:
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    return w.bytes()


def annexb(*nals: bytes) -> bytes:
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def test_h264_baseline_720p():
    stream = annexb(b"\x67" + make_sps(pw_mbs=80, ph_units=45),
                    b"\x68\xce\x38\x80",  # PPS
                    b"\x65\x88\x80")      # IDR slice
    m = parse_h264(stream)
    assert (m["width"], m["height"]) == (1280, 720)
    assert m["profile_idc"] == 66 and m["level_idc"] == 31
    assert m["n_sps"] == 1 and m["n_pps"] == 1 and m["n_idr"] == 1
    assert m["interlaced"] is False


def test_h264_1080_crop():
    """1920x1088 coded with 8 rows cropped: 4:2:0 crop unit = 2."""
    sps = make_sps(pw_mbs=120, ph_units=68, crop=(0, 0, 0, 4))
    m = parse_h264(annexb(b"\x67" + sps))
    assert (m["width"], m["height"]) == (1920, 1080)


def test_h264_high_profile_chroma_branch():
    sps = make_sps(profile=100, pw_mbs=40, ph_units=30)
    m = parse_h264(annexb(b"\x67" + sps))
    assert (m["width"], m["height"]) == (640, 480)
    assert m["chroma_format_idc"] == 1


def test_h264_three_byte_start_codes_and_no_sps():
    with pytest.raises(H264Error, match="SPS"):
        parse_h264(b"\x00\x00\x01\x65\x88")
    with pytest.raises(H264Error, match="start code"):
        parse_h264(b"\xff" * 16)


def test_unescape_emulation_prevention():
    assert _unescape(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert _unescape(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    assert _unescape(b"\x01\x02\x03") == b"\x01\x02\x03"


def test_bitreader_golomb_roundtrip():
    w = _BitWriter()
    for v in (0, 1, 2, 7, 100):
        w.ue(v)
    for v in (-3, 0, 5):
        w.se(v)
    r = _BitReader(w.bytes())
    assert [r.ue() for _ in range(5)] == [0, 1, 2, 7, 100]
    assert [r.se() for _ in range(3)] == [-3, 0, 5]


# ------------------------------------------------------- Spark stage

def test_codec_metadata_stage(spark):
    """mapInPandas plumbing: per-blob routing, per-blob error
    isolation, slim typed output."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00" * 800)  # 100 ms
    wav = buf.getvalue()
    mp3 = mp3_frame(9) * 3
    h264 = annexb(b"\x67" + make_sps(pw_mbs=80, ph_units=45))
    rows = [
        (1, "audio", bytearray(wav)),
        (2, "audio", bytearray(mp3)),
        (3, "video", bytearray(h264)),
        (4, "image", bytearray(b"not-a-format")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, content binary")
    out = {r["media_id"]: r for r in codec_metadata(df).collect()}
    assert out[1]["format"] == "wav" and out[1]["duration_ms"] == 100
    assert out[2]["format"] == "mp3" and out[2]["n_frames"] == 3
    assert out[3]["format"] == "h264" and (out[3]["width"], out[3]["height"]) == (1280, 720)
    assert out[4]["format"] is None and "unrecognized" in out[4]["error"]
