"""Compressed-codec METADATA extraction (MP3, H.264) — pure stdlib.

Full decode of these lossy codecs stays honestly stubbed
(:func:`.multimodal.real_decode_unavailable`): there is no codec
library in this container and a pure-Python IMDCT/CABAC pipeline could
not be verified without one. The *container/header layer* is different
— it is exactly specified, cheaply parseable, and testable bit-for-bit
from hand-built streams, and it is what a training-data pipeline
actually needs for filtering and stats (duration, sample rate, channel
count, resolution, bitrate, VBR-ness) before any sample is decoded.

- :func:`parse_mp3`: ISO/IEC 11172-3 / 13818-3 frame-header walk —
  skips ID3v2, validates every frame's sync/indices, reads the
  Xing/Info VBR tag, and returns exact frame counts and duration.
- :func:`parse_h264`: ITU-T H.264 Annex-B NAL walk — start-code scan,
  emulation-prevention unescape, full SPS parse (Exp-Golomb,
  high-profile chroma/scaling branches, cropping) → width/height.

Spark side: :func:`codec_metadata` runs these (plus the real WAV/BMP/
JPEG/PNG/AVI decoders' meta paths) per blob inside ``mapInPandas`` —
bytes never leave the executor, output is a slim typed row per blob,
so at 100 TB the stage is one map-only pass with no shuffle at all.
"""

from __future__ import annotations

import struct
from typing import Iterator

# ---------------------------------------------------------------- MP3

# ISO/IEC 11172-3 table B.1 (kbit/s); index 0 = "free", 15 = invalid
_BITRATES = {
    # (version_group, layer): 14-entry table for indices 1..14
    ("1", 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("1", 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("1", 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("2", 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("2", 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("2", 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {
    "1": [44100, 48000, 32000],
    "2": [22050, 24000, 16000],
    "2.5": [11025, 12000, 8000],
}
_VERSION_BITS = {0: "2.5", 2: "2", 3: "1"}  # 1 = reserved
_LAYER_BITS = {1: 3, 2: 2, 3: 1}  # header bits → layer number


def _mp3_frame(header: int) -> dict | None:
    """Decode one 32-bit frame header → frame facts, or None if the
    sync/index fields are invalid (resync point)."""
    if (header >> 21) & 0x7FF != 0x7FF:
        return None
    version = _VERSION_BITS.get((header >> 19) & 0x3)
    layer = _LAYER_BITS.get((header >> 17) & 0x3)
    if version is None or layer is None:
        return None
    bitrate_idx = (header >> 12) & 0xF
    sr_idx = (header >> 10) & 0x3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None  # free-format unsupported / invalid
    group = "1" if version == "1" else "2"
    kbps = _BITRATES[(group, layer)][bitrate_idx - 1]
    fs = _SAMPLE_RATES[version][sr_idx]
    padding = (header >> 9) & 0x1
    mode = (header >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        samples = 384
        size = (12 * kbps * 1000 // fs + padding) * 4
    else:
        samples = 1152 if (layer == 2 or version == "1") else 576
        size = samples // 8 * kbps * 1000 // fs + padding
    return {
        "version": version, "layer": layer, "kbps": kbps,
        "sample_rate": fs, "channels": channels, "samples": samples,
        "size": size, "mode": mode,
    }


def _xing_offset(version: str, mode: int) -> int:
    """Side-info size: where a Xing/Info tag sits inside frame 1."""
    mono = mode == 3
    if version == "1":
        return 4 + (17 if mono else 32)
    return 4 + (9 if mono else 17)


class Mp3Error(ValueError):
    pass


def parse_mp3(content: bytes) -> dict:
    """Frame-header walk of an MPEG audio stream.

    Returns ``format/version/layer/sample_rate/channels/n_frames/
    duration_ms/bitrate_kbps/vbr``. ``bitrate_kbps`` is the exact
    byte-weighted average (== the nominal rate for CBR). A leading
    ID3v2 tag is skipped via its syncsafe length; a trailing ID3v1 tag
    (128 bytes, 'TAG') is ignored. Raises :class:`Mp3Error` when no
    valid frame sequence exists.
    """
    pos = 0
    if content[:3] == b"ID3" and len(content) >= 10:
        flags = content[5]
        size = (
            (content[6] & 0x7F) << 21 | (content[7] & 0x7F) << 14
            | (content[8] & 0x7F) << 7 | (content[9] & 0x7F)
        )
        pos = 10 + size + (10 if flags & 0x10 else 0)  # + footer
    end = len(content)
    if content[end - 128: end - 125] == b"TAG":
        end -= 128
    n_frames = 0
    total_samples = 0
    audio_bytes = 0
    first = None
    vbr_frames = None
    xing_vbr = False
    rates = set()
    while pos + 4 <= end:
        (header,) = struct.unpack_from(">I", content, pos)
        fr = _mp3_frame(header)
        if fr is None:
            if n_frames == 0:
                pos += 1  # resync scan before the first good frame
                continue
            break  # garbage after a valid run: stop (spec-walk ends)
        if first is None:
            first = fr
            xo = pos + _xing_offset(fr["version"], fr["mode"])
            tag = content[xo: xo + 4]
            if tag in (b"Xing", b"Info") and xo + 8 <= end:
                (flags,) = struct.unpack_from(">I", content, xo + 4)
                if flags & 0x1 and xo + 12 <= end:
                    (vbr_frames,) = struct.unpack_from(">I", content, xo + 8)
                if tag == b"Xing":
                    xing_vbr = True
                # the tag frame itself carries no audio for BOTH
                # spellings — LAME writes 'Info' on CBR files; counting
                # it inflated n_frames/duration by one frame and biased
                # the byte-weighted bitrate (ADVICE r6). Only 'Xing'
                # marks the file as VBR.
                pos += fr["size"]
                continue
        n_frames += 1
        total_samples += fr["samples"]
        audio_bytes += fr["size"]
        rates.add(fr["kbps"])
        pos += fr["size"]
    if first is None or (n_frames == 0 and vbr_frames is None):
        raise Mp3Error("no valid MPEG audio frame found")
    fs = first["sample_rate"]
    if vbr_frames is not None and n_frames == 0:
        # tag-only prefix of a truncated VBR file: trust the tag count
        n_frames = vbr_frames
        total_samples = vbr_frames * first["samples"]
    duration_ms = total_samples * 1000 // fs
    avg_kbps = (
        round(audio_bytes * 8 * fs / (total_samples * 1000))
        if total_samples else first["kbps"]
    )
    return {
        "format": "mp3",
        "version": first["version"],
        "layer": first["layer"],
        "sample_rate": fs,
        "channels": first["channels"],
        "n_frames": n_frames,
        "duration_ms": duration_ms,
        "bitrate_kbps": avg_kbps,
        "vbr": len(rates) > 1 or xing_vbr,
    }


# -------------------------------------------------------------- H.264

class H264Error(ValueError):
    pass


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (spec §9.1)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise H264Error("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _unescape(nal: bytes) -> bytes:
    """Strip emulation-prevention bytes: 00 00 03 → 00 00 (§7.4.1)."""
    out = bytearray()
    i = 0
    while i < len(nal):
        if i + 2 < len(nal) and nal[i] == 0 and nal[i + 1] == 0 and nal[i + 2] == 3:
            out += nal[i: i + 2]
            i += 3
        else:
            out.append(nal[i])
            i += 1
    return bytes(out)


def _parse_sps(rbsp: bytes) -> dict:
    """Parse a seq_parameter_set RBSP → profile/level/width/height
    (§7.3.2.1.1, incl. high-profile chroma + scaling-list branches and
    frame cropping)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # seq_scaling_list_present[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    pw_mbs = r.ue() + 1
    ph_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (§7.4.2.1.1): chroma 4:2:0 → x2; fields double vertical
    if chroma_format_idc == 0:
        cux, cuy = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        cux, cuy = sub_w, sub_h * (2 - frame_mbs_only)
    width = pw_mbs * 16 - cux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_units * 16 - cuy * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "chroma_format_idc": chroma_format_idc,
        "interlaced": not frame_mbs_only,
    }


def parse_h264(content: bytes) -> dict:
    """Annex-B byte-stream walk: start-code scan → NAL units; parses
    the first SPS for resolution/profile and counts slice types.

    Returns ``format/profile_idc/level_idc/width/height/n_nal/n_idr/
    n_sps/n_pps/interlaced``. Raises :class:`H264Error` without a
    start code or SPS.
    """
    n_nal = n_idr = n_sps = n_pps = 0
    sps = None
    i = 0
    n = len(content)
    starts = []
    while i + 3 <= n:
        if content[i] == 0 and content[i + 1] == 0:
            if content[i + 2] == 1:
                starts.append((i, 3))
                i += 3
                continue
            if i + 4 <= n and content[i + 2] == 0 and content[i + 3] == 1:
                starts.append((i, 4))
                i += 4
                continue
        i += 1
    if not starts:
        raise H264Error("no Annex-B start code found")
    for k, (off, sclen) in enumerate(starts):
        begin = off + sclen
        stop = starts[k + 1][0] if k + 1 < len(starts) else n
        nal = content[begin:stop].rstrip(b"\x00")
        if not nal:
            continue
        n_nal += 1
        nal_type = nal[0] & 0x1F
        if nal_type == 5:
            n_idr += 1
        elif nal_type == 7:
            n_sps += 1
            if sps is None:
                sps = _parse_sps(_unescape(nal[1:]))
        elif nal_type == 8:
            n_pps += 1
    if sps is None:
        raise H264Error("no SPS NAL unit found")
    return {
        "format": "h264",
        "n_nal": n_nal, "n_idr": n_idr, "n_sps": n_sps, "n_pps": n_pps,
        **sps,
    }


# -------------------------------------------------------- Spark stage

#: slim typed row per blob; nulls where a field doesn't apply
CODEC_META_SCHEMA = (
    "media_id long, kind string, format string, width int, height int, "
    "sample_rate int, channels int, duration_ms long, bitrate_kbps int, "
    "n_frames int, error string"
)


def codec_metadata(df):
    """Per-blob metadata over a media table (MEDIA_SCHEMA-shaped):
    one ``mapInPandas`` pass, no shuffle — blob bytes stay in the
    executor and only the slim typed row comes out.

    Routes on magic bytes: MP3 (ID3/0xFFE sync) and H.264 Annex-B via
    the header parsers above; WAV/BMP/JPEG/PNG/MJPEG-AVI via the real
    decoders' metadata (dimensions read exactly, payload untouched
    where the format allows). Unknown/corrupt blobs land with
    ``error`` set rather than failing the batch — at 100 TB a single
    bad file must not kill a stage.
    """
    import pandas as pd

    def _route(content: bytes) -> dict:
        if content[:3] == b"ID3" or (
            len(content) > 1 and content[0] == 0xFF and (content[1] & 0xE0) == 0xE0
        ):
            m = parse_mp3(content)
            return {"format": "mp3", "sample_rate": m["sample_rate"],
                    "channels": m["channels"], "duration_ms": m["duration_ms"],
                    "bitrate_kbps": m["bitrate_kbps"], "n_frames": m["n_frames"]}
        if content[:4] in (b"\x00\x00\x00\x01",) or content[:3] == b"\x00\x00\x01":
            m = parse_h264(content)
            return {"format": "h264", "width": m["width"], "height": m["height"],
                    "n_frames": m["n_idr"]}
        if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
            from .multimodal import decode_wav

            meta, _ = decode_wav(content)
            return {"format": "wav", "sample_rate": meta["sample_rate"],
                    "channels": meta["channels"],
                    "duration_ms": meta["duration_ms"]}
        if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
            from .avi import parse_avi

            meta, frames = parse_avi(content)
            return {"format": "avi", "width": meta.get("width"),
                    "height": meta.get("height"),
                    "duration_ms": meta.get("duration_ms"),
                    "n_frames": len(frames)}
        if content[:2] == b"BM":
            from .multimodal import decode_bmp

            meta, _ = decode_bmp(content)
            return {"format": "bmp", "width": meta["width"],
                    "height": meta["height"]}
        if content[:2] == b"\xff\xd8":
            from .jpeg import decode_jpeg

            meta, _ = decode_jpeg(content)
            return {"format": "jpeg", "width": meta["width"],
                    "height": meta["height"]}
        if content[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import decode_png

            meta, _ = decode_png(content)
            return {"format": "png", "width": meta["width"],
                    "height": meta["height"]}
        raise ValueError("unrecognized media format")

    cols = ["media_id", "kind", "format", "width", "height", "sample_rate",
            "channels", "duration_ms", "bitrate_kbps", "n_frames", "error"]

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                row = {c: None for c in cols}
                row["media_id"], row["kind"] = int(mid), kind
                try:
                    if content is None:
                        raise ValueError("null content")
                    row.update(_route(bytes(content)))
                except Exception as e:  # noqa: BLE001 — per-blob isolation
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.select("media_id", "kind", "content").mapInPandas(
        _extract, schema=CODEC_META_SCHEMA
    )
