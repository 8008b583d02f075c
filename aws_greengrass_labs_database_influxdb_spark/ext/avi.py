"""Minimal RIFF/AVI container parser for MJPEG video — pure stdlib.

MJPEG-in-AVI is the one video codec this environment can honestly
decode end-to-end: the container is plain RIFF chunk walking and every
frame payload is a baseline JPEG, which :mod:`.jpeg` already decodes
in pure numpy. This closes the "video" column of the multimodal
surface for real; inter-frame codecs (H.264 etc.) remain the
documented stub (no codec libraries in the container).

Layout parsed (AVI RIFF form, per the public msdn/OpenDML spec):

    RIFF 'AVI ' { LIST 'hdrl' { 'avih' <MainAVIHeader> ... }
                  LIST 'movi' { '00dc'/'00db' <frame bytes> ... }
                  [ 'idx1' ... ] }

Only ``avih`` (frame timing/count/size) and the movi frame chunks are
read; everything else is skipped structurally.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def parse_avi(content: bytes) -> tuple[dict, list[bytes]]:
    """Parse an AVI blob → ``(meta, frames)`` where ``frames`` is the
    list of raw video-frame payloads (JPEG bytes for MJPEG) in stream
    order and ``meta`` carries ``{width, height, n_frames,
    us_per_frame, duration_ms}`` from the main AVI header."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    meta: dict = {}
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            fourcc = content[pos : pos + 4]
            (size,) = struct.unpack_from("<I", content, pos + 4)
            body = pos + 8
            if fourcc in (b"RIFF", b"LIST"):
                walk(body + 4, min(body + size, end))
            elif fourcc == b"avih" and size >= 40:
                us_per_frame, _, _, _, n_frames = struct.unpack_from(
                    "<IIIII", content, body
                )
                width, height = struct.unpack_from("<II", content, body + 32)
                meta.update(
                    width=int(width),
                    height=int(height),
                    n_frames=int(n_frames),
                    us_per_frame=int(us_per_frame),
                    duration_ms=int(n_frames * us_per_frame // 1000),
                )
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(content[body : body + size])
            pos = body + size + (size & 1)  # chunks are word-aligned

    walk(12, len(content))
    if not meta:
        raise AviError("no avih header found")
    return meta, frames


def build_avi(
    frames: list[bytes], width: int, height: int, fps: float = 10.0
) -> bytes:
    """Assemble an MJPEG AVI from encoded frame payloads — the writer
    counterpart used by tests and fixture generation."""
    us_per_frame = int(1_000_000 / fps)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
