"""Pure-stdlib/numpy PNG decoder (ISO/IEC 15948, RFC 2083).

PNG's only compression is DEFLATE — Python's own :mod:`zlib` — so no
codec library is needed at all: chunk walk, ``zlib.decompress``,
per-scanline unfilter (None/Sub/Up/Average/Paeth), sample expansion
to RGB. Together with the BMP/WAV parsers and the baseline JPEG
decoder this makes every *losslessly-specified* image path in the
multimodal stage (ext/multimodal.py) a real decode; only the
lossy-audio/video codecs (MP3/H.264) remain honestly stubbed.

Supported: every legal IHDR combination — bit depths 1/2/4 (gray +
palette; MSB-first bit unpack, gray samples scaled by
255/(2^d−1), the exact presentation transform), 8, and 16 (scales
to 8 via the high byte), color types 0 (gray), 2 (RGB), 3
(palette), 4 (gray+alpha), 6 (RGBA), Adam7 interlace (each of the
7 passes is an independently-filtered sub-image scattered back on
its grid), any filter mix.

Decode runs inside the same ``mapInPandas`` stage as the other
formats, so at 100 TB the bytes stay on executors and the per-blob
cost is the only change.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunks(content: bytes):
    pos = len(_SIGNATURE)
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IEND":
            return


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters → (h, stride) uint8.

    Sub is a per-lane cumulative sum (vectorized); Average/Paeth carry
    a left-pixel dependency, so those rows loop over pixels with the
    byte lanes vectorized.
    """
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    w = stride // bpp
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            rec = (np.cumsum(line.reshape(w, bpp), axis=0) & 0xFF).reshape(stride)
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                rec[x] = (rec[x] + ((left + pv[x]) >> 1)) & 0xFF
                left = rec[x]
            rec = rec.reshape(stride)
        elif f == 4:  # Paeth
            rec = line.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                p = left + pv[x] - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - pv[x]), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pv[x], ul)
                )
                rec[x] = (rec[x] + pred) & 0xFF
                left, ul = rec[x].astype(np.int32), pv[x]
            rec = rec.reshape(stride)
        else:
            raise ValueError(f"PNG: unknown filter type {f} on row {y}")
        out[y] = rec
        prev = rec.astype(np.int32)
    return out


def decode_png(content: bytes) -> tuple[dict, np.ndarray]:
    """Decode a PNG byte blob → ``(meta, rgb)`` with ``rgb`` shaped
    ``(height, width, 3)`` uint8 (alpha dropped, palette expanded)."""
    if content[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("PNG: bad signature")
    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, data in _chunks(content):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG: unsupported bit depth {depth}")
    if depth < 8 and color_type not in (0, 3):
        raise ValueError(
            f"PNG: bit depth {depth} is only valid for gray/palette"
        )
    if depth == 16 and color_type == 3:
        raise ValueError("PNG: 16-bit palette images are not valid PNG")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    channels = _CHANNELS[color_type]
    # filters operate on BYTES: for sub-byte depths bpp (the filter's
    # left-neighbor distance) is 1 byte (spec §9.2)
    bpp = max(1, channels * depth // 8)
    raw = zlib.decompress(bytes(idat))

    def _stride(pw: int) -> int:
        return (pw * channels * depth + 7) // 8

    def to_samples(pxb: np.ndarray, pw: int, ph: int) -> np.ndarray:
        """(ph, stride) filtered-out bytes → (ph, pw, channels) uint8.

        16-bit big-endian samples keep the high byte (the standard
        8-bit presentation transform); 1/2/4-bit samples unpack
        MSB-first with row-padding bits trimmed (spec §7.2).
        """
        if depth == 8:
            return pxb.reshape(ph, pw, channels)
        if depth == 16:
            return pxb.reshape(ph, pw, channels, 2)[:, :, :, 0]
        spb = 8 // depth  # samples per byte
        shifts = (np.arange(spb - 1, -1, -1, dtype=np.uint8) * depth)
        mask = (1 << depth) - 1
        samples = (pxb[:, :, None] >> shifts) & mask  # (ph, stride, spb)
        return samples.reshape(ph, -1)[:, :pw].reshape(ph, pw, 1)

    if interlace == 0:
        stride = _stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"PNG: decompressed size {len(raw)} != expected {h * (stride + 1)}"
            )
        px = to_samples(_unfilter(raw, h, stride, bpp), w, h)
    else:
        # Adam7: seven independently-filtered sub-images, each with
        # its own scanline filters, scattered back on the pass grid
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = _stride(pw)
            need = ph * (stride + 1)
            sub = raw[pos : pos + need]
            if len(sub) != need:
                raise ValueError("PNG: truncated Adam7 pass data")
            pos += need
            px[y0::dy, x0::dx] = to_samples(_unfilter(sub, ph, stride, bpp), pw, ph)
    if color_type == 0:  # gray
        if depth < 8:
            # exact presentation scale: 255/(2^d−1) is integral
            px = px * np.uint8(255 // ((1 << depth) - 1))
        rgb = np.repeat(px, 3, axis=2)
    elif color_type == 2:  # RGB
        rgb = px
    elif color_type == 3:  # palette
        if palette is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = palette[px[:, :, 0]]
    elif color_type == 4:  # gray + alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # RGBA
        rgb = px[:, :, :3]
    meta = {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color_type,
    }
    return meta, np.ascontiguousarray(rgb)
