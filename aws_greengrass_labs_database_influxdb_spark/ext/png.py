"""Pure-stdlib/numpy PNG decoder (ISO/IEC 15948, RFC 2083).

PNG's only compression is DEFLATE — Python's own :mod:`zlib` — so no
codec library is needed at all: chunk walk, ``zlib.decompress``,
per-scanline unfilter (None/Sub/Up/Average/Paeth), sample expansion
to RGB. Together with the BMP/WAV parsers and the baseline JPEG
decoder this makes every *losslessly-specified* image path in the
multimodal stage (ext/multimodal.py) a real decode; only the
lossy-audio/video codecs (MP3/H.264) remain honestly stubbed.

Supported: bit depths 8 and 16 (r6; 16-bit scales to 8 via the
high byte — the standard presentation transform), color types 0
(gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), Adam7
interlace (r6; each of the 7 passes is an independently-filtered
sub-image scattered back on its grid), any filter mix. NOT supported
(raise ValueError): 1/2/4-bit depths — production corpora route
those through a real codec via the stage's ``decode_fn`` hook.

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
    if depth not in (8, 16):
        raise ValueError(f"PNG: unsupported bit depth {depth} (only 8/16)")
    if depth == 16 and color_type == 3:
        raise ValueError("PNG: 16-bit palette images are not valid PNG")
    if color_type not in _CHANNELS:
        raise ValueError(f"PNG: unknown color type {color_type}")
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: unknown interlace method {interlace}")
    channels = _CHANNELS[color_type]
    bps = depth // 8  # bytes per sample
    bpp = channels * bps
    raw = zlib.decompress(bytes(idat))

    def to_samples(pxb: np.ndarray, pw: int, ph: int) -> np.ndarray:
        """(ph, pw*bpp) filtered-out bytes → (ph, pw, channels) uint8
        (16-bit big-endian samples keep the high byte — the standard
        8-bit presentation transform)."""
        if bps == 1:
            return pxb.reshape(ph, pw, channels)
        return pxb.reshape(ph, pw, channels, 2)[:, :, :, 0]

    if interlace == 0:
        stride = w * bpp
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
            stride = pw * bpp
            need = ph * (stride + 1)
            sub = raw[pos : pos + need]
            if len(sub) != need:
                raise ValueError("PNG: truncated Adam7 pass data")
            pos += need
            px[y0::dy, x0::dx] = to_samples(_unfilter(sub, ph, stride, bpp), pw, ph)
    if color_type == 0:  # gray
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
