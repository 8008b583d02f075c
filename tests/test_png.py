"""PNG decoder (ext/png.py) — validated against a minimal encoder
written here (chunk writer + forward filters 0-4 + zlib). Round-
tripping known pixels is exact: PNG is lossless, so decode(encode(x))
must equal x bit-for-bit for every color type and filter type."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aws_greengrass_labs_database_influxdb_spark.ext.png import decode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _filter_row(f: int, line: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward (encoder-side) filter — the inverse of the decoder."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    n = len(line)
    left = np.roll(line, bpp)
    left[:bpp] = 0
    ul = np.roll(prev, bpp)
    ul[:bpp] = 0
    if f == 0:
        out = line
    elif f == 1:
        out = line - left
    elif f == 2:
        out = line - prev
    elif f == 3:
        out = line - ((left + prev) >> 1)
    elif f == 4:
        p = left + prev - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul))
        out = line - pred
    return bytes([f]) + bytes((out & 0xFF).astype(np.uint8))


def encode_png(
    px: np.ndarray,
    color_type: int,
    filters=None,
    palette: np.ndarray | None = None,
    interlace: int = 0,
    bit_depth: int = 8,
) -> bytes:
    """Minimal PNG encoder for tests: 8-bit, selectable per-row filter."""
    h, w, channels = px.shape
    stride = w * channels
    flat = px.reshape(h, stride)
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        raw.extend(_filter_row(filters[y], flat[y], prev, channels))
        prev = flat[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out.extend(
        _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace),
        )
    )
    if palette is not None:
        out.extend(_chunk(b"PLTE", bytes(palette.astype(np.uint8).ravel())))
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    out.extend(_chunk(b"IEND", b""))
    return bytes(out)


def _rand(shape, seed):
    return np.random.RandomState(seed).randint(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_rgb_roundtrip_each_filter(filter_type):
    px = _rand((5, 7, 3), seed=filter_type)
    blob = encode_png(px, color_type=2, filters=[filter_type] * 5)
    meta, rgb = decode_png(blob)
    assert (meta["width"], meta["height"]) == (7, 5)
    np.testing.assert_array_equal(rgb, px)


def test_mixed_filters_roundtrip():
    px = _rand((5, 4, 3), seed=99)
    blob = encode_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    _, rgb = decode_png(blob)
    np.testing.assert_array_equal(rgb, px)


def test_grayscale_expands_to_rgb():
    px = _rand((3, 3, 1), seed=1)
    _, rgb = decode_png(encode_png(px, color_type=0, filters=[4, 3, 1]))
    np.testing.assert_array_equal(rgb, np.repeat(px, 3, axis=2))


def test_rgba_drops_alpha():
    px = _rand((4, 2, 4), seed=2)
    _, rgb = decode_png(encode_png(px, color_type=6, filters=[2, 4, 1, 3]))
    np.testing.assert_array_equal(rgb, px[:, :, :3])


def test_gray_alpha():
    px = _rand((2, 5, 2), seed=3)
    _, rgb = decode_png(encode_png(px, color_type=4, filters=[1, 4]))
    np.testing.assert_array_equal(rgb, np.repeat(px[:, :, :1], 3, axis=2))


def test_palette_expansion():
    palette = _rand((16, 3), seed=4)
    idx = np.random.RandomState(5).randint(0, 16, (3, 4, 1), dtype=np.uint8)
    _, rgb = decode_png(encode_png(idx, color_type=3, palette=palette, filters=[0, 2, 1]))
    np.testing.assert_array_equal(rgb, palette[idx[:, :, 0]])


def test_multi_idat_chunks_concatenate():
    px = _rand((4, 4, 3), seed=6)
    blob = encode_png(px, color_type=2)
    # split the single IDAT into two chunks
    sig, rest = blob[:8], blob[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack_from(">I", rest, pos)
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln
    out = bytearray(sig)
    for ctype, data in chunks:
        if ctype == b"IDAT":
            mid = len(data) // 2
            out.extend(_chunk(b"IDAT", data[:mid]))
            out.extend(_chunk(b"IDAT", data[mid:]))
        else:
            out.extend(_chunk(ctype, data))
    _, rgb = decode_png(bytes(out))
    np.testing.assert_array_equal(rgb, px)


def test_unsupported_profiles_raise():
    px = _rand((2, 2, 3), seed=7)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(encode_png(px, color_type=2, bit_depth=4))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOTAPNG" + b"\x00" * 32)


# ---------------------------------------------- r6: 16-bit + Adam7

def encode_png16(px16: np.ndarray, color_type: int, filters=None) -> bytes:
    """16-bit encoder: big-endian sample bytes, filters over bytes
    with bpp = channels*2 (spec: filtering operates on bytes)."""
    h, w, channels = px16.shape
    bpp = channels * 2
    be = px16.astype(">u2").view(np.uint8).reshape(h, w * bpp)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    filters = filters if filters is not None else [0] * h
    for y in range(h):
        raw.extend(_filter_row(filters[y], be[y], prev, bpp))
        prev = be[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out.extend(_chunk(b"IHDR",
               struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)))
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    out.extend(_chunk(b"IEND", b""))
    return bytes(out)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_16bit_rgb_high_byte(filter_type):
    """16-bit samples decode to their high byte (the standard 8-bit
    presentation transform), under every filter type."""
    rng = np.random.RandomState(filter_type + 40)
    px16 = rng.randint(0, 65536, (5, 6, 3)).astype(np.uint16)
    _, rgb = decode_png(encode_png16(px16, 2, filters=[filter_type] * 5))
    np.testing.assert_array_equal(rgb, (px16 >> 8).astype(np.uint8))


def test_16bit_gray_expands_to_rgb():
    px16 = np.random.RandomState(3).randint(0, 65536, (4, 5, 1)).astype(np.uint16)
    meta, rgb = decode_png(encode_png16(px16, 0))
    assert meta["bit_depth"] == 16
    np.testing.assert_array_equal(rgb[:, :, 0], (px16[:, :, 0] >> 8).astype(np.uint8))
    np.testing.assert_array_equal(rgb[:, :, 0], rgb[:, :, 2])


def encode_png_adam7(px: np.ndarray, color_type: int) -> bytes:
    """Adam7 encoder: the 7 passes as independently-filtered
    sub-images (mixed filters to exercise the unfilter per pass)."""
    from aws_greengrass_labs_database_influxdb_spark.ext.png import ADAM7

    h, w, channels = px.shape
    raw = bytearray()
    for pi, (x0, y0, dx, dy) in enumerate(ADAM7):
        sub = px[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * channels)
        prev = np.zeros(pw * channels, dtype=np.uint8)
        for y in range(ph):
            raw.extend(_filter_row((pi + y) % 5, flat[y], prev, channels))
            prev = flat[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out.extend(_chunk(b"IHDR",
               struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)))
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    out.extend(_chunk(b"IEND", b""))
    return bytes(out)


@pytest.mark.parametrize("shape", [(16, 16), (13, 11), (3, 5), (1, 1)])
def test_adam7_roundtrip(shape):
    """Adam7 interlaced decode reproduces the exact pixels for
    multiple-of-8 and ragged sizes (empty passes included)."""
    px = _rand((*shape, 3), seed=shape[0] * 31 + shape[1])
    _, rgb = decode_png(encode_png_adam7(px, 2))
    np.testing.assert_array_equal(rgb, px)


def test_adam7_gray_alpha():
    px = _rand((10, 9, 2), seed=77)
    _, rgb = decode_png(encode_png_adam7(px, 4))
    np.testing.assert_array_equal(rgb[:, :, 0], px[:, :, 0])


def test_stdlib_decode_routes_png():
    from aws_greengrass_labs_database_influxdb_spark.ext.multimodal import stdlib_decode

    px = _rand((8, 8, 3), seed=8)
    feat = stdlib_decode(encode_png(px, color_type=2), "image")
    assert len(feat) == 16
    assert all(0.0 <= v <= 1.0 for v in feat)
    # deterministic and pixel-derived: same pixels → same feature
    assert feat == stdlib_decode(encode_png(px, color_type=2, filters=[1] * 8), "image")


# ---------------------------------------------- r6: 1/2/4-bit depths

def _pack_rows(samples: np.ndarray, depth: int) -> np.ndarray:
    """(h, w) sample values < 2^depth → (h, stride) MSB-first bytes."""
    h, w = samples.shape
    spb = 8 // depth
    stride = (w * depth + 7) // 8
    padded = np.zeros((h, stride * spb), dtype=np.uint8)
    padded[:, :w] = samples
    shifts = np.arange(spb - 1, -1, -1) * depth
    return (
        (padded.reshape(h, stride, spb).astype(np.uint16) << shifts)
        .sum(axis=2)
        .astype(np.uint8)
    )


def encode_png_subbyte(
    samples: np.ndarray,
    depth: int,
    color_type: int,
    palette: np.ndarray | None = None,
    filters=None,
) -> bytes:
    """Test encoder for 1/2/4-bit gray (0) / palette (3) images."""
    h, w = samples.shape
    rows = _pack_rows(samples, depth)
    stride = rows.shape[1]
    filters = filters if filters is not None else [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        raw.extend(_filter_row(filters[y], rows[y], prev, 1))
        prev = rows[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out.extend(_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 0)
    ))
    if palette is not None:
        out.extend(_chunk(b"PLTE", bytes(palette.astype(np.uint8).ravel())))
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    out.extend(_chunk(b"IEND", b""))
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray_roundtrip(depth):
    """1/2/4-bit grayscale: exact decode incl. the 255/(2^d-1)
    presentation scale, every filter type, non-byte-aligned width."""
    rng = np.random.default_rng(depth)
    h, w = 7, 13  # w*depth not a multiple of 8 → row padding bits
    samples = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
    filters = [(i % 5) for i in range(h)]
    meta, rgb = decode_png(encode_png_subbyte(samples, depth, 0, filters=filters))
    assert (meta["width"], meta["height"], meta["bit_depth"]) == (w, h, depth)
    scale = 255 // ((1 << depth) - 1)
    expect = np.repeat((samples * scale)[:, :, None], 3, axis=2)
    assert np.array_equal(rgb, expect)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette_roundtrip(depth):
    """1/2/4-bit palette: indices expand through PLTE, no scaling."""
    rng = np.random.default_rng(depth + 10)
    n_colors = 1 << depth
    palette = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    h, w = 5, 9
    idx = rng.integers(0, n_colors, (h, w)).astype(np.uint8)
    filters = [(i % 5) for i in range(h)]
    _, rgb = decode_png(
        encode_png_subbyte(idx, depth, 3, palette=palette, filters=filters)
    )
    assert np.array_equal(rgb, palette[idx])


def test_subbyte_adam7():
    """4-bit gray + Adam7: per-pass strides/padding handled."""
    rng = np.random.default_rng(99)
    h, w = 11, 10
    samples = rng.integers(0, 16, (h, w)).astype(np.uint8)
    raw = bytearray()
    from aws_greengrass_labs_database_influxdb_spark.ext.png import ADAM7

    for x0, y0, dx, dy in ADAM7:
        sub = samples[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        rows = _pack_rows(sub, 4)
        prev = np.zeros(rows.shape[1], dtype=np.uint8)
        for y in range(rows.shape[0]):
            raw.extend(_filter_row(y % 5, rows[y], prev, 1))
            prev = rows[y]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out.extend(_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 1)))
    out.extend(_chunk(b"IDAT", zlib.compress(bytes(raw))))
    out.extend(_chunk(b"IEND", b""))
    _, rgb = decode_png(bytes(out))
    assert np.array_equal(rgb, np.repeat((samples * 17)[:, :, None], 3, axis=2))


def test_subbyte_rgb_rejected():
    px = _rand((2, 2, 3), seed=3)
    with pytest.raises(ValueError, match="gray/palette"):
        decode_png(encode_png(px, color_type=2, bit_depth=2))
