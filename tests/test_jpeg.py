"""Baseline JPEG decoder (ext/jpeg.py) — validated against a minimal
encoder written here (forward DCT + quantize + T.81 Annex K Huffman
tables). The encoder exists only for tests: round-tripping known
pixels through encode→decode bounds the reconstruction error by the
quantization step, which for an all-ones table is pure DCT rounding
(≤1 per channel)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_greengrass_labs_database_influxdb_spark.ext.jpeg import ZIGZAG, _A, decode_jpeg

# T.81 Annex K.3.3 luminance DC/AC Huffman specs: (counts, symbols)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _codes(counts, symbols):
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8

    def flush(self):
        if self.n:
            b = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n = 0


def _magnitude(v):
    if v == 0:
        return 0, 0
    n = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return (v if v > 0 else v + (1 << n) - 1), n


def encode_gray_jpeg(pixels: np.ndarray, quant: np.ndarray) -> bytes:
    """Minimal baseline encoder: grayscale, 4:4:4 (single component),
    Annex K luminance Huffman tables, caller-supplied quant table."""
    h, w = pixels.shape
    dc = _codes(*DC_LUM)
    ac = _codes(*AC_LUM)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(quant[ZIGZAG].astype(np.uint8))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for cls, (counts, symbols) in ((0, DC_LUM), (1, AC_LUM)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(counts), cls << 4)
        out += bytes(counts) + bytes(symbols)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    bw = _BitWriter()
    pred = 0
    pad_y = (h + 7) // 8 * 8
    pad_x = (w + 7) // 8 * 8
    padded = np.pad(pixels.astype(np.float64), ((0, pad_y - h), (0, pad_x - w)), "edge")
    for y0 in range(0, pad_y, 8):
        for x0 in range(0, pad_x, 8):
            blk = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coeff = _A @ blk @ _A.T
            qz = np.round(coeff.ravel()[ZIGZAG] / quant[ZIGZAG]).astype(int)
            diff = qz[0] - pred
            pred = qz[0]
            mag, n = _magnitude(diff)
            bw.write(*dc[n])
            if n:
                bw.write(mag, n)
            k = 1
            run = 0
            last_nz = max([i for i in range(1, 64) if qz[i]], default=0)
            while k <= last_nz:
                if qz[k] == 0:
                    run += 1
                    k += 1
                    continue
                while run > 15:
                    bw.write(*ac[0xF0])  # ZRL
                    run -= 16
                mag, n = _magnitude(int(qz[k]))
                bw.write(*ac[(run << 4) | n])
                bw.write(mag, n)
                run = 0
                k += 1
            if last_nz < 63:
                bw.write(*ac[0x00])  # EOB
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def _rng_image(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def test_roundtrip_flat_ones_quant_exact():
    """Uniform block + all-ones quant: DCT of a constant is a single
    DC coefficient — reconstruction must be exact."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    meta, rgb = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))
    assert (meta["width"], meta["height"]) == (8, 8)
    assert np.array_equal(rgb[:, :, 0], img)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])


def test_roundtrip_random_ones_quant_within_rounding():
    """All-ones quant table: the only loss is DCT coefficient rounding,
    which bounds per-pixel error tightly."""
    img = _rng_image(24, 16)
    meta, rgb = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))
    err = np.abs(rgb[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_roundtrip_nonmultiple_of_8_crops():
    img = _rng_image(10, 13, seed=3)
    meta, rgb = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))
    assert (meta["height"], meta["width"]) == (10, 13)
    assert rgb.shape == (10, 13, 3)
    err = np.abs(rgb[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_roundtrip_coarse_quant_still_close():
    """A real (coarse) quant table: error bounded by the quant step
    spread across the block — sanity that dequantization multiplies by
    the right table entries in the right zigzag order."""
    quant = np.clip(np.arange(64) + 10, 10, 50).astype(float)
    img = _rng_image(16, 16, seed=11)
    # smooth the image so coarse quantization of highs loses little
    smooth = img.astype(float)
    for _ in range(3):
        smooth = (np.roll(smooth, 1, 0) + np.roll(smooth, -1, 0)
                  + np.roll(smooth, 1, 1) + np.roll(smooth, -1, 1) + smooth) / 5
    simg = smooth.astype(np.uint8)
    _, rgb = decode_jpeg(encode_gray_jpeg(simg, quant))
    err = np.abs(rgb[:, :, 0].astype(int) - simg.astype(int))
    assert err.mean() < 10 and err.max() < 60


def test_arithmetic_coding_rejected():
    img = _rng_image(8, 8)
    data = bytearray(encode_gray_jpeg(img, np.ones(64)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC9  # rewrite marker to arithmetic sequential
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(data))


# ------------------------------------------------------ progressive (r6)

def encode_gray_progressive_jpeg(
    pixels: np.ndarray, quant: np.ndarray, scans: list[tuple[int, int, int, int]]
) -> bytes:
    """Minimal progressive encoder (grayscale) for decoder tests:
    caller supplies the scan script as (Ss, Se, Ah, Al) tuples. DC
    scans use the T.81 arithmetic-shift point transform; AC first
    scans truncate magnitudes toward zero and accumulate cross-block
    EOB runs (exercising the decoder's EOBn path); AC refinement
    emits correction bits exactly as G.1.2.3 expects back."""
    h, w = pixels.shape
    dc = _codes(*DC_LUM)
    # progressive scans need EOBn symbols (0x10..0xE0) that Annex K's
    # baseline AC table does not define — use a flat custom table
    # (every run/size symbol at code length 9), as real progressive
    # encoders ship optimized custom tables in their DHT
    ac_syms = sorted(
        {((r << 4) | s) for r in range(16) for s in range(11)} | {0xF0}
    )
    AC_PROG = ([0] * 8 + [len(ac_syms)] + [0] * 7, ac_syms)
    ac = _codes(*AC_PROG)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(quant[ZIGZAG].astype(np.uint8))
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1) + bytes([1, 0x11, 0])
    for cls, (counts, symbols) in ((0, DC_LUM), (1, AC_PROG)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(counts), cls << 4)
        out += bytes(counts) + bytes(symbols)

    # quantized blocks in zigzag order, row-major
    pad_y, pad_x = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(pixels.astype(np.float64), ((0, pad_y - h), (0, pad_x - w)), "edge")
    blocks = []
    for y0 in range(0, pad_y, 8):
        for x0 in range(0, pad_x, 8):
            blk = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coeff = _A @ blk @ _A.T
            blocks.append(np.round(coeff.ravel()[ZIGZAG] / quant[ZIGZAG]).astype(int))

    def emit_eobrun(bw, bits, count):
        while count:
            n = min(14, count.bit_length() - 1)
            ext = count - (1 << n)
            if ext >= (1 << n):  # can't extend this far — split
                n_count = (1 << n)
                bw.write(*ac[(n << 4)])
                if n:
                    bw.write((1 << n) - 1, n)  # max extension
                count -= (1 << n) + ((1 << n) - 1)
                continue
            bw.write(*ac[(n << 4)])
            if n:
                bw.write(ext, n)
            for b in bits:
                bw.write(b, 1)
            bits.clear()
            count = 0

    for ss, se, ah, al in scans:
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes(
            [1, 0x00, ss, se, (ah << 4) | al])
        bw = _BitWriter()
        if ss == 0:
            if ah == 0:  # DC first (arithmetic shift point transform)
                pred = 0
                for qz in blocks:
                    v = int(qz[0]) >> al
                    diff = v - pred
                    pred = v
                    mag, n = _magnitude(diff)
                    bw.write(*dc[n])
                    if n:
                        bw.write(mag, n)
            else:  # DC refinement: bit Al of each DC value
                for qz in blocks:
                    bw.write((int(qz[0]) >> al) & 1, 1)
        elif ah == 0:  # AC first with cross-block EOB runs
            eobrun = 0
            for qz in blocks:
                vals = [
                    (1 if qz[k] > 0 else -1) * (abs(int(qz[k])) >> al)
                    for k in range(ss, se + 1)
                ]
                nz = [i for i, v in enumerate(vals) if v]
                if not nz:
                    eobrun += 1
                    continue
                if eobrun:
                    emit_eobrun(bw, [], eobrun)
                    eobrun = 0
                run = 0
                for i in range(nz[-1] + 1):
                    if vals[i] == 0:
                        run += 1
                        continue
                    while run > 15:
                        bw.write(*ac[0xF0])
                        run -= 16
                    mag, n = _magnitude(vals[i])
                    bw.write(*ac[(run << 4) | n])
                    bw.write(mag, n)
                    run = 0
                if nz[-1] < se - ss:
                    eobrun = 1  # early EOB merges into the run
            if eobrun:
                emit_eobrun(bw, [], eobrun)
        else:  # AC refinement (mirror of decoder G.1.2.3)
            eobrun = 0
            ebits: list[int] = []
            for qz in blocks:
                t = [abs(int(qz[k])) >> al for k in range(ss, se + 1)]
                hist = [abs(int(qz[k])) >> ah for k in range(ss, se + 1)]
                sign = [1 if qz[k] > 0 else -1 for k in range(ss, se + 1)]
                newly = [i for i, (tv, hv) in enumerate(zip(t, hist))
                         if hv == 0 and tv != 0]
                if not newly:
                    eobrun += 1
                    # correction bits of this block join the run's bits
                    ebits += [tv & 1 for tv, hv in zip(t, hist) if hv != 0]
                    continue
                if eobrun:
                    emit_eobrun(bw, ebits, eobrun)
                    eobrun, ebits = 0, []
                # event stream since the last symbol: zero-history
                # zeros ('Z') interleaved with correction bits — a ZRL
                # must carry ONLY the corrections among its 16 zeros
                # (the decoder walk consumes them positionally)
                run = 0
                events: list = []
                last_new = newly[-1]
                for i in range(last_new + 1):
                    if hist[i] != 0:
                        events.append(t[i] & 1)
                    elif t[i] == 0:
                        events.append("Z")
                        run += 1
                    else:  # newly significant (t must be 1)
                        while run > 15:
                            bw.write(*ac[0xF0])
                            zc = 0
                            while zc < 16:
                                ev = events.pop(0)
                                if ev == "Z":
                                    zc += 1
                                else:
                                    bw.write(ev, 1)
                            run -= 16
                        bw.write(*ac[(run << 4) | 1])
                        bw.write(1 if sign[i] > 0 else 0, 1)
                        for ev in events:
                            if ev != "Z":
                                bw.write(ev, 1)
                        events, run = [], 0
                # trailing corrections after the last new coefficient
                tail = [t[i] & 1 for i in range(last_new + 1, len(t))
                        if hist[i] != 0]
                rest = [ev for ev in events if ev != "Z"] + tail
                if run or rest:
                    eobrun, ebits = 1, rest
            if eobrun:
                emit_eobrun(bw, ebits, eobrun)
        bw.flush()
        out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape,seed", [((24, 16), 7), ((10, 13), 3)])
def test_progressive_spectral_selection_matches_baseline(shape, seed):
    """Spectral-selection-only scan script (Al=0): progressive decode
    must equal the baseline decode of the same quantized data exactly
    — including cross-block EOB runs and non-multiple-of-8 crops."""
    img = _rng_image(*shape, seed=seed)
    base = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))[1]
    prog = decode_jpeg(encode_gray_progressive_jpeg(
        img, np.ones(64), [(0, 0, 0, 0), (1, 5, 0, 0), (6, 63, 0, 0)]))[1]
    assert np.array_equal(base, prog)


def test_progressive_successive_approximation_exact():
    """Full successive-approximation script: DC first at Al=1 + DC
    refine, AC first at Al=1 + AC refine — the refinement paths must
    reconstruct the exact quantized coefficients."""
    img = _rng_image(24, 24, seed=11)
    base = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))[1]
    prog = decode_jpeg(encode_gray_progressive_jpeg(
        img, np.ones(64),
        [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)]))[1]
    assert np.array_equal(base, prog)


def test_progressive_smooth_image_eob_runs():
    """A smooth (low-frequency) image makes most AC bands empty —
    long EOB runs across blocks exercise the EOBn extension bits."""
    img = np.tile(np.linspace(60, 200, 32).astype(np.uint8), (32, 1))
    base = decode_jpeg(encode_gray_jpeg(img, np.ones(64)))[1]
    prog = decode_jpeg(encode_gray_progressive_jpeg(
        img, np.ones(64), [(0, 0, 0, 0), (1, 63, 0, 0)]))[1]
    assert np.array_equal(base, prog)


def test_not_jpeg_rejected():
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"BM123456")


def test_stdlib_decode_routes_jpeg():
    """The multimodal feature extractor must route JPEG magic through
    the real decoder now (no NotImplementedError) and produce the same
    4x4 thumbnail feature shape as the BMP path."""
    from aws_greengrass_labs_database_influxdb_spark.ext.multimodal import stdlib_decode

    img = _rng_image(16, 16, seed=5)
    feat = stdlib_decode(encode_gray_jpeg(img, np.ones(64)), "image")
    assert len(feat) == 16
    assert all(0.0 <= v <= 1.0 for v in feat)
    # feature matches the decoder's own pixels
    from aws_greengrass_labs_database_influxdb_spark.ext.jpeg import decode_jpeg as dj
    from aws_greengrass_labs_database_influxdb_spark.ext.multimodal import resize_nearest

    _, rgb = dj(encode_gray_jpeg(img, np.ones(64)))
    gray = rgb.astype(np.float64).mean(axis=2)
    thumb = resize_nearest(gray[:, :, None], 4, 4)[:, :, 0]
    assert feat == [float(v) / 255.0 for v in thumb.ravel()]


def encode_color_jpeg(rgb: np.ndarray, quant: np.ndarray, subsample: bool = False) -> bytes:
    """Color (YCbCr) baseline encoder: 4:4:4 or 4:2:0, luminance
    Huffman/quant tables reused for chroma (legal — table ids are
    per-component declarations). Exercises the decoder's interleaved
    MCU loop and the chroma upsample path."""
    h, w = rgb.shape[:2]
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = (b - (y + 128.0)) / 1.772
    cr = (r - (y + 128.0)) / 1.402
    hs, vs = (2, 2) if subsample else (1, 1)
    mcux = (w + 8 * hs - 1) // (8 * hs)
    mcuy = (h + 8 * vs - 1) // (8 * vs)

    def _pad(p, ph, pw):
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), "edge")

    y_p = _pad(y, mcuy * vs * 8, mcux * hs * 8)
    if subsample:
        cbs = _pad(cb, mcuy * vs * 8, mcux * hs * 8)
        crs = _pad(cr, mcuy * vs * 8, mcux * hs * 8)
        cb_p = cbs.reshape(mcuy * 8, vs, mcux * 8, hs).mean(axis=(1, 3))
        cr_p = crs.reshape(mcuy * 8, vs, mcux * 8, hs).mean(axis=(1, 3))
    else:
        cb_p, cr_p = _pad(cb, mcuy * 8, mcux * 8), _pad(cr, mcuy * 8, mcux * 8)

    dc = _codes(*DC_LUM)
    ac = _codes(*AC_LUM)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes(quant[ZIGZAG].astype(np.uint8))
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0])
    for cls, (counts, symbols) in ((0, DC_LUM), (1, AC_LUM)):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + sum(counts), cls << 4)
        out += bytes(counts) + bytes(symbols)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3) + bytes([1, 0, 2, 0, 3, 0, 0, 63, 0])
    bw = _BitWriter()
    pred = {1: 0, 2: 0, 3: 0}

    def _block(bw, plane, y0, x0, cid):
        blk = plane[y0 : y0 + 8, x0 : x0 + 8]
        coeff = _A @ blk @ _A.T
        qz = np.round(coeff.ravel()[ZIGZAG] / quant[ZIGZAG]).astype(int)
        diff = qz[0] - pred[cid]
        pred[cid] = qz[0]
        mag, n = _magnitude(int(diff))
        bw.write(*dc[n])
        if n:
            bw.write(mag, n)
        k = 1
        run = 0
        last_nz = max([i for i in range(1, 64) if qz[i]], default=0)
        while k <= last_nz:
            if qz[k] == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                bw.write(*ac[0xF0])
                run -= 16
            mag, n = _magnitude(int(qz[k]))
            bw.write(*ac[(run << 4) | n])
            bw.write(mag, n)
            run = 0
            k += 1
        if last_nz < 63:
            bw.write(*ac[0x00])

    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(vs):
                for bx in range(hs):
                    _block(bw, y_p, (my * vs + by) * 8, (mx * hs + bx) * 8, 1)
            _block(bw, cb_p, my * 8, mx * 8, 2)
            _block(bw, cr_p, my * 8, mx * 8, 3)
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    return bytes(out)


def _rng_rgb(h, w, seed=9):
    rng = np.random.RandomState(seed)
    # smooth so chroma subsampling loses little
    img = rng.randint(0, 256, size=(h, w, 3)).astype(float)
    for _ in range(4):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1) + img) / 5
    return img.astype(np.uint8)


def test_color_444_roundtrip():
    img = _rng_rgb(16, 24)
    meta, rgb = decode_jpeg(encode_color_jpeg(img, np.ones(64), subsample=False))
    assert meta["components"] == 3 and rgb.shape == (16, 24, 3)
    err = np.abs(rgb.astype(int) - img.astype(int))
    assert err.max() <= 4, err.max()  # DCT + colorspace rounding


def test_color_420_roundtrip():
    """4:2:0: the decoder's chroma upsample path. Smooth image ⇒ the
    2×2 chroma average then nearest-upsample stays close."""
    img = _rng_rgb(32, 32, seed=13)
    meta, rgb = decode_jpeg(encode_color_jpeg(img, np.ones(64), subsample=True))
    assert rgb.shape == (32, 32, 3)
    err = np.abs(rgb.astype(int) - img.astype(int))
    # loss = 2x2 chroma averaging + nearest upsample, not the decoder
    assert err.mean() < 8 and err.max() < 64, (err.mean(), err.max())
