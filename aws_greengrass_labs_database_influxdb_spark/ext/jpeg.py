"""Pure-Python/numpy JPEG (ITU-T.81) decoder: baseline sequential AND
progressive DCT.

Closes the largest honestly-stubbed codec gap in the multimodal stage
(ext/multimodal.py): the container ships no codec libraries, but
Huffman-coded JPEG needs none — marker parse, entropy decode,
dequantize, IDCT, chroma upsample, YCbCr→RGB are all expressible in
numpy. Supported: baseline sequential (SOF0/1), progressive (SOF2,
r6 — spectral selection + successive approximation, DC/AC first and
refinement scans with EOB runs, T.81 G.1.2), 8-bit precision, 1 or 3
components, any sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart
markers. NOT supported (raise ValueError): arithmetic coding, 12-bit,
hierarchical, lossless — production corpora route those through a
real codec via ``decode_fn``.

Decode runs inside the same ``mapInPandas`` stage as the other
formats, so at 100 TB the bytes stay on executors and the per-blob
cost is the only change.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis: spatial = A.T @ coeff @ A
_A = np.array([
    [(np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


class _Huff:
    """Canonical Huffman table as (length → {code: symbol}) lookup."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[int, dict[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            self.lut[length] = {}
            for _ in range(counts[length - 1]):
                self.lut[length][code] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-stuffing removal; stops at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                raise _RestartMarker
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        out = (self.bits >> self.nbits) & ((1 << n) - 1)
        return out

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.lut[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Consume an RSTn marker and realign to a byte boundary."""
        self.nbits = 0
        self.bits = 0
        while self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _extend(v: int, n: int) -> int:
    """JPEG signed-magnitude extension (T.81 F.2.2.1)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_jpeg(content: bytes) -> tuple[dict, np.ndarray]:
    """Baseline JPEG → ``(meta, pixels)``; pixels is ``(h, w, 3)``
    uint8 RGB (grayscale replicated to 3 channels)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart = 0
    coeffs = None  # progressive: per-component zigzag coeff grids
    pos = 2
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", content, pos + 2)[0]
        seg = content[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=i)
                    i += 64
                qt[tid] = vals.astype(np.int32)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline and progressive DCT JPEG supported"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                huff[(cls, tid)] = _Huff(counts, seg[i + 17 : i + 17 + n])
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = {}
            order = []
            for c in range(ns):
                cid, tbl = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tbl >> 4, tbl & 0xF)
                order.append(cid)
            if frame is None:
                raise ValueError("SOS before SOF")
            if not frame.get("progressive"):
                return _decode_scan(
                    content, pos + 2 + seglen, frame, qt, huff, scan, restart
                )
            # progressive: Ss/Se spectral band, Ah/Al bit positions
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            if coeffs is None:
                coeffs = _coeff_arrays(frame)
            pos = _decode_progressive_scan(
                content, pos + 2 + seglen, frame, huff, scan, order,
                restart, coeffs, ss, se, ah, al,
            )
            # skip to the next marker (trailing entropy padding may
            # contain stuffed 0xFF00 / RSTn bytes the main loop would
            # misparse as segments)
            while pos + 1 < len(content) and (
                content[pos] != 0xFF
                or content[pos + 1] in (0x00,)
                or 0xD0 <= content[pos + 1] <= 0xD7
            ):
                pos += 1
            continue
        pos += 2 + seglen
    if frame is not None and frame.get("progressive") and coeffs is not None:
        return _reconstruct(frame, qt, coeffs)
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, qt, huff, scan, restart):
    if frame is None:
        raise ValueError("SOS before SOF")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    rd = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                rd.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            try:
                for c in comps:
                    dc_t = huff[(0, scan[c["id"]][0])]
                    ac_t = huff[(1, scan[c["id"]][1])]
                    q = qt[c["q"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(rd, dc_t, ac_t, q, pred, c["id"])
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _RestartMarker:
                raise ValueError("unexpected restart marker") from None
            mcu_count += 1
    out = []
    for c in comps:
        p = planes[c["id"]]
        # upsample subsampled chroma to full MCU grid, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    meta = {"width": w, "height": h, "components": len(comps)}
    if len(out) == 1:
        g = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return meta, np.dstack([g, g, g])
    y, cb, cr = out[0] + 128, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.dstack([r, g, b])
    return meta, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(rd, dc_t, ac_t, q, pred, cid):
    coeff = np.zeros(64, dtype=np.int32)
    n = rd.huff(dc_t)
    diff = _extend(rd.read(n), n)
    pred[cid] += diff
    coeff[0] = pred[cid]
    k = 1
    while k < 64:
        sym = rd.huff(ac_t)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coeff[k] = _extend(rd.read(size), size)
        k += 1
    dq = np.zeros(64, dtype=np.float64)
    dq[ZIGZAG] = coeff * q[np.arange(64)]
    return _A.T @ dq.reshape(8, 8) @ _A


# ----------------------------------------------------------- progressive

def _geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcux, mcuy


def _coeff_arrays(frame):
    """Zigzag-order coefficient grid per component, MCU-padded —
    progressive scans accumulate into these across the whole file."""
    _, _, mcux, mcuy = _geometry(frame)
    return {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _nonil_blocks(frame, c):
    """Non-interleaved scan block grid for one component (T.81 A.2.2:
    ceil(comp samples / 8), NOT the MCU-padded grid)."""
    hmax, vmax, _, _ = _geometry(frame)
    cw = (frame["w"] * c["h"] + hmax - 1) // hmax
    ch = (frame["h"] * c["v"] + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def _decode_progressive_scan(
    data, pos, frame, huff, scan, order, restart, coeffs, ss, se, ah, al
):
    """One progressive scan (T.81 G.1.2) into the coefficient grids;
    returns the stream position after the entropy data."""
    comps = [c for c in frame["comps"] if c["id"] in scan]
    rd = _BitReader(data, pos)
    state = {"eobrun": 0, "pred": {c["id"]: 0 for c in comps}}

    def block_iter():
        if ss == 0 and len(comps) > 1:
            # interleaved DC scan: MCU order
            _, _, mcux, mcuy = _geometry(frame)
            for my in range(mcuy):
                for mx in range(mcux):
                    for c in comps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                yield c, my * c["v"] + by, mx * c["h"] + bx
        else:
            # single-component scan (every AC scan; DC when ns == 1)
            c = comps[0]
            bh, bw = _nonil_blocks(frame, c)
            for by in range(bh):
                for bx in range(bw):
                    yield c, by, bx

    # restart intervals count MCUs (interleaved) or blocks (single)
    unit = 0
    for c, by, bx in block_iter():
        if ss == 0 and len(comps) > 1:
            is_unit_start = (by % c["v"] == 0 and bx % c["h"] == 0
                             and c is comps[0])
        else:
            is_unit_start = True
        if restart and is_unit_start and unit and unit % restart == 0:
            rd.sync_restart()
            state["eobrun"] = 0
            state["pred"] = {cc["id"]: 0 for cc in comps}
        if is_unit_start:
            unit += 1
        blk = coeffs[c["id"]][by, bx]
        if ss == 0:
            if ah == 0:
                n = rd.huff(huff[(0, scan[c["id"]][0])])
                diff = _extend(rd.read(n), n)
                state["pred"][c["id"]] += diff
                blk[0] = state["pred"][c["id"]] << al
            else:  # DC refinement: one correction bit
                if rd.read(1):
                    blk[0] |= 1 << al
        else:
            ac_t = huff[(1, scan[c["id"]][1])]
            if ah == 0:
                _ac_first(rd, ac_t, blk, ss, se, al, state)
            else:
                _ac_refine(rd, ac_t, blk, ss, se, al, state)
    return rd.pos


def _ac_first(rd, ac_t, blk, ss, se, al, state):
    """AC first scan for one block (T.81 G.1.2.2) with EOB runs."""
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        sym = rd.huff(ac_t)
        run, size = sym >> 4, sym & 0xF
        if size == 0:
            if run < 15:  # EOBn: run of all-zero bands
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += rd.read(run)
                return
            k += 16  # ZRL
            continue
        k += run
        if k > se:
            raise ValueError("AC run past end of spectral band")
        blk[k] = _extend(rd.read(size), size) << al
        k += 1


def _ac_refine(rd, ac_t, blk, ss, se, al, state):
    """AC refinement scan for one block (T.81 G.1.2.3): correction
    bits for already-nonzero coefficients, newly significant ones
    appear with magnitude 1<<al."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if rd.read(1) and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            sym = rd.huff(ac_t)
            run, size = sym >> 4, sym & 0xF
            val = 0
            if size == 0:
                if run < 15:
                    # EOBn counts the CURRENT block too: its remaining
                    # coefficients still receive correction bits in the
                    # tail below (T.81 G.1.2.3) — hence no -1 here,
                    # and the tail decrements for this block
                    state["eobrun"] = 1 << run
                    if run:
                        state["eobrun"] += rd.read(run)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("invalid AC refinement symbol")
                val = p1 if rd.read(1) else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if run == 0:
                        if val:
                            blk[k] = val
                        k += 1
                        break
                    run -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        state["eobrun"] -= 1


def _reconstruct(frame, qt, coeffs):
    """Dequantize + IDCT the accumulated progressive coefficients —
    identical pixel path to the baseline decoder from here on."""
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax, vmax, _, _ = _geometry(frame)
    out = []
    for c in comps:
        grid = coeffs[c["id"]]
        by, bx = grid.shape[:2]
        q = qt[c["q"]]
        plane = np.zeros((by * 8, bx * 8), dtype=np.float64)
        # vectorized dezigzag+dequant over all blocks, then per-block IDCT
        dq = np.zeros((by, bx, 64), dtype=np.float64)
        dq[:, :, ZIGZAG] = grid * q[np.arange(64)]
        blocks = dq.reshape(by, bx, 8, 8)
        spatial = np.einsum("ux,ybuv,vz->ybxz", _A, blocks, _A, optimize=True)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    meta = {"width": w, "height": h, "components": len(comps)}
    if len(out) == 1:
        g = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return meta, np.dstack([g, g, g])
    y, cb, cr = out[0] + 128, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.dstack([r, g, b])
    return meta, np.clip(np.round(rgb), 0, 255).astype(np.uint8)
