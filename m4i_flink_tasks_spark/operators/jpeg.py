"""JPEG decode with stdlib + numpy — no codec libraries.

Supported profile: baseline, extended-sequential AND progressive
Huffman JPEG (SOF0/SOF1/SOF2), 8-bit precision, grayscale or YCbCr
with any 1/2x subsampling factors, restart markers, multi-table
DQT/DHT segments. Hierarchical, arithmetic-coded and 12-bit streams
raise ``NotImplementedError`` at the codec seam (plug PIL there);
malformed streams return ``None`` so the caller's byte-fake fallback
applies.

The decoder is coefficient-accumulating: every SOS scan decodes into
per-component coefficient grids (sequential scans write whole blocks;
progressive DC first/refine and AC first/refine scans — spectral
selection, successive approximation, EOB runs — update bands and
bits), and the image renders once at EOI: dequant → zigzag → IDCT
(vectorized: one 8×8 orthonormal basis matmul per block) → level
shift → nearest-neighbor chroma upsample → YCbCr→RGB. Decode is
validated by independent ENCODERS (baseline and multi-scan
progressive, written against the spec) that round-trip pixels within
quantization error and must agree with each other exactly, plus
real-world files where available.

Scale note: this runs inside the multimodal ``mapInPandas`` batches
(operators/multimodal.py) — per-payload Python is the accepted cost at
the decode seam, the same position a PIL/libjpeg call would occupy.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the coefficient stream -> (row, col)
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal 8x8 DCT-II basis: spatial = A.T @ coeffs @ A
_A = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _Marker(Exception):
    pass


class _Bits:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops (raises
    ``_Marker``) at any real marker so the MCU loop can handle RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise _Marker
            b = self.d[self.p]
            if b == 0xFF:
                if self.p + 1 < len(self.d) and self.d[self.p + 1] == 0x00:
                    self.p += 2
                else:
                    raise _Marker
            else:
                self.p += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_consume_rst(self) -> None:
        self.n = 0
        if (
            self.p + 1 < len(self.d)
            and self.d[self.p] == 0xFF
            and 0xD0 <= self.d[self.p + 1] <= 0xD7
        ):
            self.p += 2
        else:
            raise ValueError("expected restart marker")


def _build_huffman(counts: list[int], symbols: bytes) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code")


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decode: t-bit value v -> signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_block(bits: _Bits, dc_tbl: dict, ac_tbl: dict, pred: int):
    coeffs = np.zeros(64, np.int32)
    t = _huff_decode(bits, dc_tbl)
    diff = _extend(bits.bits(t), t)
    dc = pred + diff
    coeffs[0] = dc
    k = 1
    while k < 64:
        rs = _huff_decode(bits, ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index out of range")
        coeffs[k] = _extend(bits.bits(s), s)
        k += 1
    return coeffs, dc


def decode_jpeg_baseline(b: bytes) -> dict | None:
    """Parse + fully decode; returns {width, height, n_components,
    mean_value} (mean over RGB bytes for color, gray for 1-component).
    None on malformed input; NotImplementedError outside the profile."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    coeff = None
    dri = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            return None
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg, np.uint8, count=64, offset=p
                ).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                tbl = _build_huffman(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/arithmetic JPEG — plug "
                "PIL.Image.open at this seam"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            scan = []
            ns = seg[0]
            for i in range(ns):
                cid, tables = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cid), None
                )
                if comp is None:
                    return None
                scan.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            if coeff is None:
                coeff = _coeff_store(frame)
            try:
                pos = _decode_scan_coeffs(
                    b, pos + 2 + seg_len, frame, scan, coeff,
                    qt, huff_dc, huff_ac, dri,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
            except (_Marker, ValueError, IndexError, EOFError):
                return None
            # resync to the next marker (skip fill 0xFF bytes)
            while pos + 1 < len(b) and not (
                b[pos] == 0xFF and b[pos + 1] not in (0x00, 0xFF)
            ):
                pos += 1
            if pos + 1 < len(b) and b[pos + 1] == 0xD9:
                return _render(frame, coeff, qt)
            continue
        # APPn / COM / others: skip
        pos += 2 + seg_len
    return None


def _grid_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _coeff_store(frame):
    """Per-component coefficient grids covering the padded MCU area."""
    _, _, mcus_x, mcus_y = _grid_geometry(frame)
    return {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int64)
        for c in frame["comps"]
    }


def _comp_blocks(frame, comp):
    """Non-interleaved scan geometry: the component's OWN block counts
    (ceil of its sample dims / 8), not the MCU-padded grid."""
    hmax, vmax, _, _ = _grid_geometry(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _decode_scan_coeffs(
    b, pos, frame, scan, coeff, qt, huff_dc, huff_ac, dri, ss, se, ah, al
):
    """Decode one entropy-coded scan into the coefficient store and
    return the stream position after its data. Sequential scans carry
    whole blocks; progressive scans carry a spectral band at one
    successive-approximation precision."""
    bits = _Bits(b, pos)
    progressive = frame.get("progressive", False)
    if not progressive:
        _scan_sequential(bits, frame, scan, coeff, huff_dc, huff_ac, dri)
    elif ss == 0:
        _scan_dc(bits, frame, scan, coeff, huff_dc, dri, ah, al)
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        _scan_ac(bits, frame, scan[0], coeff, huff_ac, dri, ss, se, ah, al)
    return bits.p


def _mcu_iter(bits, n_mcus, dri, on_restart):
    """Yield MCU indices, consuming restart markers every ``dri``."""
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            bits.align_and_consume_rst()
            on_restart()
        yield m


def _scan_sequential(bits, frame, scan, coeff, huff_dc, huff_ac, dri):
    _, _, mcus_x, mcus_y = _grid_geometry(frame)
    preds = {c["id"]: 0 for c in scan}

    def reset():
        for k in preds:
            preds[k] = 0

    for m in _mcu_iter(bits, mcus_x * mcus_y, dri, reset):
        my, mx = divmod(m, mcus_x)
        for c in scan:
            dc_t = huff_dc.get(c["dc"])
            ac_t = huff_ac.get(c["ac"])
            if dc_t is None or ac_t is None:
                raise ValueError("missing huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk, preds[c["id"]] = _decode_block(
                        bits, dc_t, ac_t, preds[c["id"]]
                    )
                    coeff[c["id"]][my * c["v"] + by, mx * c["h"] + bx] = blk


def _scan_dc(bits, frame, scan, coeff, huff_dc, dri, ah, al):
    """Progressive DC scan — interleaved over the scan components.
    First pass (ah=0): Huffman DC diffs, value << al. Refinement: one
    raw bit per block ORed in at al (two's-complement OR, which Python
    ints model exactly)."""
    _, _, mcus_x, mcus_y = _grid_geometry(frame)
    # A single-component DC scan walks that component's own block grid
    if len(scan) == 1:
        bw, bh = _comp_blocks(frame, scan[0])
        grid = [(scan[0], bh, bw)]
        n_mcus = bw * bh
    else:
        grid = None
        n_mcus = mcus_x * mcus_y
    preds = {c["id"]: 0 for c in scan}

    def reset():
        for k in preds:
            preds[k] = 0

    for m in _mcu_iter(bits, n_mcus, dri, reset):
        if grid is not None:
            c, bh, bw = grid[0]
            by, bx = divmod(m, bw)
            cells = [(c, by, bx)]
        else:
            my, mx = divmod(m, mcus_x)
            cells = [
                (c, my * c["v"] + by, mx * c["h"] + bx)
                for c in scan
                for by in range(c["v"])
                for bx in range(c["h"])
            ]
        for c, gy, gx in cells:
            blk = coeff[c["id"]][gy, gx]
            if ah == 0:
                tbl = huff_dc.get(c["dc"])
                if tbl is None:
                    raise ValueError("missing huffman table")
                t = _huff_decode(bits, tbl)
                diff = _extend(bits.bits(t), t)
                preds[c["id"]] += diff
                blk[0] = preds[c["id"]] << al
            else:
                if bits.bit():
                    blk[0] = int(blk[0]) | (1 << al)


def _scan_ac(bits, frame, comp, coeff, huff_ac, dri, ss, se, ah, al):
    """Progressive AC scan (one component): spectral band [ss, se] at
    precision al; ah=0 is the first pass (EOB runs + new coefficients),
    ah>0 the refinement pass (correction bits on history-nonzero
    coefficients, new ±1<<al insertions) — the G.1.2.3 algorithm."""
    tbl = huff_ac.get(comp["ac"])
    if tbl is None:
        raise ValueError("missing huffman table")
    bw, bh = _comp_blocks(frame, comp)
    state = {"eobrun": 0}

    def reset():
        state["eobrun"] = 0

    p1, m1 = 1 << al, -1 << al
    for m in _mcu_iter(bits, bw * bh, dri, reset):
        by, bx = divmod(m, bw)
        blk = coeff[comp["id"]][by, bx]
        if ah == 0:
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(bits, tbl)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        continue
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += bits.bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("AC index out of band")
                blk[k] = _extend(bits.bits(s), s) << al
                k += 1
        else:
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = _huff_decode(bits, tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            state["eobrun"] = (1 << r)
                            if r:
                                state["eobrun"] += bits.bits(r)
                            break
                        newval = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("bad refinement magnitude")
                        newval = p1 if bits.bit() else m1
                    # advance past r zero-history positions, applying
                    # correction bits to nonzero-history ones en route
                    while k <= se:
                        if blk[k] != 0:
                            if bits.bit():
                                if (blk[k] >= 0 and not blk[k] & p1) or (
                                    blk[k] < 0 and not (-blk[k]) & p1
                                ):
                                    blk[k] += p1 if blk[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= se:
                        blk[k] = newval
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if blk[k] != 0:
                        if bits.bit():
                            if (blk[k] >= 0 and not blk[k] & p1) or (
                                blk[k] < 0 and not (-blk[k]) & p1
                            ):
                                blk[k] += p1 if blk[k] >= 0 else m1
                    k += 1
                state["eobrun"] -= 1


def _render(frame, coeff, qt):
    """Dequant + IDCT every block, assemble component planes, upsample,
    convert, and reduce to (dims, mean)."""
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        return None
    hmax, vmax, mcus_x, mcus_y = _grid_geometry(frame)
    comps = frame["comps"]
    planes = {}
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            return None
        grid = coeff[c["id"]]
        gy, gx = grid.shape[0], grid.shape[1]
        plane = np.zeros((gy * 8, gx * 8))
        for by in range(gy):
            for bx in range(gx):
                deq = grid[by, bx] * q
                blk = np.zeros((8, 8))
                for i, (r, col) in enumerate(ZIGZAG):
                    blk[r, col] = deq[i]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ blk @ _A + 128.0
                )
        planes[c["id"]] = plane

    def upsampled(c):
        plane = planes[c["id"]]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        ry, rx = vmax // c["v"], hmax // c["h"]
        return np.clip(
            plane.repeat(ry, axis=0).repeat(rx, axis=1)[:h, :w], 0, 255
        )

    if len(comps) == 1:
        mean = float(np.round(upsampled(comps[0]), 0).mean())
    elif len(comps) == 3:
        y, cb, cr = (upsampled(c) for c in comps)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, bl]), 0, 255)
        mean = float(np.round(rgb, 0).mean())
    else:
        return None
    return {
        "width": int(w),
        "height": int(h),
        "n_components": len(comps),
        "mean_value": mean,
    }
