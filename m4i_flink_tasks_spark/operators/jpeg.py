"""Baseline JPEG decode with stdlib + numpy — no codec libraries.

Supported profile: baseline and extended-sequential Huffman JPEG
(SOF0/SOF1), 8-bit precision, grayscale or YCbCr with any 1/2x
subsampling factors, restart markers, multi-table DQT/DHT segments.
Progressive (SOF2), hierarchical, arithmetic-coded and 12-bit streams
raise ``NotImplementedError`` at the codec seam (plug PIL there);
malformed streams return ``None`` so the caller's byte-fake fallback
applies.

The full baseline pipeline runs for real: marker parse → Huffman
entropy decode with byte unstuffing and restart handling → dequant →
zigzag → IDCT (vectorized: one 8×8 orthonormal basis matmul per block)
→ level shift → nearest-neighbor chroma upsample → YCbCr→RGB. Decode
is validated two ways in tests: a full independent ENCODER (forward
DCT + the same standard tables) round-trips pixels within quantization
error, and real-world JPEGs shipped in the container decode with their
known geometry.

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
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
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
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/hierarchical/arithmetic JPEG — plug "
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
            return _decode_scan(b, pos + 2 + seg_len, frame, scan,
                                qt, huff_dc, huff_ac, dri)
        # APPn / COM / others: skip
        pos += 2 + seg_len
    return None


def _decode_scan(b, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        return None
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8))
        for c in scan
    }
    preds = {c["id"]: 0 for c in scan}
    bits = _Bits(b, pos)
    n_mcus = mcus_x * mcus_y
    try:
        for m in range(n_mcus):
            if dri and m and m % dri == 0:
                bits.align_and_consume_rst()
                preds = {c["id"]: 0 for c in scan}
            my, mx = divmod(m, mcus_x)
            for c in scan:
                q = qt.get(c["tq"])
                dc_t = huff_dc.get(c["dc"])
                ac_t = huff_ac.get(c["ac"])
                if q is None or dc_t is None or ac_t is None:
                    return None
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs, preds[c["id"]] = _decode_block(
                            bits, dc_t, ac_t, preds[c["id"]]
                        )
                        deq = coeffs * q
                        blk = np.zeros((8, 8))
                        for i, (r, col) in enumerate(ZIGZAG):
                            blk[r, col] = deq[i]
                        spatial = _A.T @ blk @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
    except (_Marker, ValueError, IndexError, EOFError):
        return None

    def upsampled(c):
        plane = planes[c["id"]]
        # crop to the component's own geometry, then replicate to full
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        ry, rx = vmax // c["v"], hmax // c["h"]
        return np.clip(
            plane.repeat(ry, axis=0).repeat(rx, axis=1)[:h, :w], 0, 255
        )

    if len(scan) == 1:
        mean = float(np.round(upsampled(scan[0]), 0).mean())
    elif len(scan) == 3:
        y, cb, cr = (upsampled(c) for c in scan)
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
        "n_components": len(scan),
        "mean_value": mean,
    }
