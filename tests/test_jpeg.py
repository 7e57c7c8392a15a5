"""Baseline JPEG decoder: independent-encoder round-trips + real files.

The encoder here is written against the JPEG spec directly (forward
DCT, Annex K quantization + Huffman tables, 4:4:4 and 4:2:0 layouts,
restart markers) and shares nothing with the decoder under test — a
round-trip within quantization error is evidence both ends implement
the same standard. Real-world files shipped in the container pin the
decoder against third-party encoders too.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from m4i_flink_tasks_spark.operators.jpeg import ZIGZAG, decode_jpeg_baseline
from m4i_flink_tasks_spark.operators.multimodal import decode_media

# Annex K.1 luminance quantization table (natural order), quality 50
Q50 = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

# Annex K.3: standard luminance DC table
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))

# Annex K.5: standard luminance AC table
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

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


def _huff_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)


def _category(v):
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(bw, coeffs, pred, dc_codes, ac_codes):
    dc = int(coeffs[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    # coeffs arrive zigzag-ordered from _fdct_quant; AC = positions 1..63
    ac = [int(coeffs[i]) for i in range(1, 64)]
    nz = [i for i, v in enumerate(ac) if v]
    end = (nz[-1] + 1) if nz else 0
    for i in range(end):
        v = ac[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if end < 63:
        code, ln = ac_codes[0x00]
        bw.put(code, ln)
    return dc


def _fdct_quant(block, q):
    coeffs = _A @ (block - 128.0) @ _A.T
    quant = np.round(coeffs / q).astype(int)
    return np.array([quant[r, c] for (r, c) in ZIGZAG])


def _headers(w, h, comps, q, dri=0):
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q[r, c]) for (r, c) in ZIGZAG
    )
    sof = struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + sof
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(DC_SYMBOLS))
        + b"\x00" + bytes(DC_COUNTS) + bytes(DC_SYMBOLS)
    )
    out += (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + 16 + len(AC_SYMBOLS))
        + b"\x10" + bytes(AC_COUNTS) + bytes(AC_SYMBOLS)
    )
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    sos = struct.pack(">HB", 6 + 2 * len(comps), len(comps))
    for cid, _, _ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos
    return out


def encode_gray(img: np.ndarray, q=Q50, dri=0) -> bytes:
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img.astype(float), ((0, ph - h), (0, pw - w)), "edge")
    dc_codes = _huff_codes(DC_COUNTS, DC_SYMBOLS)
    ac_codes = _huff_codes(AC_COUNTS, AC_SYMBOLS)
    bw = _BitWriter()
    pred = 0
    rst = 0
    m = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if dri and m and m % dri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            pred = _encode_block(bw, _fdct_quant(blk, q), pred, dc_codes, ac_codes)
            m += 1
    bw.flush()
    return _headers(w, h, [(1, 1, 1)], q, dri) + bytes(bw.out) + b"\xff\xd9"


def encode_ycbcr_420(rgb: np.ndarray, q=Q50) -> bytes:
    """rgb: (h, w, 3) uint8, dims multiples of 16 for simplicity."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[..., i].astype(float) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    dc_codes = _huff_codes(DC_COUNTS, DC_SYMBOLS)
    ac_codes = _huff_codes(AC_COUNTS, AC_SYMBOLS)
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    blk = y[
                        (my * 2 + by) * 8 : (my * 2 + by) * 8 + 8,
                        (mx * 2 + bx) * 8 : (mx * 2 + bx) * 8 + 8,
                    ]
                    preds[1] = _encode_block(
                        bw, _fdct_quant(blk, q), preds[1], dc_codes, ac_codes
                    )
            for cid, plane in ((2, cb), (3, cr)):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[cid] = _encode_block(
                    bw, _fdct_quant(blk, q), preds[cid], dc_codes, ac_codes
                )
    bw.flush()
    return (
        _headers(w, h, [(1, 2, 2), (2, 1, 1), (3, 1, 1)], q)
        + bytes(bw.out)
        + b"\xff\xd9"
    )


def test_gray_roundtrip_lossless_q1():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 16)).astype(np.uint8)
    out = decode_jpeg_baseline(encode_gray(img, q=np.ones((8, 8))))
    assert out is not None
    assert (out["width"], out["height"]) == (16, 24)
    # all-ones quantization: only float rounding separates the means
    assert out["mean_value"] == pytest.approx(img.mean(), abs=0.51)


def test_gray_roundtrip_q50_smooth():
    x = np.linspace(0, 255, 32)
    img = np.tile(x, (16, 1)).astype(np.uint8)
    out = decode_jpeg_baseline(encode_gray(img))
    assert out is not None
    assert out["mean_value"] == pytest.approx(img.mean(), abs=3.0)


def test_gray_restart_markers():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(16, 32)).astype(np.uint8)
    plain = decode_jpeg_baseline(encode_gray(img, q=np.ones((8, 8))))
    with_rst = decode_jpeg_baseline(
        encode_gray(img, q=np.ones((8, 8)), dri=2)
    )
    assert with_rst is not None
    assert with_rst["mean_value"] == pytest.approx(plain["mean_value"])


def test_color_420_roundtrip():
    rng = np.random.RandomState(11)
    # smooth color field (block-constant + gradient) so 4:2:0 + Q50
    # stays near the original mean
    base = rng.randint(60, 200, size=(2, 2, 3)).repeat(16, 0).repeat(16, 1)
    rgb = np.clip(base + np.arange(32)[None, :, None] // 4, 0, 255).astype(
        np.uint8
    )
    out = decode_jpeg_baseline(encode_ycbcr_420(rgb))
    assert out is not None
    assert (out["width"], out["height"], out["n_components"]) == (32, 32, 3)
    assert out["mean_value"] == pytest.approx(rgb.mean(), abs=3.0)


def test_real_world_jpegs_decode():
    candidates = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/imghdrdata/python.jpg",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "site-packages/IPython/core/tests/2x2.jpg",
    ]
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no real-world jpeg in this environment")
    for p in found:
        out = decode_media(open(p, "rb").read(), "image")
        assert out["codec"] == "jpeg", p
        assert out["width"] > 0 and out["height"] > 0
        assert 0.0 <= out["mean_value"] <= 255.0


# ---------------------------------------------------------------------------
# Progressive encoder (spec G.1.2): multi-scan spectral selection +
# successive approximation, written independently of the decoder.
# Huffman tables are uniform 8-bit canonical tables built per scan
# (valid: n<=255 symbols at length 8 fill the code space without the
# reserved all-ones code).
# ---------------------------------------------------------------------------


def _uniform_table(symbols):
    syms = sorted(set(symbols))
    assert 0 < len(syms) <= 255
    counts = [0] * 16
    counts[7] = len(syms)
    codes = {s: (i, 8) for i, s in enumerate(syms)}
    return codes, bytes(counts) + bytes(syms)


def _dht(tc, th, body):
    return (
        b"\xff\xc4"
        + struct.pack(">H", 2 + 1 + len(body))
        + bytes([(tc << 4) | th])
        + body
    )


def _sos(comps_tables, ss, se, ah, al):
    seg = struct.pack(">HB", 6 + 2 * len(comps_tables), len(comps_tables))
    for cid, dc, ac in comps_tables:
        seg += bytes([cid, (dc << 4) | ac])
    seg += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + seg


def _pt(v, al):
    """AC point transform: sign-preserving magnitude shift."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _emit_dc_first(bw, seq, al, dc_codes=None):
    """Encode DC diffs of (dc >> al) with per-component predictors
    (seq = [(cid, dc), ...] in scan order); two passes when codes is
    None (symbol collection)."""
    syms, preds = [], {}
    for cid, dc in seq:
        v = dc >> al
        diff = v - preds.get(cid, 0)
        preds[cid] = v
        t = _category(diff)
        syms.append(t)
        if bw is not None:
            code, ln = dc_codes[t]
            bw.put(code, ln)
            if t:
                bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    return syms


def _emit_ac_first(bw, blocks, ss, se, al, ac_codes=None):
    syms = []

    def out_sym(s):
        syms.append(s)
        if bw is not None:
            code, ln = ac_codes[s]
            bw.put(code, ln)

    for blk in blocks:
        band = [_pt(int(blk[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(band) if v]
        end = (nz[-1] + 1) if nz else 0
        run = 0
        for i in range(end):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                out_sym(0xF0)
                run -= 16
            s = _category(v)
            out_sym((run << 4) | s)
            if bw is not None:
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if end <= se - ss:  # rest of band is zero -> EOB (run of 1)
            out_sym(0x00)
    return syms


def _emit_ac_refine(bw, blocks, ss, se, al, ac_codes=None):
    """G.1.2.3 refinement: correction bits for history-nonzero
    coefficients, (r<<4)|1 for newly-significant ones, EOB flushes the
    pending correction-bit buffer."""
    syms = []

    def out_sym(s):
        syms.append(s)
        if bw is not None:
            code, ln = ac_codes[s]
            bw.put(code, ln)

    def out_bits(bits_list):
        if bw is not None:
            for bit in bits_list:
                bw.put(bit, 1)

    for blk in blocks:
        vals = [int(blk[k]) for k in range(ss, se + 1)]
        absm = [abs(v) >> al for v in vals]
        eob = 0
        for i, a in enumerate(absm):
            if a == 1:
                eob = i + 1
        run, pending = 0, []
        for i, a in enumerate(absm):
            if a == 0:
                run += 1
                continue
            while run > 15 and i < eob:
                out_sym(0xF0)
                out_bits(pending)
                pending = []
                run -= 16
            if a > 1:  # history-nonzero: buffer its correction bit
                pending.append(a & 1)
                continue
            out_sym((run << 4) | 1)
            if bw is not None:
                bw.put(1 if vals[i] >= 0 else 0, 1)
            out_bits(pending)
            pending = []
            run = 0
        if run > 0 or pending:
            out_sym(0x00)
            out_bits(pending)
    return syms


def _coeff_grids(planes, q):
    """planes: {cid: (2d float array, blocks_w, blocks_h)} ->
    {cid: [zigzag coeff arrays in raster block order]}"""
    grids = {}
    for cid, (plane, bw_, bh_) in planes.items():
        ph, pw = bh_ * 8, bw_ * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            "edge",
        )
        grids[cid] = [
            _fdct_quant(
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q
            )
            for by in range(bh_)
            for bx in range(bw_)
        ]
    return grids


def _scan_bytes(emit, table_class, table_comps, ss, se, ah, al):
    """Dry-run for symbols -> uniform DHT -> real emission -> DHT+SOS+data."""
    syms = emit(None, None)
    codes, body = _uniform_table(syms)
    bw = _BitWriter()
    emit(bw, codes)
    bw.flush()
    return (
        _dht(table_class, 0, body)
        + _sos(table_comps, ss, se, ah, al)
        + bytes(bw.out)
    )


def encode_gray_progressive(img: np.ndarray, q=Q50, al=1) -> bytes:
    h, w = img.shape
    bw_, bh_ = -(-w // 8), -(-h // 8)
    grids = _coeff_grids({1: (img.astype(float), bw_, bh_)}, q)
    blocks = grids[1]
    dcs = [(1, int(b[0])) for b in blocks]
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q[r, c]) for (r, c) in ZIGZAG
    )
    sof = struct.pack(">HBHHB", 8 + 3, 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + sof  # SOF2: progressive
    # DC first (al) + DC refine bits (al-1 .. 0)
    out += _scan_bytes(
        lambda b_, c_: _emit_dc_first(b_, dcs, al, c_), 0, [(1, 0, 0)],
        0, 0, 0, al,
    )
    for a in range(al - 1, -1, -1):
        bwr = _BitWriter()
        for _cid, dc in dcs:
            bwr.put((dc >> a) & 1, 1)
        bwr.flush()
        out += _sos([(1, 0, 0)], 0, 0, a + 1, a) + bytes(bwr.out)
    # AC: two spectral bands, first pass at al then refinements to 0
    for ss, se in ((1, 5), (6, 63)):
        out += _scan_bytes(
            lambda b_, c_, ss=ss, se=se: _emit_ac_first(
                b_, blocks, ss, se, al, c_
            ),
            1, [(1, 0, 0)], ss, se, 0, al,
        )
    for a in range(al - 1, -1, -1):
        for ss, se in ((1, 5), (6, 63)):
            out += _scan_bytes(
                lambda b_, c_, ss=ss, se=se, a=a: _emit_ac_refine(
                    b_, blocks, ss, se, a, c_
                ),
                1, [(1, 0, 0)], ss, se, a + 1, a,
            )
    return out + b"\xff\xd9"


def test_progressive_gray_equals_baseline():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 17), dtype=np.uint8)
    base = decode_jpeg_baseline(encode_gray(img))
    prog = decode_jpeg_baseline(encode_gray_progressive(img))
    assert prog is not None
    assert (prog["width"], prog["height"]) == (17, 24)
    # identical coefficients -> identical floats -> identical mean
    assert prog["mean_value"] == base["mean_value"]


def test_progressive_smooth_gradient_round_trip():
    x = np.linspace(0, 255, 40)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    prog = decode_jpeg_baseline(encode_gray_progressive(img, al=2))
    assert prog is not None
    assert abs(prog["mean_value"] - float(img.mean())) < 3.0


def encode_ycbcr_420_progressive(rgb: np.ndarray, q=Q50, al=1) -> bytes:
    """Progressive 4:2:0 color: interleaved DC scan over all three
    components, then per-component AC band scans + refinements."""
    h, w, _ = rgb.shape
    r, g, b = (rgb[..., i].astype(float) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    cr = cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    grids = _coeff_grids(
        {
            1: (y, w // 8, h // 8),
            2: (cb, w // 16, h // 16),
            3: (cr, w // 16, h // 16),
        },
        q,
    )
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q[rr, cc]) for (rr, cc) in ZIGZAG
    )
    sof = struct.pack(">HBHHB", 8 + 9, 8, h, w, 3)
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc2" + sof
    # interleaved DC-first: MCU order = 4 Y blocks then Cb then Cr.
    # grids[1] is raster over the Y block grid; reorder to MCU order.
    ybw = w // 8
    dc_seq = []
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    dc_seq.append(
                        (1, int(grids[1][(my * 2 + by) * ybw + mx * 2 + bx][0]))
                    )
            dc_seq.append((2, int(grids[2][my * (w // 16) + mx][0])))
            dc_seq.append((3, int(grids[3][my * (w // 16) + mx][0])))
    out += _scan_bytes(
        lambda b_, c_: _emit_dc_first(b_, dc_seq, al, c_),
        0, [(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, 0, al,
    )
    for a in range(al - 1, -1, -1):
        bwr = _BitWriter()
        for _cid, dc in dc_seq:
            bwr.put((dc >> a) & 1, 1)
        bwr.flush()
        out += _sos([(1, 0, 0), (2, 0, 0), (3, 0, 0)], 0, 0, a + 1, a) + bytes(
            bwr.out
        )
    for cid in (1, 2, 3):
        out += _scan_bytes(
            lambda b_, c_, cid=cid: _emit_ac_first(
                b_, grids[cid], 1, 63, al, c_
            ),
            1, [(cid, 0, 0)], 1, 63, 0, al,
        )
    for a in range(al - 1, -1, -1):
        for cid in (1, 2, 3):
            out += _scan_bytes(
                lambda b_, c_, cid=cid, a=a: _emit_ac_refine(
                    b_, grids[cid], 1, 63, a, c_
                ),
                1, [(cid, 0, 0)], 1, 63, a + 1, a,
            )
    return out + b"\xff\xd9"


def test_progressive_color_420_equals_baseline():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    base = decode_jpeg_baseline(encode_ycbcr_420(rgb))
    prog = decode_jpeg_baseline(encode_ycbcr_420_progressive(rgb))
    assert prog is not None
    assert (prog["width"], prog["height"], prog["n_components"]) == (48, 32, 3)
    assert prog["mean_value"] == base["mean_value"]


def test_progressive_interleaved_dc_mismatch_is_caught():
    """Sanity: the interleaved DC sequence really is MCU-ordered — a
    raster-ordered DC scan would decode to different coefficients and
    break the equality above; pin a deliberately different al too."""
    rng = np.random.default_rng(13)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    base = decode_jpeg_baseline(encode_ycbcr_420(rgb))
    prog = decode_jpeg_baseline(encode_ycbcr_420_progressive(rgb, al=2))
    assert prog["mean_value"] == base["mean_value"]


def test_malformed_jpeg_falls_back_to_bytes():
    assert decode_media(b"\xff\xd8\xff\xe0__", "image")["codec"] == "bytes"
    good = encode_gray(np.full((8, 8), 99, np.uint8))
    assert decode_media(good[:-10], "image")["codec"] == "bytes"


def test_synth_jpeg_closed_forms():
    from m4i_flink_tasks_spark.operators.multimodal import synth_jpeg

    for doc_id in (0, 15, 30, 45, 60, 75, 9000, 9015):
        b = synth_jpeg(doc_id)
        w, h = 8 * (1 + doc_id % 3), 8 * (1 + doc_id % 2)
        nb = (w // 8) * (h // 8)
        assert len(b) == 151 + (9 + 5 * (nb - 1) + 7) // 8
        assert b[0] == 255 and b[-1] == 0xD9
        out = decode_media(b, "image")
        assert out["codec"] == "jpeg"
        assert (out["width"], out["height"]) == (w, h)
        assert out["mean_value"] == (127 if doc_id % 2 else 129)  # exact


def encode_gray_progressive_dri(img: np.ndarray, q=Q50, dri=2) -> bytes:
    """Single-band progressive gray with restart markers: DC-first scan
    only (Al=0 — full precision), RSTn every ``dri`` blocks, then one
    AC-first scan, also restarted. Pins the decoder's progressive
    restart handling (predictor + EOB-run resets, marker alignment)."""
    h, w = img.shape
    bw_, bh_ = -(-w // 8), -(-h // 8)
    grids = _coeff_grids({1: (img.astype(float), bw_, bh_)}, q)
    blocks = grids[1]
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(
        int(q[r, c]) for (r, c) in ZIGZAG
    )
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3, 8, h, w, 1) + bytes(
        [1, 0x11, 0]
    )
    out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    def restarted(emit_block, n):
        """Emit blocks with flush+RSTn every dri, NEW writer segments."""
        chunks, rst = b"", 0
        bw2, start = _BitWriter(), 0
        for m in range(n):
            if m and m % dri == 0:
                bw2.flush()
                chunks += bytes(bw2.out) + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw2 = _BitWriter()
                start = m
            emit_block(bw2, m, start)
        bw2.flush()
        return chunks + bytes(bw2.out)

    # DC-first scan at Al=0 with per-segment predictor reset
    dc_syms = []
    for seg_start in range(0, len(blocks), dri):
        seg = [(1, int(b_[0])) for b_ in blocks[seg_start : seg_start + dri]]
        dc_syms += _emit_dc_first(None, seg, 0, None)
    dc_codes, dc_body = _uniform_table(dc_syms)

    def dc_block(bw2, m, seg_start):
        if m == seg_start:
            dc_block.pred = 0
        v = int(blocks[m][0])
        diff = v - dc_block.pred
        dc_block.pred = v
        t = _category(diff)
        code, ln = dc_codes[t]
        bw2.put(code, ln)
        if t:
            bw2.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    out += _dht(0, 0, dc_body) + _sos([(1, 0, 0)], 0, 0, 0, 0)
    out += restarted(dc_block, len(blocks))

    ac_syms = _emit_ac_first(None, blocks, 1, 63, 0, None)
    ac_codes, ac_body = _uniform_table(ac_syms)

    def ac_block(bw2, m, _seg_start):
        _emit_ac_first(bw2, [blocks[m]], 1, 63, 0, ac_codes)

    out += _dht(1, 0, ac_body) + _sos([(1, 0, 0)], 1, 63, 0, 0)
    out += restarted(ac_block, len(blocks))
    return out + b"\xff\xd9"


def test_progressive_with_restart_markers_equals_baseline():
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 40), dtype=np.uint8)  # 10 blocks
    base = decode_jpeg_baseline(encode_gray(img))
    prog = decode_jpeg_baseline(encode_gray_progressive_dri(img, dri=3))
    assert prog is not None
    assert prog["mean_value"] == base["mean_value"]
