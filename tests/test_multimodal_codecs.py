"""Real-decode coverage for the multimodal codec seam.

Synthesizes well-formed WAV (PCM16), BMP (24-bit) and PPM (P6) payloads
with stdlib ``struct`` and checks the magic-routed decoders both
directly and through the Arrow-batched ``mapInPandas`` pipeline; also
pins the fallback (arbitrary bytes -> ``codec='bytes'``) and the
compressed-format NotImplementedError seam.
"""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.multimodal import (
    decode_media,
    decode_stub,
    extract_features,
)


def make_wav(samples: list[int], rate: int = 8000, n_ch: int = 1) -> bytes:
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Bottom-up 24-bit BMP from a row-major pixel grid (B, G, R)."""
    h, w = len(pixels), len(pixels[0])
    stride = ((w * 3 + 3) // 4) * 4
    raster = b""
    for row in reversed(pixels):
        line = b"".join(struct.pack("BBB", *px) for px in row)
        raster += line + b"\x00" * (stride - len(line))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    return header + info + raster


def make_ppm(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    h, w = len(pixels), len(pixels[0])
    raster = b"".join(
        struct.pack("BBB", *px) for row in pixels for px in row
    )
    return f"P6\n{w} {h}\n255\n".encode() + raster


def test_wav_decodes_rate_samples_rms():
    samples = [0, 3, -4, 0]  # RMS = sqrt((9+16)/4) = 2.5
    out = decode_media(make_wav(samples, rate=16000), "audio")
    assert out["codec"] == "wav"
    assert out["sample_rate"] == 16000
    assert out["n_samples"] == 4
    assert out["mean_value"] == pytest.approx(2.5)


def test_wav_stereo_counts_frames_not_values():
    out = decode_media(make_wav([1, 2, 3, 4], n_ch=2), "audio")
    assert out["n_samples"] == 2  # 4 values / 2 channels


def test_bmp_decodes_dims_and_mean():
    # 2x2, padded rows (stride 8 for w=2) — mean over pixel bytes only
    px = [[(0, 0, 0), (30, 60, 90)], [(10, 10, 10), (90, 60, 30)]]
    out = decode_media(make_bmp(px), "image")
    assert out["codec"] == "bmp"
    assert (out["width"], out["height"]) == (2, 2)
    vals = [v for row in px for p in row for v in p]
    assert out["mean_value"] == pytest.approx(sum(vals) / len(vals))


def test_ppm_decodes_dims_and_mean():
    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)]]
    out = decode_media(make_ppm(px), "image")
    assert out["codec"] == "ppm"
    assert (out["width"], out["height"]) == (3, 1)
    assert out["mean_value"] == pytest.approx(255 / 3)


def test_truncated_media_falls_back_to_bytes():
    for payload in (
        make_wav([1, 2, 3])[:-3],
        make_bmp([[(1, 2, 3)]])[:-2],
        make_ppm([[(1, 2, 3)]])[:-1],
        b"BMnot really a bitmap",
        b"plain text payload",
    ):
        out = decode_media(payload, "image")
        assert out["codec"] == "bytes"
        assert out["width"] is None and out["mean_value"] is None


def test_compressed_formats_raise_at_the_seam():
    for magic in (b"OggS__", b"ID3\x03__"):
        with pytest.raises(NotImplementedError):
            decode_media(magic, "image")


def test_decode_stub_merges_byte_stats_with_media():
    wav = make_wav([5, -5])
    row = decode_stub(wav, "audio")
    assert row["codec"] == "wav"
    assert row["n_bytes"] == len(wav)
    assert row["first_byte"] == wav[0] and row["last_byte"] == wav[-1]
    assert row["mean_value"] == pytest.approx(5.0)


def test_real_decode_through_mapinpandas(spark):
    """The same Arrow-batched UDF the driver query runs must decode
    real media payloads end to end (schema + values)."""
    wav = make_wav([0, 3, -4, 0], rate=44100)
    bmp = make_bmp([[(12, 12, 12)]])
    rows = [
        (1, wav, {"modality": "audio", "declared_size": len(wav), "origin": "t"}),
        (2, bmp, {"modality": "image", "declared_size": len(bmp), "origin": "t"}),
        (3, b"free-form bytes", {"modality": "video", "declared_size": 15, "origin": "t"}),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, media struct<modality:string, "
        "declared_size:bigint, origin:string>",
    )
    out = {r.doc_id: r for r in extract_features(df).collect()}
    assert out[1].codec == "wav"
    assert out[1].sample_rate == 44100
    assert out[1].mean_value == pytest.approx(2.5)
    assert out[2].codec == "bmp"
    assert (out[2].width, out[2].height) == (1, 1)
    assert out[2].mean_value == pytest.approx(12.0)
    assert out[3].codec == "bytes"
    assert out[3].n_frames == 1  # sub-chunk video payload
    assert out[3].n_bytes == 15


def test_rms_matches_definition():
    # property-ish sanity: RMS of a constant signal is its magnitude
    out = decode_media(make_wav([7] * 100), "audio")
    assert out["mean_value"] == pytest.approx(7.0)
    out = decode_media(make_wav([-3, 3] * 50), "audio")
    assert out["mean_value"] == pytest.approx(3.0)
    assert not math.isnan(out["mean_value"])


def test_synth_payloads_decode_to_their_closed_forms():
    """The driver-checked query routes synth_wav/bmp/ppm payloads
    through the real decoders; the oracle states their outputs as
    closed forms of doc_id. Pin that synthesis and decode agree on
    exactly those forms for a spread of doc_ids."""
    from m4i_flink_tasks_spark.operators.multimodal import (
        synth_bmp,
        synth_ppm,
        synth_wav,
    )

    for doc_id in (1, 16, 31, 46, 331, 9001):
        out = decode_media(synth_wav(doc_id), "audio")
        assert out["codec"] == "wav"
        assert out["sample_rate"] == 8000 + (doc_id % 8) * 1000
        assert out["n_samples"] == 64 + doc_id % 32
        assert out["mean_value"] == abs((doc_id % 100) - 50)  # exact
    for doc_id in (3, 18, 33, 258, 9003):
        out = decode_media(synth_bmp(doc_id), "image")
        assert out["codec"] == "bmp"
        assert out["width"] == 4 + 4 * (doc_id % 2)
        assert out["height"] == 3 + doc_id % 5
        assert out["mean_value"] == doc_id % 256  # exact
    for doc_id in (6, 21, 36, 111, 9006):
        out = decode_media(synth_ppm(doc_id), "image")
        assert out["codec"] == "ppm"
        assert out["width"] == 3 + doc_id % 5
        assert out["height"] == 2 + doc_id % 4
        assert out["mean_value"] == (doc_id * 7) % 256  # exact


# ---------------------------------------------------------------------------
# PNG: real zlib inflate + scanline defilter
# ---------------------------------------------------------------------------

import zlib


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def make_png(
    pixels: list[list[tuple[int, ...]]],
    ctype: int = 2,
    filters: list[int] | None = None,
    plte: bytes | None = None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """Encode a pixel grid with a CHOSEN filter per scanline, applying
    the forward filter independently of the decoder under test."""
    h, w = len(pixels), len(pixels[0])
    nbytes = depth // 8
    bpp = max(1, {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype] * nbytes)

    def row_bytes(row):
        samples = [
            v for px in row for v in (px if isinstance(px, tuple) else (px,))
        ]
        if depth >= 8:
            return bytes(b for v in samples for b in v.to_bytes(nbytes, "big"))
        out, acc, nbits = bytearray(), 0, 0  # sub-byte: MSB-first packing
        for v in samples:
            acc = (acc << depth) | v
            nbits += depth
            if nbits == 8:
                out.append(acc)
                acc, nbits = 0, 0
        if nbits:
            out.append(acc << (8 - nbits))
        return bytes(out)

    def filter_grid(grid, ftypes):
        raw, prev = b"", bytes(len(grid[0]) if grid else 0)
        for ftype, cur in zip(ftypes, grid):
            line = bytearray()
            for x in range(len(cur)):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line.append((cur[x] - pred) & 0xFF)
            raw += bytes([ftype]) + bytes(line)
            prev = cur
        return raw

    if interlace == 0:
        rows = [row_bytes(row) for row in pixels]
        raw = filter_grid(rows, filters or [0] * h)
    else:  # Adam7: each pass filtered as its own sub-image
        _ADAM7 = (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        )
        raw = b""
        for x0, y0, dx, dy in _ADAM7:
            sub = [
                row_bytes(pixels[y][x0::dx])
                for y in range(y0, h, dy)
                if pixels[y][x0::dx]
            ]
            if sub:
                raw += filter_grid(sub, (filters or [0, 1, 2, 3, 4]) * len(sub))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(raw)) + _png_chunk(b"IEND", b"")


def test_png_rgb_all_filter_types():
    """One scanline per filter type (None/Sub/Up/Average/Paeth); the
    decoded mean must equal the mean of the original pixels regardless
    of which filter encoded each row."""
    import random

    rng = random.Random(42)
    pixels = [
        [tuple(rng.randrange(256) for _ in range(3)) for _ in range(7)]
        for _ in range(5)
    ]
    expected = sum(v for row in pixels for px in row for v in px) / (5 * 7 * 3)
    out = decode_media(make_png(pixels, filters=[0, 1, 2, 3, 4]), "image")
    assert out["codec"] == "png"
    assert (out["width"], out["height"]) == (7, 5)
    assert out["mean_value"] == pytest.approx(expected)


def test_png_grayscale_and_alpha_variants():
    gray = [[(10,), (20,)], [(30,), (40,)]]
    out = decode_media(make_png(gray, ctype=0), "image")
    assert (out["codec"], out["mean_value"]) == ("png", pytest.approx(25.0))
    # gray+alpha: alpha bytes excluded from the mean
    ga = [[(10, 255), (20, 0)], [(30, 7), (40, 99)]]
    out = decode_media(make_png(ga, ctype=4), "image")
    assert out["mean_value"] == pytest.approx(25.0)
    # RGBA: alpha dropped
    rgba = [[(12, 12, 12, 200), (24, 24, 24, 100)]]
    out = decode_media(make_png(rgba, ctype=6), "image")
    assert out["mean_value"] == pytest.approx(18.0)


def test_png_palette_maps_through_plte():
    plte = bytes([0, 0, 0, 30, 60, 90])  # index0=black, index1=(30,60,90)
    pixels = [[(1,), (1,)], [(0,), (1,)]]  # three hits on entry 1
    out = decode_media(make_png(pixels, ctype=3, plte=plte), "image")
    assert out["codec"] == "png"
    # mean over mapped RGB bytes: 3*(30+60+90)/12
    assert out["mean_value"] == pytest.approx(3 * 180 / 12)


def test_png_16bit_depth_decodes_for_real():
    import random

    rng = random.Random(7)
    px = [
        [tuple(rng.randrange(65536) for _ in range(3)) for _ in range(5)]
        for _ in range(4)
    ]
    expected = sum(v for row in px for p in row for v in p) / (4 * 5 * 3)
    out = decode_media(make_png(px, depth=16, filters=[0, 1, 2, 3]), "image")
    assert out["codec"] == "png"
    assert (out["width"], out["height"]) == (5, 4)
    assert out["mean_value"] == pytest.approx(expected)


def test_png_adam7_interlace_decodes_for_real():
    import random

    rng = random.Random(11)
    # 9x10 exercises every one of the seven passes non-trivially
    px = [
        [tuple(rng.randrange(256) for _ in range(3)) for _ in range(9)]
        for _ in range(10)
    ]
    expected = sum(v for row in px for p in row for v in p) / (9 * 10 * 3)
    out = decode_media(make_png(px, interlace=1), "image")
    assert out["codec"] == "png"
    assert (out["width"], out["height"]) == (9, 10)
    assert out["mean_value"] == pytest.approx(expected)


def test_png_16bit_adam7_combination():
    px = [[(300,), (70000 % 65536,)], [(12345,), (54321,)], [(9,), (65535,)]]
    expected = sum(v for row in px for p in row for v in p) / 6
    out = decode_media(
        make_png(px, ctype=0, depth=16, interlace=1), "image"
    )
    assert out["mean_value"] == pytest.approx(expected)
    assert (out["width"], out["height"]) == (2, 3)


def test_png_sub_byte_gray_depths_decode_for_real():
    # 4-bit gray, 5 samples/row -> padded final byte, all filters
    px4 = [[(v,) for v in row] for row in
           [[0, 15, 7, 3, 12], [1, 2, 3, 4, 5], [15, 15, 0, 0, 8]]]
    expected = sum(v for row in px4 for (v,) in row) / 15
    out = decode_media(make_png(px4, ctype=0, depth=4, filters=[0, 1, 2]), "image")
    assert (out["codec"], out["width"], out["height"]) == ("png", 5, 3)
    assert out["mean_value"] == pytest.approx(expected)
    # 1-bit gray, 10 samples/row
    px1 = [[(x % 2,) for x in range(10)], [(1,) for _ in range(10)]]
    out = decode_media(make_png(px1, ctype=0, depth=1), "image")
    assert out["mean_value"] == pytest.approx(15 / 20)


def test_png_sub_byte_palette_maps_through_plte():
    plte = bytes([0, 0, 0, 30, 60, 90, 9, 9, 9, 0, 0, 0])
    px = [[(1,), (2,), (1,)], [(0,), (3,), (2,)]]  # 2-bit indices
    out = decode_media(make_png(px, ctype=3, depth=2, plte=plte), "image")
    expected = (180 + 27 + 180 + 0 + 0 + 27) / 18
    assert out["mean_value"] == pytest.approx(expected)


def test_png_sub_byte_adam7_combination():
    px = [[(v % 16,) for v in range(6)] for _ in range(5)]
    expected = sum(v % 16 for v in range(6)) * 5 / 30
    out = decode_media(make_png(px, ctype=0, depth=4, interlace=1), "image")
    assert (out["width"], out["height"]) == (6, 5)
    assert out["mean_value"] == pytest.approx(expected)


def test_png_spec_invalid_combination_falls_back_to_bytes():
    # depth 4 with RGB is not defined by the spec -> byte-fake, not a raise
    b = bytearray(make_png([[(1, 1, 1)]]))
    assert b[24] == 8  # IHDR bit-depth byte
    b[24] = 4
    assert decode_media(bytes(b), "image")["codec"] == "bytes"


def test_png_malformed_falls_back_to_bytes():
    good = make_png([[(5, 5, 5)]])
    # truncated IDAT body -> inflate fails -> bytes fallback
    assert decode_media(good[:-20], "image")["codec"] == "bytes"
    # magic only
    assert decode_media(b"\x89PNG\r\n\x1a\n____", "image")["codec"] == "bytes"


def test_synth_png_closed_forms():
    """The oracle's PNG branch states n_bytes/first/last/width/height/
    mean as closed forms of doc_id — pin synthesis+decode to them."""
    from m4i_flink_tasks_spark.operators.multimodal import synth_png

    for doc_id in (9, 24, 39, 54, 129, 9009):
        b = synth_png(doc_id)
        w, h = 2 + doc_id % 4, 2 + doc_id % 3
        assert len(b) == 68 + h * (1 + 3 * w)  # STORED deflate blocks
        assert b[0] == 137 and b[-1] == 0x82
        out = decode_media(b, "image")
        assert out["codec"] == "png"
        assert (out["width"], out["height"]) == (w, h)
        assert out["mean_value"] == (doc_id * 11) % 256  # exact


# ---------------------------------------------------------------------------
# GIF: real LZW decode (variable-width codes, clear/end, KwKwK)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Independent general LZW encoder (dictionary-building, width
    growth at table-full, 12-bit cap with explicit CLEAR) — exercises
    the decoder on REAL compressed streams, not just literal codes."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out_codes: list[tuple[int, int]] = []  # (code, width-at-emit)

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    out_codes.append((clear, width))
    buf: tuple[int, ...] = ()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        out_codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        # the decoder learns each entry one code later than we add it,
        # so widen one entry AFTER the width-boundary entry is added
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code - 1 == (1 << 12) - 1:
            out_codes.append((clear, width))
            table, next_code, width = reset()
        buf = (sym,)
    if buf:
        out_codes.append((table[buf], width))
    out_codes.append((end, width))

    acc = nbits = 0
    data = bytearray()
    for code, w in out_codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def make_gif(
    frames: list[list[int]],
    w: int,
    h: int,
    palette: list[tuple[int, int, int]],
    min_code_size: int = 2,
) -> bytes:
    bits = max(1, (len(palette) - 1).bit_length())
    pal = b"".join(bytes(p) for p in palette)
    pal += b"\x00" * (3 * ((2 << (bits - 1)) * 2 // 2) - len(pal))  # pad to 2^bits
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0) + pal
    for idx in frames:
        data = _lzw_encode(idx, min_code_size)
        sub = b""
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            sub += bytes([len(chunk)]) + chunk
        out += (
            b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
            + bytes([min_code_size]) + sub + b"\x00"
        )
    return out + b"\x3b"


def test_gif_real_lzw_roundtrip_mean():
    import random

    rng = random.Random(7)
    palette = [(0, 0, 0), (10, 20, 30), (200, 100, 50), (255, 255, 255)]
    idx = [rng.randrange(4) for _ in range(20 * 11)]
    gif = make_gif([idx], 20, 11, palette)
    out = decode_media(gif, "image")
    assert out["codec"] == "gif"
    assert (out["width"], out["height"], out["n_frames"]) == (20, 11, 1)
    exp = sum(sum(palette[i]) for i in idx) / (len(idx) * 3)
    assert out["mean_value"] == pytest.approx(exp)


def test_gif_animated_counts_real_frames():
    palette = [(5, 5, 5), (50, 50, 50)]
    f1 = [0] * 12
    f2 = [1] * 12
    f3 = [0, 1] * 6
    gif = make_gif([f1, f2, f3], 4, 3, palette)
    out = decode_media(gif, "image")
    assert out["n_frames"] == 3
    assert out["mean_value"] == pytest.approx((12 * 5 + 12 * 50 + 6 * 55) / 36)
    # the frame count flows through to the feature row, overriding the
    # chunk-based video fake
    row = decode_stub(gif, "image")
    assert row["n_frames"] == 3


def test_gif_long_stream_grows_code_width():
    """>4096 distinct-ish pixels force width growth past 9 bits and a
    mid-stream table reset — the decoder must track both."""
    import random

    rng = random.Random(99)
    palette = [(i * 16 % 256,) * 3 for i in range(16)]
    idx = [rng.randrange(16) for _ in range(120 * 80)]
    gif = make_gif([idx], 120, 80, palette, min_code_size=4)
    out = decode_media(gif, "image")
    assert out["codec"] == "gif"
    exp = sum(palette[i][0] for i in idx) / len(idx)
    assert out["mean_value"] == pytest.approx(exp)


def test_gif_malformed_falls_back_to_bytes():
    assert decode_media(b"GIF89a____", "image")["codec"] == "bytes"
    good = make_gif([[0, 1, 0, 1]], 2, 2, [(1, 1, 1), (9, 9, 9)])
    assert decode_media(good[:-6], "image")["codec"] == "bytes"


def test_synth_gif_closed_forms():
    from m4i_flink_tasks_spark.operators.multimodal import synth_gif

    for doc_id in (12, 27, 42, 57, 102, 147, 9012):
        b = synth_gif(doc_id)
        w, h = 2 + doc_id % 4, 2 + doc_id % 2
        f = 1 + (doc_id // 15) % 3
        v0 = (doc_id * 13) % 256
        v1 = (v0 + 7) % 256
        n = w * h
        data_bytes = (3 * (n + n // 2 + 2) + 7) // 8
        assert len(b) == 20 + f * (13 + data_bytes)
        assert b[0] == 71 and b[-1] == 0x3B
        out = decode_media(b, "image")
        assert out["codec"] == "gif"
        assert (out["width"], out["height"], out["n_frames"]) == (w, h, f)
        exp = ((n + 1) // 2 * v0 + n // 2 * v1) / n
        assert out["mean_value"] == pytest.approx(exp)


def test_gif_decodes_real_world_files():
    """Not just our own encoder: GIFs produced by real tools (stdlib
    test data / icons shipped in this container) must decode — they
    exercise width growth, mid-stream clears, and multi-frame layout
    from independent encoders."""
    import os

    candidates = [
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.gif",
        "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle_32.gif",
    ]
    found = [p for p in candidates if os.path.exists(p)]
    if not found:
        pytest.skip("no real-world gif available in this environment")
    for p in found:
        out = decode_media(open(p, "rb").read(), "image")
        assert out["codec"] == "gif", p
        assert out["width"] > 0 and out["height"] > 0
        assert 0.0 <= out["mean_value"] <= 255.0


# ---------------------------------------------------------------------------
# IMA ADPCM WAV: predictive 4-bit audio decode
# ---------------------------------------------------------------------------


def _ima_encode(samples: list[int], block_align: int = 256):
    """Independent IMA ADPCM encoder (spec quantize/update loop).
    Returns (payload bytes, the encoder's own reconstruction) — a
    correct decoder must reproduce the reconstruction EXACTLY (the
    decoder loop is deterministic given the nibble stream), while the
    reconstruction-vs-source error is the codec's lossy part."""
    from m4i_flink_tasks_spark.operators.multimodal import (
        _IMA_INDEX,
        _IMA_STEPS,
    )

    recon = []

    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    i = 0
    idx = 0
    while i < len(samples):
        block_samples = samples[i : i + spb]
        pred = block_samples[0]
        out += struct.pack("<hBB", pred, idx, 0)
        recon.append(pred)
        nibbles = []
        for s in block_samples[1:]:
            step = _IMA_STEPS[idx]
            diff = s - pred
            n = 0
            if diff < 0:
                n = 8
                diff = -diff
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            # reconstruct exactly as the decoder will
            d = step >> 3
            if n & 1:
                d += step >> 2
            if n & 2:
                d += step >> 1
            if n & 4:
                d += step
            if n & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + _IMA_INDEX[n & 7]))
            recon.append(pred)
            nibbles.append(n)
        while len(nibbles) < (block_align - 4) * 2:
            nibbles.append(0)
        for j in range(0, len(nibbles), 2):
            out.append(nibbles[j] | (nibbles[j + 1] << 4))
        i += spb
    return bytes(out), recon


def make_ima_wav(samples: list[int], rate: int = 8000,
                 block_align: int = 256) -> bytes:
    spb = (block_align - 4) * 2 + 1
    # pad to whole blocks by repeating the last sample
    n_blocks = -(-len(samples) // spb)
    padded = samples + [samples[-1]] * (n_blocks * spb - len(samples))
    data, recon = _ima_encode(padded, block_align)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, rate * block_align // spb,
        block_align, 4, 2, spb,
    )
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body, recon


def test_ima_adpcm_roundtrip_sine():
    """A sine through the int16 range: the decoder must reproduce the
    encoder's reconstruction EXACTLY (same deterministic update loop),
    and the codec's lossy reconstruction must still track the source
    RMS within ~15% (adaptation lag from the cold step index)."""
    import numpy as np

    t = np.arange(2048)
    src = (12000 * np.sin(2 * np.pi * t / 64)).astype(int).tolist()
    wav, recon = make_ima_wav(src, rate=16000)
    out = decode_media(wav, "audio")
    assert out["codec"] == "wav"
    assert out["sample_rate"] == 16000
    recon_rms = float(np.sqrt(np.mean(np.array(recon, float) ** 2)))
    assert out["mean_value"] == pytest.approx(recon_rms, abs=1e-9)  # exact
    src_rms = float(np.sqrt(np.mean(np.array(src, float) ** 2)))
    assert out["mean_value"] == pytest.approx(src_rms, rel=0.15)


def test_ima_adpcm_constant_is_exact():
    wav, _ = make_ima_wav([123] * 505)
    out = decode_media(wav, "audio")
    assert out["mean_value"] == pytest.approx(123.0)


def test_synth_adpcm_closed_forms():
    from m4i_flink_tasks_spark.operators.multimodal import synth_adpcm_wav

    for doc_id in (4, 19, 34, 49, 334, 9004):
        b = synth_adpcm_wav(doc_id)
        nb = 1 + doc_id % 2
        assert len(b) == 60 + 12 * nb
        out = decode_media(b, "audio")
        assert out["codec"] == "wav"
        assert out["sample_rate"] == 8000 + (doc_id % 6) * 1000
        assert out["n_samples"] == 17 * nb
        assert out["mean_value"] == abs(((doc_id * 3) % 100) - 50)  # exact


def test_adpcm_malformed_falls_back():
    good, _ = make_ima_wav([5] * 505)
    assert decode_media(good[:-3], "audio")["codec"] == "bytes"


# ---------------------------------------------------------------------------
# path/URI columns: the binaryFile-source variant
# ---------------------------------------------------------------------------


def test_file_backed_features_match_inline(spark, sf_dir, tmp_path):
    """SURVEY §2.6 asks for multimodal via BinaryType AND path/URI
    columns: write the same payloads as files, load through the
    binaryFile source, and the feature rows must be byte-identical to
    the inline-column pipeline's."""
    import os

    from m4i_flink_tasks_spark.operators.multimodal import (
        attach_binary_payload,
        features_from_files,
    )
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    inline = attach_binary_payload(docs)
    media_dir = str(tmp_path / "media")
    os.makedirs(media_dir)
    for r in inline.collect():
        p = os.path.join(media_dir, f"{r.doc_id}_{r.media.modality}.bin")
        with open(p, "wb") as fh:
            fh.write(bytes(r.payload))

    from_files = sorted(
        map(tuple, features_from_files(spark, media_dir).collect())
    )
    expected = sorted(map(tuple, extract_features(inline).collect()))
    assert from_files == expected and from_files


def test_file_backed_source_prunes_by_glob(spark, tmp_path):
    """pathGlobFilter keeps non-media files out of the scan entirely."""
    import os

    from m4i_flink_tasks_spark.operators.multimodal import (
        features_from_files,
        synth_png,
    )

    media_dir = str(tmp_path / "mixed")
    os.makedirs(media_dir)
    with open(os.path.join(media_dir, "9_image.bin"), "wb") as fh:
        fh.write(synth_png(9))
    with open(os.path.join(media_dir, "_manifest.json"), "w") as fh:
        fh.write("{}")
    out = features_from_files(spark, media_dir).collect()
    assert [r.doc_id for r in out] == [9]
    assert out[0].codec == "png"


# ---------------------------------------------------------------------------
# Container demux (MP3 / Ogg / MP4) — metadata layer of the codec seam
# ---------------------------------------------------------------------------

from m4i_flink_tasks_spark.operators.multimodal import (  # noqa: E402
    demux_container,
    demux_mp3,
    demux_mp4,
    demux_ogg,
    synth_mp3,
    synth_mp4,
    synth_ogg,
)


def test_demux_mp3_closed_form_round_trip():
    for d in (1, 7, 13, 49, 451):
        out = demux_mp3(synth_mp3(d))
        nf = 4 + (d // 2) % 6
        assert out["n_frames"] == nf
        assert out["sample_rate"] == 44100
        assert out["n_samples"] == nf * 1152
        assert out["duration_ms"] == nf * 1152 * 1000 // 44100


def test_demux_mp3_full_header_table():
    """The synth emits only the 128kbps/44.1kHz profile; this drives
    the demuxer's MPEG-1 Layer III table walk over EVERY valid
    (bitrate, samplerate, padding) combination — hand-built frames,
    mixed bitrates within one stream, exactly the shape of real VBR
    rips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from m4i_flink_tasks_spark.operators.multimodal import (
        _MP3_BITRATES,
        _MP3_RATES,
    )

    def frame(bidx: int, ridx: int, pad: int) -> bytes:
        hdr = bytes([0xFF, 0xFB, (bidx << 4) | (ridx << 2) | (pad << 1), 0])
        length = 144 * _MP3_BITRATES[bidx] // _MP3_RATES[ridx] + pad
        return hdr + bytes(length - 4)

    @settings(max_examples=200, deadline=None)
    @given(
        ridx=st.integers(0, 2),
        frames=st.lists(
            st.tuples(st.integers(1, 14), st.booleans()), min_size=1, max_size=12
        ),
    )
    def check(ridx, frames):
        b = b"".join(frame(bi, ridx, int(p)) for bi, p in frames)
        out = demux_mp3(b)
        assert out["n_frames"] == len(frames)
        assert out["sample_rate"] == _MP3_RATES[ridx]
        assert out["n_samples"] == len(frames) * 1152
        assert (
            out["duration_ms"]
            == len(frames) * 1152 * 1000 // _MP3_RATES[ridx]
        )
        # any mid-stream truncation must be rejected, never misparsed
        with pytest.raises(ValueError):
            demux_mp3(b[:-1])

    check()


def test_demux_mp3_without_id3_tag():
    # Bare frame stream (no ID3) is valid — common for stream rips.
    raw = synth_mp3(9)[20:]  # strip the 10-byte header + 10-byte body
    out = demux_mp3(raw)
    assert out["n_frames"] == 4 + (9 // 2) % 6


def test_demux_mp3_rejects_truncation():
    import pytest

    b = synth_mp3(5)
    with pytest.raises(ValueError):
        demux_mp3(b[:-7])  # mid-frame cut: trailing garbage


def test_demux_ogg_round_trip_and_granule():
    for d in (2, 5, 14, 23, 998):
        out = demux_ogg(synth_ogg(d))
        assert out["n_frames"] == 2
        assert out["sample_rate"] == (22050 if d % 2 == 0 else 44100)
        assert out["n_samples"] == 1000 + 17 * ((d // 4) % 50)
        assert out["codec"] == f"vorbis-{1 + (d // 2) % 2}ch"


def test_demux_ogg_rejects_non_vorbis_first_packet():
    import pytest

    b = bytearray(synth_ogg(2))
    # corrupt the ident packet type byte (first payload byte, page 1)
    b[28] = 0x42
    with pytest.raises(ValueError):
        demux_ogg(bytes(b))


def test_demux_mp4_box_walk_round_trip():
    for d in (0, 3, 12, 30, 120):
        out = demux_mp4(synth_mp4(d))
        assert out["codec"] == "mp4:avc1"
        assert out["width"] == 16 * (1 + (d // 3) % 4)
        assert out["height"] == 16 * (1 + (d // 5) % 3)
        n = 3 + (d // 2) % 5
        assert out["n_frames"] == n
        assert out["duration_ms"] == n * 40


def test_demux_mp4_stco_points_at_real_mdat_payload():
    # The sample table must be honest: the chunk offset lands exactly on
    # the first mdat payload byte.
    import struct

    b = synth_mp4(6)
    found: dict = {}
    from m4i_flink_tasks_spark.operators.multimodal import _walk_boxes

    _walk_boxes(b, 0, len(b), found)
    offset = struct.unpack_from(">I", found[b"stco"], 8)[0]
    first_size = struct.unpack_from(">I", found[b"stsz"], 12)[0]
    assert b[offset : offset + first_size] == found[b"mdat"][:first_size]


def test_demux_ogg_rejects_truncated_page():
    """A page whose segment table announces more body bytes than the
    file holds must be rejected, not silently under-read (a truncated
    crawl shard would otherwise demux to wrong duration/sample facts)."""
    import pytest

    b = synth_ogg(6)
    with pytest.raises(ValueError):
        demux_ogg(b[:-3])
    with pytest.raises(ValueError):
        # cut inside the final segment table
        demux_ogg(b[: len(synth_ogg(6)) - (len(b) - b.rindex(b"OggS")) + 27])


def test_demux_ogg_multi_segment_lacing():
    """Real Vorbis packets >255 bytes span multiple lacing segments;
    the body-length sum must cover all of them."""
    import struct as _s

    ident = (
        bytes([1])
        + b"vorbis"
        + _s.pack("<IBIiii", 0, 2, 44100, 0, 0, 0)
        + bytes([0x88, 1])
    )
    big = bytes(300)  # 300-byte packet -> lacing [255, 45]
    page0 = (
        b"OggS" + bytes([0, 2]) + _s.pack("<q", 0) + _s.pack("<I", 7)
        + _s.pack("<I", 0) + _s.pack("<I", 0)
        + bytes([1, len(ident)]) + ident
    )
    page1 = (
        b"OggS" + bytes([0, 4]) + _s.pack("<q", 5000) + _s.pack("<I", 7)
        + _s.pack("<I", 1) + _s.pack("<I", 0)
        + bytes([2, 255, 45]) + big
    )
    out = demux_ogg(page0 + page1)
    assert out["codec"] == "vorbis-2ch"
    assert out["sample_rate"] == 44100
    assert out["n_samples"] == 5000
    assert out["n_frames"] == 2


def test_demux_mp4_rejects_bad_box_size():
    import pytest

    b = bytearray(synth_mp4(0))
    b[0:4] = (2).to_bytes(4, "big")  # ftyp box size < 8
    with pytest.raises(ValueError):
        demux_mp4(bytes(b))


def _mdat_offset(b: bytes) -> int:
    """Top-level offset of the trailing mdat box in a synth_mp4."""
    import struct as _s

    pos = 0
    while pos + 8 <= len(b):
        size, typ = _s.unpack_from(">I4s", b, pos)
        if typ == b"mdat":
            return pos
        pos += size
    raise AssertionError("no mdat")


def test_demux_mp4_largesize_box():
    """ISO-BMFF 64-bit largesize header (size field == 1, how every
    >4 GB video ships): rewriting the trailing mdat into largesize
    form must demux to identical metadata."""
    import struct as _s

    for d in (0, 4, 8, 44):
        orig = synth_mp4(d)
        base = demux_mp4(orig)
        pos = _mdat_offset(orig)
        (size,) = _s.unpack_from(">I", orig, pos)
        rewritten = (
            orig[:pos]
            + (1).to_bytes(4, "big")
            + b"mdat"
            + _s.pack(">Q", size + 8)
            + orig[pos + 8 :]
        )
        assert demux_mp4(rewritten) == base


def test_demux_mp4_size_zero_final_box():
    """size == 0 means 'extends to end of file' and is legal for the
    final box; common for a trailing mdat written by a live muxer."""
    for d in (0, 4, 8, 44):
        orig = synth_mp4(d)
        base = demux_mp4(orig)
        pos = _mdat_offset(orig)
        rewritten = bytearray(orig)
        rewritten[pos : pos + 4] = (0).to_bytes(4, "big")
        assert demux_mp4(bytes(rewritten)) == base


def test_demux_mp4_truncated_largesize_rejected():
    import pytest

    orig = synth_mp4(0)
    pos = _mdat_offset(orig)
    # size=1 announces an 8-byte largesize that isn't there
    broken = orig[:pos] + (1).to_bytes(4, "big") + b"mdat"
    with pytest.raises(ValueError):
        demux_mp4(broken)


def test_demux_container_routing_by_magic():
    assert demux_container(synth_mp4(0))["container"] == "mp4"
    assert demux_container(synth_mp3(1))["container"] == "mp3"
    assert demux_container(synth_ogg(2))["container"] == "ogg"
    import pytest

    with pytest.raises(ValueError):
        demux_container(b"plain text payload")


def test_demux_never_crashes_on_arbitrary_bytes():
    """Fuzz the container demuxers: any byte string either demuxes to a
    complete metadata dict or raises ValueError — never an unhandled
    IndexError/struct.error/hang (a 100 TB crawl WILL contain garbage
    with valid magic bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    keys = {
        "container", "codec", "width", "height",
        "n_frames", "sample_rate", "n_samples", "duration_ms",
    }

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(payload):
        for prefix in (
            b"", b"ID3", b"OggS", b"\x00\x00\x00\x18ftyp",
            b"\xff\xfb", b"\x1aE\xdf\xa3", b"fLaC",
        ):
            try:
                out = demux_container(prefix + payload)
            except ValueError:
                continue
            assert set(out) == keys
        return None

    run()


def test_demux_webm_ebml_walk_round_trip():
    from m4i_flink_tasks_spark.operators.multimodal import (
        demux_webm,
        synth_webm,
    )

    for d in (3, 7, 15, 27, 451):
        out = demux_webm(synth_webm(d))
        assert out["container"] == "webm"
        assert out["codec"] == "webm:V_VP9"
        assert out["width"] == 32 * (1 + (d // 3) % 4)
        assert out["height"] == 32 * (1 + (d // 5) % 3)
        assert out["duration_ms"] == 200 + 8 * ((d // 2) % 40)


def test_demux_webm_rejects_overrunning_element():
    import pytest

    from m4i_flink_tasks_spark.operators.multimodal import (
        demux_webm,
        synth_webm,
    )

    b = bytearray(synth_webm(3))
    # inflate the EBML header's declared size past the buffer end
    b[5] = 0x7F
    with pytest.raises(ValueError):
        demux_webm(bytes(b))


def test_progressive_jpeg_rides_the_driver_checked_path():
    """Even 15-multiples of doc_id carry a PROGRESSIVE stream through
    attach_binary_payload; it must decode to the same features as the
    baseline synth (same flat image) with its own closed-form byte
    count — so the driver hash now exercises the multi-scan decoder."""
    from m4i_flink_tasks_spark.operators.multimodal import (
        synth_jpeg,
        synth_progressive_jpeg,
    )

    for d in (0, 30, 60, 450, 900):
        prog = synth_progressive_jpeg(d)
        assert b"\xff\xc2" in prog and b"\xff\xc0" not in prog  # SOF2, no SOF0
        p, b = decode_media(prog, "image"), decode_media(synth_jpeg(d), "image")
        assert (p["codec"], p["width"], p["height"], p["mean_value"]) == (
            b["codec"], b["width"], b["height"], b["mean_value"],
        )
        n = (1 + d % 3) * (1 + d % 2)
        assert len(prog) == 171 + (7 + 4 * (n - 1) + 7) // 8 + 2 * ((n + 7) // 8)


# --------------------------------------------------------------------------
# FLAC STREAMINFO metadata walk (RFC 9639)
# --------------------------------------------------------------------------


def test_demux_flac_round_trip():
    from m4i_flink_tasks_spark.operators.multimodal import (
        demux_container,
        synth_flac,
    )

    for d in (0, 1, 2, 3, 7, 64, 127, 1001):
        m = demux_container(synth_flac(d))
        rate = (32000, 44100, 48000)[d % 3]
        total = 800 + 13 * ((d // 2) % 64)
        bps = 16 if d % 2 == 0 else 24
        ch = 1 + (d // 3) % 2
        assert m["container"] == "flac"
        assert m["codec"] == f"flac-{bps}b-{ch}ch"
        assert m["sample_rate"] == rate
        assert m["n_samples"] == total
        assert m["duration_ms"] == total * 1000 // rate
        assert m["width"] is None and m["n_frames"] is None


def test_demux_flac_stops_at_last_flag_not_eof():
    """The metadata walk must terminate on the last-flag block and
    leave trailing audio frames unread — appending garbage after the
    metadata chain must not change the result or raise."""
    from m4i_flink_tasks_spark.operators.multimodal import (
        demux_flac,
        synth_flac,
    )

    base = synth_flac(9)
    assert demux_flac(base) == demux_flac(base + b"\x00garbage\xff\xff")


def test_demux_flac_rejects_malformed():
    from m4i_flink_tasks_spark.operators.multimodal import demux_flac

    with pytest.raises(ValueError):
        demux_flac(b"OggS not flac")
    with pytest.raises(ValueError):  # truncated block header
        demux_flac(b"fLaC\x00\x00\x00")
    with pytest.raises(ValueError):  # first block not STREAMINFO
        demux_flac(b"fLaC" + bytes([0x84, 0, 0, 1, 0]))
    with pytest.raises(ValueError):  # STREAMINFO wrong size
        demux_flac(b"fLaC" + bytes([0x80, 0, 0, 2]) + bytes(2))
    with pytest.raises(ValueError):  # body overruns stream
        demux_flac(b"fLaC" + bytes([0x80, 0, 0, 40]) + bytes(10))


def test_flac_behind_decode_seam():
    """decode_media must route fLaC to the compressed seam, not the
    byte-fake fallback: the sample decode genuinely needs a codec lib,
    while the STREAMINFO facts come from demux_flac."""
    from m4i_flink_tasks_spark.operators.multimodal import synth_flac

    with pytest.raises(NotImplementedError):
        decode_media(synth_flac(3), "audio")
