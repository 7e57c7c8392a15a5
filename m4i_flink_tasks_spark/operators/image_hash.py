"""Perceptual image hashing (average hash) over binary image columns.

aHash is the classic perceptual fingerprint (8x8 mean-pooled grid,
one bit per cell = cell brighter than the image mean) used for
exact-and-near duplicate detection of images in web-scale corpora —
the image-side sibling of the text MinHash family. The Spark stage
decodes REAL image bytes (24-bit BMP parse: bottom-up rows, BGR,
4-byte row padding — same container the multimodal decoders prove) and
hashes rasters with pure integer arithmetic, so the DuckDB oracle can
RECONSTRUCT every pixel independently and recompute the identical
hash — a stronger check than a closed form, because any raster-walk
bug (row order, padding, channel order) flips bits.

Scale shape: decode + hash is one Arrow-batched map-only stage (the
multimodal posture); the duplicate-grouping aggregate shuffles 16-byte
(hash_hi, hash_lo) keys — never pixels — so the shuffle is O(rows),
and hash-equality grouping replaces any pairwise image comparison.

All comparisons are integer-exact: bit(i,j) = 64 * cell_sum(i,j) >
total_sum (cell mean > image mean cleared of division), and the 64
bits pack into two 32-bit halves so both engines stay inside BIGINT.

No reference analogue (north-star multimodal-dedup scope).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GRID = 8  # aHash grid — 64 bits

AHASH_SCHEMA = "doc_id long, width int, height int, ahash_hi long, ahash_lo long"


def bmp_gray_raster(b: bytes) -> np.ndarray | None:
    """24-bit uncompressed BMP -> top-down grayscale int array
    (channel mean, floor). Same layout rules as
    ``multimodal._decode_bmp`` (bottom-up rows, BGR triples, rows
    padded to 4 bytes), but returning the full raster."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    (off,) = struct.unpack_from("<I", b, 10)
    hdr_sz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", b, 14)
    if hdr_sz < 40 or bpp != 24 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + stride * h > len(b):
        return None
    rows = np.frombuffer(b, np.uint8, stride * h, off).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3).astype(np.int64)
    if not top_down:
        px = px[::-1]
    return px.sum(axis=2) // 3  # BGR channel-mean, floor


def ahash_halves(gray: np.ndarray) -> tuple[int, int, int, int]:
    """(width, height, hash_hi, hash_lo). Cell (i, j) covers pixel rows
    [i*h//G, (i+1)*h//G) x cols [j*w//G, (j+1)*w//G); bit set iff the
    cell mean exceeds the image mean — compared as integers
    (cell_sum * n_pixels > total_sum * cell_n) so the result is exact.
    Bit order: row-major, bit k = (i*G + j), hi = bits 32..63."""
    h, w = gray.shape
    total = int(gray.sum())
    n_px = h * w
    bits = 0
    for i in range(GRID):
        r0, r1 = i * h // GRID, (i + 1) * h // GRID
        for j in range(GRID):
            c0, c1 = j * w // GRID, (j + 1) * w // GRID
            cell = gray[r0:r1, c0:c1]
            cell_n = cell.size
            if cell_n and int(cell.sum()) * n_px > total * cell_n:
                bits |= 1 << (i * GRID + j)
    return w, h, (bits >> 32) & 0xFFFFFFFF, bits & 0xFFFFFFFF


def synth_pattern_bmp(doc_id: int) -> bytes:
    """16x16 24-bit BMP with a linear-gradient pattern that repeats
    every 40 doc_ids, so perceptual-duplicate groups exist by
    construction:

        g = doc_id % 40
        pixel(x, y) = (a*x + b*y + c) % 256        (all three channels)
        a = 1 + g % 7,  b = 1 + g % 5,  c = (g * 37) % 256

    x is the column (left->right), y the row (top->bottom). 16*3 = 48
    bytes per row — already 4-byte aligned, no padding; rows are
    stored bottom-up per the BMP default."""
    g = doc_id % 40
    a, b, c = 1 + g % 7, 1 + g % 5, (g * 37) % 256
    w = h = 16
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(w):
            v = (a * x + b * y + c) % 256
            row += bytes((v, v, v))
        rows.append(bytes(row))
    raster = b"".join(rows)
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
    )
    return hdr + raster


def attach_pattern_payload(docs: DataFrame) -> DataFrame:
    """Patterned-image ingest stand-in for every image-modality row
    (doc_id % 3 == 0, the modality round-robin of
    ``multimodal.attach_binary_payload``)."""

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_pattern_bmp(int(d)) for d in doc_id], dtype=object
        )

    from .multimodal import spread_for_python

    return spread_for_python(
        docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    ).select("doc_id", _payload(F.col("doc_id")).alias("payload"))


def extract_ahash(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + hash; map-only (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                gray = bmp_gray_raster(bytes(payload))
                if gray is None:
                    rows.append(
                        {
                            "doc_id": int(d), "width": 0, "height": 0,
                            "ahash_hi": -1, "ahash_lo": -1,
                        }
                    )
                    continue
                w, h, hi, lo = ahash_halves(gray)
                rows.append(
                    {
                        "doc_id": int(d), "width": w, "height": h,
                        "ahash_hi": hi, "ahash_lo": lo,
                    }
                )
            yield pd.DataFrame(rows)

    return with_payload.mapInPandas(run, schema=AHASH_SCHEMA)


def perceptual_dup_groups(hashed: DataFrame) -> DataFrame:
    """Per-doc duplicate verdicts by perceptual-hash equality: group
    size, the min-doc_id survivor, and the is_dup flag. One shuffle on
    the 16-byte hash key."""
    w = Window.partitionBy("ahash_hi", "ahash_lo")
    return hashed.select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.count("*").over(w).alias("group_size"),
        F.min("doc_id").over(w).alias("keep_doc_id"),
    ).withColumn("is_dup", F.col("doc_id") != F.col("keep_doc_id"))
