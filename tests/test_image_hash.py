"""Perceptual image hash (operators/image_hash.py): BMP raster walk,
aHash bit rule, duplicate grouping, plan shape."""

from __future__ import annotations

import struct

import numpy as np

from m4i_flink_tasks_spark.operators.image_hash import (
    ahash_halves,
    attach_pattern_payload,
    bmp_gray_raster,
    extract_ahash,
    perceptual_dup_groups,
    synth_pattern_bmp,
)


def _bmp(w: int, h: int, rows_bottom_up: list[list[tuple]]) -> bytes:
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in rows_bottom_up:
        line = bytearray()
        for bgr in row:
            line += bytes(bgr)
        line += b"\x00" * (stride - len(line))
        raster += line
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
    )
    return hdr + bytes(raster)


def test_raster_flips_bottom_up_and_honors_padding():
    # 3x2: bottom row = 10s, top row = 200s; stride pads 3*3=9 -> 12
    img = _bmp(
        3, 2,
        [[(10, 10, 10)] * 3, [(200, 200, 200)] * 3],
    )
    gray = bmp_gray_raster(img)
    assert gray.shape == (2, 3)
    assert gray[0].tolist() == [200, 200, 200]  # top-down after flip
    assert gray[1].tolist() == [10, 10, 10]


def test_raster_channel_mean_floors():
    img = _bmp(1, 1, [[(1, 2, 3)]])
    assert bmp_gray_raster(img)[0, 0] == 2  # (1+2+3)//3


def test_raster_rejects_garbage():
    assert bmp_gray_raster(b"PNG not a bmp") is None
    assert bmp_gray_raster(b"") is None


def test_ahash_bit_rule_exact():
    # left half 0, right half 255: bits set exactly on columns 4..7
    gray = np.zeros((16, 16), dtype=np.int64)
    gray[:, 8:] = 255
    w, h, hi, lo = ahash_halves(gray)
    assert (w, h) == (16, 16)
    bits = (hi << 32) | lo
    for i in range(8):
        for j in range(8):
            assert ((bits >> (i * 8 + j)) & 1) == (1 if j >= 4 else 0)


def test_ahash_constant_image_is_zero():
    # no cell strictly exceeds the mean -> all bits clear
    gray = np.full((16, 16), 77, dtype=np.int64)
    assert ahash_halves(gray)[2:] == (0, 0)


def test_synth_decodes_to_pattern():
    gray = bmp_gray_raster(synth_pattern_bmp(123))
    g = 123 % 40
    a, b, c = 1 + g % 7, 1 + g % 5, (g * 37) % 256
    for y in (0, 7, 15):
        for x in (0, 3, 15):
            assert gray[y, x] == (a * x + b * y + c) % 256


def test_duplicate_groups_exist_and_are_consistent(spark, sf_dir):
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    hashed = extract_ahash(attach_pattern_payload(docs))
    plan = hashed._jdf.queryExecution().executedPlan().toString()
    # decode+hash must never shuffle PAYLOAD bytes: the only allowed
    # Exchange is spread_for_python's narrow doc_id repartition,
    # upstream of the payload synthesis UDF (see test_audio_spectral).
    synth_pos = plan.index("ArrowEvalPython")
    for pos in range(len(plan)):
        if plan.startswith("Exchange", pos):
            assert pos > synth_pos, plan
            assert plan.startswith("Exchange hashpartitioning(doc_id", pos), plan

    out = perceptual_dup_groups(hashed).collect()
    assert out
    # pattern repeats every 40 ids -> multi-member groups at any SF
    assert any(r.group_size > 1 for r in out)
    by_hash: dict = {}
    for r in out:
        by_hash.setdefault((r.ahash_hi, r.ahash_lo), []).append(r)
    for rows in by_hash.values():
        keep = min(r.doc_id for r in rows)
        for r in rows:
            assert r.keep_doc_id == keep
            assert r.group_size == len(rows)
            assert r.is_dup == (r.doc_id != keep)


def test_neardup_pairs_band_candidacy_and_distance(spark, sf_dir):
    """Every emitted pair shares >=1 of the four 16-bit bands AND has
    1 <= hamming <= 12; and every band-sharing near pair is emitted
    (parity with the brute-force recomputation)."""
    from m4i_flink_tasks_spark.queries.llm_dedup import (
        image_perceptual_neardup,
    )

    rows = image_perceptual_neardup(spark, sf_dir).collect()
    assert rows  # the 40-seed pattern guarantees near pairs

    def bands(hi, lo):
        return (
            lo & 0xFFFF, (lo >> 16) & 0xFFFF,
            hi & 0xFFFF, (hi >> 16) & 0xFFFF,
        )

    for r in rows:
        d = bin(r.hi_a ^ r.hi_b).count("1") + bin(r.lo_a ^ r.lo_b).count("1")
        assert d == r.hamming_dist and 1 <= d <= 12
        assert any(
            x == y
            for x, y in zip(bands(r.hi_a, r.lo_a), bands(r.hi_b, r.lo_b))
        )

    # brute-force parity over the distinct-hash dimension
    from m4i_flink_tasks_spark.operators.image_hash import (
        attach_pattern_payload,
        extract_ahash,
    )
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    hs = {
        (r.ahash_hi, r.ahash_lo)
        for r in extract_ahash(attach_pattern_payload(docs))
        .select("ahash_hi", "ahash_lo")
        .distinct()
        .collect()
    }
    import itertools

    expect = set()
    for (hia, loa), (hib, lob) in itertools.combinations(sorted(hs), 2):
        d = bin(hia ^ hib).count("1") + bin(loa ^ lob).count("1")
        share = any(
            x == y for x, y in zip(bands(hia, loa), bands(hib, lob))
        )
        if share and 1 <= d <= 12:
            expect.add((hia, loa, hib, lob))
    got = {(r.hi_a, r.lo_a, r.hi_b, r.lo_b) for r in rows}
    assert got == expect


def test_stream_image_dedup_equals_batch(spark, sf_dir):
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_dedup import image_perceptual_dedup
    from m4i_flink_tasks_spark.streaming.image_dedup import (
        run_stream_image_dedup,
    )

    wd = tempfile.mkdtemp(prefix="m4i_imgdedup_")
    got = sorted(
        map(tuple, run_stream_image_dedup(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, image_perceptual_dedup(spark, sf_dir).collect())
    )
    assert got == exp and got


def test_stream_image_dedup_mid_stream_restart(spark, sf_dir):
    """SUM/MIN group state + the checkpoint make a restart over a
    partially-processed stream land on the identical groups."""
    import os
    import shutil
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_dedup import image_perceptual_dedup
    from m4i_flink_tasks_spark.streaming.image_dedup import (
        run_stream_image_dedup,
        stage_images,
    )

    import glob as _glob

    wd = tempfile.mkdtemp(prefix="m4i_imgdedup_restart_")
    staging = stage_images(
        spark, sf_dir, os.path.join(wd, "staging_images"), 4
    )
    parts = sorted(_glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_imgdedup_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_image_dedup(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_image_dedup(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, image_perceptual_dedup(spark, sf_dir).collect())
    )
    assert final == exp
