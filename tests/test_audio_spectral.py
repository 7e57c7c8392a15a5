"""Audio spectral operator (operators/audio.py): WAV sample access,
FFT feature math vs closed forms, and the map-only plan shape."""

from __future__ import annotations

import math
import struct

import numpy as np

from m4i_flink_tasks_spark.operators.audio import (
    attach_tone_payload,
    clip_spectral_features,
    extract_spectral_features,
    synth_tone_wav,
    wav_pcm_samples,
)


def _wav(rate: int, data: bytes, n_ch: int = 1, bits: int = 16) -> bytes:
    frame = n_ch * bits // 8
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_ch, rate, rate * frame, frame, bits
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_wav_pcm_samples_16bit_mono():
    data = struct.pack("<4h", 100, -100, 50, -50)
    rate, x = wav_pcm_samples(_wav(8000, data))
    assert rate == 8000
    assert x.tolist() == [100.0, -100.0, 50.0, -50.0]


def test_wav_pcm_samples_8bit_centering():
    # 8-bit WAV is unsigned; 128 must decode to 0
    rate, x = wav_pcm_samples(_wav(8000, bytes([128, 228, 28, 128]), bits=8))
    assert x.tolist() == [0.0, 100.0, -100.0, 0.0]


def test_wav_pcm_samples_stereo_mixdown():
    data = struct.pack("<8h", 100, 200, -100, -200, 0, 50, 10, 30)
    _, x = wav_pcm_samples(_wav(8000, data, n_ch=2))
    assert x.tolist() == [150.0, -150.0, 25.0, 20.0]


def test_wav_pcm_samples_rejects_non_wav():
    assert wav_pcm_samples(b"not a wav at all, nope") is None
    assert wav_pcm_samples(b"") is None


def test_tone_features_match_closed_form():
    for doc_id in (1, 4, 7, 10, 13, 31, 97, 1000003):
        rate, x = wav_pcm_samples(synth_tone_wav(doc_id))
        feats = clip_spectral_features(rate, x)
        c0 = (doc_id % 41) - 20
        a, b = 60 + doc_id % 40, 10 + doc_id % 35
        h4, c2 = (a, b) if doc_id % 2 == 0 else (b, a)
        assert feats["rms"] == math.sqrt(c0 * c0 + 2 * h4 * h4 + c2 * c2)
        want_peak = rate / 4.0 if h4 > c2 else rate / 2.0
        assert abs(feats["peak_hz"] - want_peak) < 1e-6
        want_centroid = (rate / 4.0 * h4 + rate / 2.0 * c2) / (h4 + c2)
        assert abs(feats["centroid_hz"] - want_centroid) < 1e-6
        want_hf = c2 * c2 / (h4 * h4 + c2 * c2)
        assert abs(feats["hf_power_ratio"] - want_hf) < 1e-9
        assert abs(feats["dc_level"] - abs(c0)) < 1e-9


def test_spectrum_is_sparse():
    # all non-signal bins must be numerically ~zero (integer periods,
    # rectangular window -> no leakage)
    rate, x = wav_pcm_samples(synth_tone_wav(42))
    mag = np.abs(np.fft.rfft(x))
    n = x.size
    signal_bins = {0, n // 4, n // 2}
    noise = [m for k, m in enumerate(mag) if k not in signal_bins]
    assert max(noise) < 1e-8


def test_degenerate_clip():
    feats = clip_spectral_features(8000, np.array([1.0, 2.0]))
    assert feats["rms"] == 0.0 and feats["peak_hz"] == 0.0


def test_extract_is_map_only(spark, sf_dir):
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = extract_spectral_features(attach_tone_payload(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # decode+FFT must never shuffle PAYLOAD bytes: the only allowed
    # Exchange is spread_for_python's narrow doc_id repartition, which
    # sits UPSTREAM of (prints after, in top-down order) the payload
    # synthesis UDF — so every column that moves is pre-payload.
    synth_pos = plan.index("ArrowEvalPython")
    for pos in range(len(plan)):
        if plan.startswith("Exchange", pos):
            assert pos > synth_pos, plan
            assert plan.startswith("Exchange hashpartitioning(doc_id", pos), plan
    row = df.filter("doc_id = 1").collect()[0]
    assert row.sample_rate == 9000 and row.n_samples == 80


def test_stream_audio_ingest_equals_batch(spark, sf_dir):
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_multimodal import (
        audio_spectral_profile,
    )
    from m4i_flink_tasks_spark.streaming.audio_ingest import (
        run_stream_audio_ingest,
    )

    wd = tempfile.mkdtemp(prefix="m4i_audio_ingest_")
    got = sorted(
        map(tuple, run_stream_audio_ingest(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, audio_spectral_profile(spark, sf_dir).collect())
    )
    assert got == exp and got


def test_stream_audio_ingest_mid_stream_restart(spark, sf_dir):
    """Insert-only catalog + checkpoint: a restart over a partially
    processed stream lands on the identical catalog."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_multimodal import (
        audio_spectral_profile,
    )
    from m4i_flink_tasks_spark.streaming.audio_ingest import (
        run_stream_audio_ingest,
        stage_audio,
    )

    wd = tempfile.mkdtemp(prefix="m4i_audio_restart_")
    staging = stage_audio(
        spark, sf_dir, os.path.join(wd, "staging_audio"), 4
    )
    parts = sorted(_glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_audio_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_audio_ingest(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_audio_ingest(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, audio_spectral_profile(spark, sf_dir).collect())
    )
    assert final == exp


def test_burst_synth_frame_energies_exact():
    import numpy as np

    from m4i_flink_tasks_spark.operators.audio import (
        FRAME_LEN,
        synth_burst_wav,
        wav_pcm_samples,
    )

    for doc_id in (1, 7, 22, 1003):
        rate, x = wav_pcm_samples(synth_burst_wav(doc_id))
        assert rate == 8000 + (doc_id % 4) * 1000
        n_blocks = 6 + doc_id % 5
        amp = 50 + doc_id % 50
        assert x.size == n_blocks * FRAME_LEN
        frames = x.reshape(n_blocks, FRAME_LEN)
        for b in range(n_blocks):
            want = amp * amp if (doc_id * 37 + b) % 3 == 0 else 0.0
            assert (frames[b] ** 2).mean() == want


def test_energy_segments_are_maximal_runs(spark, sf_dir):
    """Segments must be disjoint maximal runs: within a doc, segments
    are separated by at least one silent frame, and every segment's
    frames are contiguous."""
    from m4i_flink_tasks_spark.queries.llm_multimodal import (
        audio_energy_segments,
    )

    rows = audio_energy_segments(spark, sf_dir).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.seg_id)
        assert [r.seg_id for r in doc_rows] == list(
            range(1, len(doc_rows) + 1)
        )
        for r in doc_rows:
            assert r.end_frame - r.start_frame + 1 == r.n_frames
            assert r.mean_energy > 0
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert b.start_frame > a.end_frame + 1  # gap between runs
