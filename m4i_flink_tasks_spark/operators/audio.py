"""Audio spectral analysis over binary WAV payloads.

Clip-level frequency-domain features via a REAL full-clip rFFT
(rectangular window) over decoded PCM samples — the standard first
step of any audio-understanding pipeline (VAD, music/speech
classification, quality gating) before a learned model runs.

Scale posture: decode + FFT run inside one Arrow-batched
``mapInPandas`` pass (one numpy rFFT per clip, no per-row Python on
the driver), so the stage parallelizes per input split exactly like
the image decoders in ``operators/multimodal.py``. Clip payloads are
bounded (a 10-minute 44.1 kHz mono clip is ~50 MB decoded; the rFFT
is O(n log n) per clip) and nothing shuffles — the stage is
map-only, so the plan survives a 1000-executor fan-out unchanged.

Oracle strategy (same pattern as the image/codec families): the
synthesized test tones place all signal energy at DFT bins
{0, N/4, N/2}, whose sample patterns are exact small integers
(cos(pi*n/2) cycles through 1,0,-1,0 and cos(pi*n) through 1,-1), so
the one-sided spectrum and every derived feature are closed forms of
``doc_id`` that DuckDB states directly — yet the Spark side computes
them with the REAL FFT path any production clip would take.

Reference scope note: the reference pipeline (m4i-flink-tasks) has no
audio surface; this module is part of the north-star LLM-pipeline
extension the build brief asks for (multimodal corpus curation).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPECTRAL_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, rms double, "
    "peak_hz double, centroid_hz double, hf_power_ratio double, "
    "dc_level double"
)


def wav_pcm_samples(b: bytes) -> tuple[int, np.ndarray] | None:
    """Raw sample access for spectral work: RIFF chunk walk (same
    contract as ``multimodal._decode_wav``) returning
    ``(rate, float64 mono samples)`` for uncompressed 8/16-bit PCM;
    None for anything else (caller falls back to the metadata path).
    Multi-channel input is mixed down by channel averaging."""
    if len(b) < 44 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + sz]
        if len(body) < sz:
            return None
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_format, n_ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits not in (8, 16) or n_ch == 0:
        return None
    frame = n_ch * bits // 8
    raw = np.frombuffer(
        data[: len(data) - (len(data) % frame)],
        dtype=np.int16 if bits == 16 else np.uint8,
    ).astype(np.float64)
    if bits == 8:
        raw -= 128.0  # 8-bit WAV is unsigned, center it
    if n_ch > 1:
        raw = raw[: raw.size - raw.size % n_ch].reshape(-1, n_ch).mean(axis=1)
    return int(rate), raw


def clip_spectral_features(rate: int, x: np.ndarray) -> dict:
    """One clip -> frequency-domain features from the one-sided rFFT
    magnitude spectrum (rectangular window over the whole clip).

    DC (bin 0) is excluded from peak/centroid/band features — it is
    reported separately as ``dc_level`` — so a loud DC offset cannot
    masquerade as signal content."""
    n = int(x.size)
    if n < 4:
        return {
            "rms": 0.0, "peak_hz": 0.0, "centroid_hz": 0.0,
            "hf_power_ratio": 0.0, "dc_level": 0.0,
        }
    mag = np.abs(np.fft.rfft(x))  # bins 0..n//2
    freqs = np.arange(mag.size) * (rate / n)
    ac_mag, ac_freqs = mag[1:], freqs[1:]
    tot = float(ac_mag.sum())
    power = ac_mag**2
    # "high frequency" = strictly above rate/4 (upper half of the
    # one-sided band)
    hi = ac_freqs > rate / 4.0
    pw_tot = float(power.sum())
    return {
        "rms": float(np.sqrt(np.mean(x**2))),
        "peak_hz": float(ac_freqs[int(np.argmax(ac_mag))]),
        "centroid_hz": float((ac_freqs * ac_mag).sum() / tot) if tot else 0.0,
        "hf_power_ratio": float(power[hi].sum() / pw_tot) if pw_tot else 0.0,
        "dc_level": float(mag[0] / n),
    }


def synth_tone_wav(doc_id: int) -> bytes:
    """16-bit mono PCM WAV whose samples are EXACT integers with all
    spectral mass at bins {0, N/4, N/2}:

        x[n] = c0 + c1*cos(pi*n/2) + c2*cos(pi*n)

    cos(pi*n/2) cycles 1,0,-1,0 and cos(pi*n) is (-1)^n, so every
    sample is an integer and the rFFT is closed-form:
    |X[0]| = N*|c0|, |X[N/4]| = N*c1/2, |X[N/2]| = N*c2 (all other
    bins exactly zero — integer periods, no leakage). Parameters:

        rate = 8000 + (doc_id % 8) * 1000      N = 64 + 16*(doc_id % 4)
        c0 = (doc_id % 41) - 20
        half_c1 = 60 + doc_id % 40,  c2 = 10 + doc_id % 35   (even ids)
        half_c1 = 10 + doc_id % 35,  c2 = 60 + doc_id % 40   (odd ids)

    The even/odd swap moves the spectral peak between rate/4 and
    rate/2 so peak_hz is non-degenerate; the two amplitude ranges
    never overlap (10..44 vs 60..99), so argmax is never a tie.
    mean(x^2) = c0^2 + 2*half_c1^2 + c2^2 exactly (the cross terms
    cancel over whole periods and N divides the integer sum), so
    ``rms`` is IEEE-exact on both engines."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 64 + 16 * (doc_id % 4)
    c0 = (doc_id % 41) - 20
    a, b = 60 + doc_id % 40, 10 + doc_id % 35
    half_c1, c2 = (a, b) if doc_id % 2 == 0 else (b, a)
    q4 = (1, 0, -1, 0)
    data = b"".join(
        struct.pack(
            "<h", c0 + 2 * half_c1 * q4[i % 4] + c2 * (1 if i % 2 == 0 else -1)
        )
        for i in range(n)
    )
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def attach_tone_payload(docs: DataFrame) -> DataFrame:
    """Tone-clip ingest stand-in: every audio-modality row
    (doc_id % 3 == 1, same round-robin as ``attach_binary_payload``)
    carries a synthesized test tone."""

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_tone_wav(int(d)) for d in doc_id], dtype=object
        )

    from .multimodal import spread_for_python

    return spread_for_python(
        docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    ).select("doc_id", _payload(F.col("doc_id")).alias("payload"))


def extract_spectral_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode + rFFT per clip; map-only stage (no
    shuffle), one pandas frame per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = wav_pcm_samples(bytes(payload))
                if parsed is None:
                    rows.append(
                        {
                            "doc_id": int(d), "sample_rate": 0,
                            "n_samples": 0, "rms": 0.0, "peak_hz": 0.0,
                            "centroid_hz": 0.0, "hf_power_ratio": 0.0,
                            "dc_level": 0.0,
                        }
                    )
                    continue
                rate, x = parsed
                feats = clip_spectral_features(rate, x)
                rows.append(
                    {
                        "doc_id": int(d),
                        "sample_rate": rate,
                        "n_samples": int(x.size),
                        **feats,
                    }
                )
            yield pd.DataFrame(rows)

    return with_payload.mapInPandas(run, schema=SPECTRAL_SCHEMA)


# --------------------------------------------------------------------------
# energy-based segmentation (VAD-style)
# --------------------------------------------------------------------------

FRAME_LEN = 16  # samples per analysis frame

FRAME_SCHEMA = "doc_id long, frame_idx int, energy double"


def synth_burst_wav(doc_id: int) -> bytes:
    """16-bit mono PCM WAV of alternating silence/tone blocks with
    closed-form segment structure:

        rate = 8000 + (doc_id % 4) * 1000
        n_blocks = 6 + doc_id % 5          (FRAME_LEN samples each)
        block b ACTIVE iff (doc_id * 37 + b) % 3 == 0
        active sample value A = 50 + doc_id % 50, silence = 0

    Per-frame energy (mean of x^2) is therefore EXACTLY A*A on active
    frames and 0 on silent ones, and the segment layout (runs of
    consecutive active blocks) is pure integer arithmetic an oracle
    can state."""
    rate = 8000 + (doc_id % 4) * 1000
    n_blocks = 6 + doc_id % 5
    amp = 50 + doc_id % 50
    data = b"".join(
        struct.pack("<h", amp if (doc_id * 37 + b) % 3 == 0 else 0)
        * FRAME_LEN
        for b in range(n_blocks)
    )
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def attach_burst_payload(docs: DataFrame) -> DataFrame:
    """Burst-clip ingest stand-in for the audio-modality rows."""

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_burst_wav(int(d)) for d in doc_id], dtype=object
        )

    from .multimodal import spread_for_python

    return spread_for_python(
        docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    ).select("doc_id", _payload(F.col("doc_id")).alias("payload"))


def frame_energies(with_payload: DataFrame) -> DataFrame:
    """Decode + frame + per-frame energy in one Arrow-batched map-only
    stage: one output row per FRAME_LEN-sample frame (tail remainder
    frames are dropped — fixed-length analysis frames)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "energy": []}
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                parsed = wav_pcm_samples(bytes(payload))
                if parsed is None:
                    continue
                _, x = parsed
                n_frames = x.size // FRAME_LEN
                if n_frames == 0:
                    continue
                frames = x[: n_frames * FRAME_LEN].reshape(
                    n_frames, FRAME_LEN
                )
                en = (frames**2).mean(axis=1)
                out["doc_id"].extend([int(d)] * n_frames)
                out["frame_idx"].extend(range(n_frames))
                out["energy"].extend(float(e) for e in en)
            yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


def energy_segments(
    frames: DataFrame, threshold: float = 1.0
) -> DataFrame:
    """Gaps-and-islands over the frame-energy stream: consecutive
    frames above the threshold collapse into segments. Pure window
    arithmetic (island key = frame_idx - dense run index), partitioned
    by clip — each clip's segmentation is independent, so the stage
    parallelizes per clip at any scale."""
    from pyspark.sql import Window

    active = frames.filter(F.col("energy") > threshold)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    islands = active.withColumn(
        "island", F.col("frame_idx") - F.row_number().over(w)
    )
    segs = islands.groupBy("doc_id", "island").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count("*").alias("n_frames"),
        F.round(F.avg("energy"), 4).alias("mean_energy"),
    )
    w2 = Window.partitionBy("doc_id").orderBy("start_frame")
    return segs.withColumn(
        "seg_id", F.row_number().over(w2).cast("int")
    ).drop("island")
