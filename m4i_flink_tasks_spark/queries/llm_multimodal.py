"""Multimodal-column queries (north-star scope): binary payload +
metadata plumbing verified against byte-level SQL oracles.

Most payloads are the UTF-8 encoding of ``documents.text`` (ASCII in
this corpus, so DuckDB's ``strlen``/``ascii`` compute the same bytes
the Spark side sees) and take the deterministic byte-fake branch
(``codec='bytes'``). A deterministic slice of rows (doc_id % 15 in
(0, 1, 3, 6, 9, 12)) carries REAL synthesized JPEG/WAV/BMP/PPM/PNG/GIF
payloads whose decoded sample-rate/dims/frames/mean are closed forms
of doc_id — PNG rows go through actual zlib inflate + scanline
defilter, GIF rows through the real LZW decoder (animated: n_frames is
the true animation length), JPEG rows through the full baseline
pipeline (Huffman entropy decode + IDCT; DC-only constant images with
an all-ones quant table make the round-trip EXACT), and all file SIZES
are closed forms because the synth encoders emit fixed-layout streams
(STORED deflate blocks; fixed-width LZW literals; fixed-bit-count JPEG
blocks provably free of byte stuffing) — so the driver hash covers the
real decoders (operators/multimodal.py + operators/jpeg.py, also
pinned by tests against real-world GIF/JPEG files), and only
library-requiring formats (MP3/OGG/MP4) remain at the documented
NotImplementedError seam.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    FRAME_BYTES,
    attach_binary_payload,
    extract_features,
    sample_video_frames,
)
from ..sources import load_table

_MODALITY_SQL = """CASE doc_id % 3 WHEN 0 THEN 'image'
                       WHEN 1 THEN 'audio' ELSE 'video' END"""

# synth_gif's pixel count n = w*h with w = 2 + doc_id%4, h = 2 + doc_id%2
_GIF_N = "((2 + doc_id % 4) * (2 + doc_id % 2))"


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest -> Arrow-batched decode-stub feature extraction."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs)).orderBy("doc_id")


# Rows with doc_id % 15 in (0, 1, 3, 6, 9, 12) carry REAL synthesized media
# (synth_wav/synth_bmp/synth_ppm/synth_png in operators/multimodal.py);
# their decoded outputs are closed forms of doc_id because every
# sample/pixel is a constant, so the oracle verifies the REAL decoder
# output. The PNG n_bytes closed form 68 + h*(1+3w) holds because the
# synth encoder emits zlib STORED blocks (raw + 11 bytes); first byte
# is the PNG magic 0x89 = 137 and the last is the IEND CRC tail
# 0x82 = 130.
MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id,
       {_MODALITY_SQL} AS modality,
       CASE doc_id % 15 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'wav'
            WHEN 3 THEN 'bmp' WHEN 4 THEN 'wav'
            WHEN 6 THEN 'ppm' WHEN 9 THEN 'png' WHEN 12 THEN 'gif'
            ELSE 'bytes' END AS codec,
       CASE doc_id % 15
            WHEN 0 THEN CASE WHEN doc_id % 30 = 0
                 THEN 171
                      + (7 + 4 * (((1 + doc_id % 3) * (1 + doc_id % 2)) - 1) + 7) // 8
                      + 2 * ((((1 + doc_id % 3) * (1 + doc_id % 2)) + 7) // 8)
                 ELSE 151 + (9 + 5 * (((1 + doc_id % 3) * (1 + doc_id % 2)) - 1) + 7) // 8
                 END
            WHEN 1 THEN 44 + 2 * (64 + doc_id % 32)
            WHEN 4 THEN 60 + 12 * (1 + doc_id % 2)
            WHEN 3 THEN 54 + (4 + 4 * (doc_id % 2)) * 3 * (3 + doc_id % 5)
            WHEN 6 THEN 11 + (3 + doc_id % 5) * (2 + doc_id % 4) * 3
            WHEN 9 THEN 68 + (2 + doc_id % 3) * (1 + 3 * (2 + doc_id % 4))
            WHEN 12 THEN 20 + (1 + (doc_id // 15) % 3)
                 * (13 + (3 * ({_GIF_N} + {_GIF_N} // 2 + 2) + 7) // 8)
            ELSE strlen(text) END AS n_bytes,
       CASE doc_id % 15 WHEN 0 THEN 255
            WHEN 1 THEN 82 WHEN 3 THEN 66 WHEN 4 THEN 82 WHEN 6 THEN 80
            WHEN 9 THEN 137 WHEN 12 THEN 71
            ELSE ascii(substring(text, 1, 1)) END AS first_byte,
       CASE doc_id % 15
            WHEN 0 THEN 217
            WHEN 1 THEN CASE WHEN (doc_id % 100) - 50 >= 0 THEN 0 ELSE 255 END
            WHEN 3 THEN doc_id % 256
            WHEN 4 THEN 0
            WHEN 6 THEN (doc_id * 7) % 256
            WHEN 9 THEN 130
            WHEN 12 THEN 59
            ELSE ascii(substring(text, length(text), 1)) END AS last_byte,
       CASE WHEN doc_id % 15 = 12
            THEN CAST(1 + (doc_id // 15) % 3 AS INT)
            WHEN {_MODALITY_SQL} = 'video'
            THEN CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS INT)
            ELSE 1 END AS n_frames,
       CAST(CASE doc_id % 15 WHEN 0 THEN (8 * (1 + doc_id % 3))
            WHEN 3 THEN 4 + 4 * (doc_id % 2)
            WHEN 6 THEN 3 + doc_id % 5
            WHEN 9 THEN 2 + doc_id % 4
            WHEN 12 THEN 2 + doc_id % 4 END AS INTEGER) AS width,
       CAST(CASE doc_id % 15 WHEN 0 THEN (8 * (1 + doc_id % 2))
            WHEN 3 THEN 3 + doc_id % 5
            WHEN 6 THEN 2 + doc_id % 4
            WHEN 9 THEN 2 + doc_id % 3
            WHEN 12 THEN 2 + doc_id % 2 END AS INTEGER) AS height,
       CAST(CASE doc_id % 15 WHEN 1 THEN 8000 + (doc_id % 8) * 1000
            WHEN 4 THEN 8000 + (doc_id % 6) * 1000
            END AS INTEGER) AS sample_rate,
       CAST(CASE doc_id % 15 WHEN 1 THEN 64 + doc_id % 32
            WHEN 4 THEN 17 * (1 + doc_id % 2)
            END AS BIGINT) AS n_samples,
       CAST(CASE doc_id % 15 WHEN 0 THEN 129 - 2 * (doc_id % 2)
            WHEN 1 THEN abs((doc_id % 100) - 50)
            WHEN 4 THEN abs(((doc_id * 3) % 100) - 50)
            WHEN 3 THEN doc_id % 256
            WHEN 6 THEN (doc_id * 7) % 256
            WHEN 9 THEN (doc_id * 11) % 256
            WHEN 12 THEN ((({_GIF_N} + 1) // 2) * ((doc_id * 13) % 256)
                 + ({_GIF_N} // 2) * (((doc_id * 13) % 256 + 7) % 256))
                 / {_GIF_N}::DOUBLE
            END AS DOUBLE) AS mean_value
FROM documents
ORDER BY doc_id
"""


def multimodal_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: every 2nd fixed-size chunk per video doc."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_video_frames(attach_binary_payload(docs), every_nth=2).orderBy(
        "doc_id", "frame_idx"
    )


FRAME_SAMPLING_SQL = f"""
WITH videos AS (
    SELECT doc_id, strlen(text) AS n_bytes,
           CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS INT) AS n_frames
    FROM documents
    WHERE doc_id % 3 = 2
), frames AS (
    SELECT doc_id, unnest(range(n_frames)) AS frame_idx, n_bytes
    FROM videos
)
SELECT doc_id,
       frame_idx,
       least({FRAME_BYTES}, n_bytes - frame_idx * {FRAME_BYTES}) AS frame_bytes
FROM frames
WHERE frame_idx % 2 = 0
ORDER BY doc_id, frame_idx
"""


def multimodal_metadata_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan: per-modality byte totals WITHOUT touching the
    payload column — the projection a columnar store answers from
    metadata alone (column pruning keeps the binary out of the scan)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = attach_binary_payload(docs)
    return (
        payload.groupBy(F.col("media.modality").alias("modality"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("media.declared_size").alias("total_declared_bytes"),
        )
        .orderBy("modality")
    )


METADATA_PRUNING_SQL = f"""
SELECT {_MODALITY_SQL} AS modality,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_declared_bytes
FROM documents
GROUP BY 1
ORDER BY modality
"""



def media_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal selection gate a training pipeline runs AFTER
    decode: per-modality thresholds over the decoded features (images:
    real codec + minimum pixel count + non-degenerate mean; audio: real
    codec + minimum duration; video stand-ins: minimum frame count),
    emitted as flags + keep so the decode plumbing and the gate prove
    out together in one dataflow."""
    feats = multimodal_features(spark, sf_dir)
    is_image_ok = (
        (F.col("modality") == "image")
        & F.col("codec").isin("bmp", "ppm", "png", "gif", "jpeg")
        & (F.col("width") * F.col("height") >= 6)
        & F.col("mean_value").between(1, 254)
    )
    is_audio_ok = (
        (F.col("modality") == "audio")
        & (F.col("codec") == "wav")
        & (F.col("n_samples") >= 16)
    )
    is_video_ok = (F.col("modality") == "video") & (F.col("n_frames") >= 1)
    keep = is_image_ok | is_audio_ok | is_video_ok
    return feats.select(
        "doc_id",
        "modality",
        "codec",
        keep.alias("keep"),
        F.when(keep, None)
        .when(F.col("codec") == "bytes", "undecodable")
        .otherwise("below_threshold")
        .alias("drop_reason"),
    ).orderBy("doc_id")


MEDIA_QUALITY_SQL = f"""
WITH feats AS ({{features}})
SELECT doc_id, modality, codec,
       keep,
       CASE WHEN keep THEN NULL
            WHEN codec = 'bytes' THEN 'undecodable'
            ELSE 'below_threshold' END AS drop_reason
FROM (
    SELECT *,
           (modality = 'image'
            AND codec IN ('bmp', 'ppm', 'png', 'gif', 'jpeg')
            AND width * height >= 6
            AND mean_value BETWEEN 1 AND 254)
           OR (modality = 'audio' AND codec = 'wav' AND n_samples >= 16)
           OR (modality = 'video' AND n_frames >= 1) AS keep
    FROM feats
)
ORDER BY doc_id
""".format(features=MULTIMODAL_FEATURES_SQL.replace("ORDER BY doc_id", ""))


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sampling": multimodal_frame_sampling,
    "multimodal_metadata_pruning": multimodal_metadata_pruning,
    "media_quality_filter": media_quality_filter,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frame_sampling": FRAME_SAMPLING_SQL,
    "multimodal_metadata_pruning": METADATA_PRUNING_SQL,
    "media_quality_filter": MEDIA_QUALITY_SQL,
}


def multimodal_container_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container demux over compressed media payloads (MP3 / Ogg / MP4 /
    WebM) — the metadata layer of the codec seam, parsed for REAL: MPEG
    frame-header walk, Ogg page walk + Vorbis ident packet, ISO-BMFF
    box-tree walk, Matroska EBML element walk. Spark PARSES the synthesized bytes to recover
    duration/dims/frame counts; the oracle states the same facts as
    closed forms of doc_id, so any demux bug breaks the hash. The inner
    sample/pixel decode (the part that genuinely needs codec libraries)
    stays behind the documented seam. Reference scope: the reference
    has no binary surface (SURVEY §2.6); this is north-star plumbing
    for 100 TB media curation, where selection runs on container facts
    long before anything is decoded."""
    from ..operators.multimodal import (
        attach_container_payload,
        extract_container_metadata,
    )

    docs = load_table(spark, sf_dir, "documents")
    return extract_container_metadata(attach_container_payload(docs)).orderBy(
        "doc_id"
    )


CONTAINER_DEMUX_SQL = """
SELECT doc_id,
  CASE doc_id % 4 WHEN 0 THEN 'mp4' WHEN 1 THEN 'mp3'
                  WHEN 2 THEN 'ogg' ELSE 'webm' END AS container,
  CASE doc_id % 4
    WHEN 0 THEN 'mp4:avc1'
    WHEN 1 THEN 'mpeg1-layer3'
    WHEN 2 THEN 'vorbis-' || CAST(1 + (doc_id // 2) % 2 AS VARCHAR) || 'ch'
    ELSE 'webm:V_VP9'
  END AS codec,
  CAST(CASE doc_id % 4
    WHEN 0 THEN 16 * (1 + (doc_id // 3) % 4)
    WHEN 3 THEN 32 * (1 + (doc_id // 3) % 4)
  END AS INT) AS width,
  CAST(CASE doc_id % 4
    WHEN 0 THEN 16 * (1 + (doc_id // 5) % 3)
    WHEN 3 THEN 32 * (1 + (doc_id // 5) % 3)
  END AS INT) AS height,
  CAST(CASE doc_id % 4
    WHEN 0 THEN 3 + (doc_id // 2) % 5
    WHEN 1 THEN 4 + (doc_id // 2) % 6
    WHEN 2 THEN 2
  END AS INT) AS n_frames,
  CAST(CASE doc_id % 4
    WHEN 1 THEN 44100
    WHEN 2 THEN CASE WHEN doc_id % 2 = 0 THEN 22050 ELSE 44100 END
  END AS INT) AS sample_rate,
  CAST(CASE doc_id % 4
    WHEN 1 THEN (4 + (doc_id // 2) % 6) * 1152
    WHEN 2 THEN 1000 + 17 * ((doc_id // 4) % 50)
  END AS BIGINT) AS n_samples,
  CAST(CASE doc_id % 4
    WHEN 0 THEN (3 + (doc_id // 2) % 5) * 40
    WHEN 1 THEN ((4 + (doc_id // 2) % 6) * 1152 * 1000) // 44100
    WHEN 2 THEN ((1000 + 17 * ((doc_id // 4) % 50)) * 1000)
         // (CASE WHEN doc_id % 2 = 0 THEN 22050 ELSE 44100 END)
    ELSE 200 + 8 * ((doc_id // 2) % 40)
  END AS BIGINT) AS duration_ms
FROM documents
ORDER BY doc_id
"""

QUERIES["multimodal_container_demux"] = multimodal_container_demux
ORACLES["multimodal_container_demux"] = CONTAINER_DEMUX_SQL


def container_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection gate over CONTAINER facts — the filter a 100 TB media
    pipeline runs before any sample/pixel decode: audio (mp3/ogg) must
    be >= 150 ms at >= 22.05 kHz, video (mp4/webm) must clear a pixel
    floor and a 200 ms duration floor. Runs on the demuxed metadata
    only; the payload bytes are never decoded past the header/box walk,
    which is exactly why this scales (map-only over the binary column,
    no shuffle until the downstream aggregate)."""
    demuxed = multimodal_container_demux(spark, sf_dir)
    is_audio_ok = F.col("container").isin("mp3", "ogg") & (
        (F.col("duration_ms") >= 150) & (F.col("sample_rate") >= 22050)
    )
    is_video_ok = F.col("container").isin("mp4", "webm") & (
        (F.col("width") * F.col("height") >= 512) & (F.col("duration_ms") >= 200)
    )
    keep = is_audio_ok | is_video_ok
    return demuxed.select(
        "doc_id",
        "container",
        "codec",
        "duration_ms",
        keep.alias("keep"),
        F.when(keep, None)
        .when(F.col("container").isin("mp3", "ogg"), "audio_below_threshold")
        .otherwise("video_below_threshold")
        .alias("drop_reason"),
    ).orderBy("doc_id")


CONTAINER_QUALITY_SQL = f"""
WITH demuxed AS ({CONTAINER_DEMUX_SQL.replace("ORDER BY doc_id", "")})
SELECT doc_id, container, codec, duration_ms,
       keep,
       CASE WHEN keep THEN NULL
            WHEN container IN ('mp3', 'ogg') THEN 'audio_below_threshold'
            ELSE 'video_below_threshold' END AS drop_reason
FROM (
    SELECT *,
           (container IN ('mp3', 'ogg')
            AND duration_ms >= 150 AND sample_rate >= 22050)
           OR (container IN ('mp4', 'webm')
               AND width * height >= 512 AND duration_ms >= 200) AS keep
    FROM demuxed
)
ORDER BY doc_id
"""

QUERIES["container_quality_filter"] = container_quality_filter
ORACLES["container_quality_filter"] = CONTAINER_QUALITY_SQL


def flac_stream_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lossless-audio inventory: parse the FLAC STREAMINFO metadata
    block (RFC 9639 — min/max blocksize, 20-bit sample rate, 3-bit
    channel count, 5-bit bit depth, 36-bit total-sample count) over a
    synthesized ``fLaC`` payload per document. The metadata-block walk
    is real (multi-block chain, last-flag termination, trailing audio
    frames untouched); only the inner frame decode stays behind the
    codec seam. Scale shape: map-only over the binary column — at
    100 TB this is the scan that builds the audio-curation inventory
    before any sample is decoded. Reference scope: no binary surface
    (SURVEY §2.6); north-star multimodal plumbing."""
    from ..operators.multimodal import (
        attach_flac_payload,
        extract_container_metadata,
    )

    docs = load_table(spark, sf_dir, "documents")
    demuxed = extract_container_metadata(attach_flac_payload(docs))
    return demuxed.select(
        "doc_id",
        "container",
        "codec",
        "sample_rate",
        "n_samples",
        "duration_ms",
    ).orderBy("doc_id")


FLAC_STREAM_INFO_SQL = """
SELECT doc_id,
  'flac' AS container,
  'flac-' || CAST(CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 24 END AS VARCHAR)
    || 'b-' || CAST(1 + (doc_id // 3) % 2 AS VARCHAR) || 'ch' AS codec,
  CAST(CASE doc_id % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
       ELSE 48000 END AS INT) AS sample_rate,
  CAST(800 + 13 * ((doc_id // 2) % 64) AS BIGINT) AS n_samples,
  CAST((800 + 13 * ((doc_id // 2) % 64)) * 1000
       // (CASE doc_id % 3 WHEN 0 THEN 32000 WHEN 1 THEN 44100
           ELSE 48000 END) AS BIGINT) AS duration_ms
FROM documents
ORDER BY doc_id
"""

QUERIES["flac_stream_info"] = flac_stream_info
ORACLES["flac_stream_info"] = FLAC_STREAM_INFO_SQL


def audio_spectral_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip-level spectral features over binary audio payloads: WAV
    decode + full-clip rFFT in one Arrow-batched map-only stage
    (``operators/audio.py``). The synthesized tones put all energy at
    DFT bins {0, N/4, N/2} with exact integer samples, so the REAL FFT
    output is a closed form of doc_id the oracle states directly —
    peak/centroid move with doc_id parity, so nothing is degenerate.
    North-star scope (audio curation); the reference has no audio
    surface."""
    from ..operators.audio import attach_tone_payload, extract_spectral_features

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_spectral_features(attach_tone_payload(docs))
    return feats.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        F.round("peak_hz", 4).alias("peak_hz"),
        F.round("centroid_hz", 4).alias("centroid_hz"),
        F.round("hf_power_ratio", 6).alias("hf_power_ratio"),
        F.round("dc_level", 6).alias("dc_level"),
    ).orderBy("doc_id")


# Closed forms (see synth_tone_wav): with h4 = |X[N/4]|/N and
# c2 = |X[N/2]|/N,
#   rms         = sqrt(c0^2 + 2*h4^2 + c2^2)       (exact — integer mean)
#   peak_hz     = rate/4 if h4 > c2 else rate/2    (ranges never tie)
#   centroid_hz = (rate/4*h4 + rate/2*c2)/(h4+c2)  (DC excluded)
#   hf_ratio    = c2^2/(h4^2 + c2^2)               (power above rate/4)
AUDIO_SPECTRAL_SQL = """
WITH p AS (
  SELECT doc_id,
         8000 + (doc_id % 8) * 1000 AS rate,
         64 + 16 * (doc_id % 4) AS n,
         (doc_id % 41) - 20 AS c0,
         CASE WHEN doc_id % 2 = 0 THEN 60 + doc_id % 40
              ELSE 10 + doc_id % 35 END AS h4,
         CASE WHEN doc_id % 2 = 0 THEN 10 + doc_id % 35
              ELSE 60 + doc_id % 40 END AS c2
  FROM documents
  WHERE doc_id % 3 = 1
)
SELECT doc_id,
       CAST(rate AS INT) AS sample_rate,
       CAST(n AS INT) AS n_samples,
       round(sqrt(1.0*c0*c0 + 2.0*h4*h4 + 1.0*c2*c2), 6) AS rms,
       round(CASE WHEN h4 > c2 THEN rate/4.0 ELSE rate/2.0 END, 4) AS peak_hz,
       round((rate/4.0*h4 + rate/2.0*c2) / (h4 + c2), 4) AS centroid_hz,
       round(1.0*c2*c2 / (1.0*h4*h4 + 1.0*c2*c2), 6) AS hf_power_ratio,
       round(abs(1.0*c0), 6) AS dc_level
FROM p
ORDER BY doc_id
"""

QUERIES["audio_spectral_profile"] = audio_spectral_profile
ORACLES["audio_spectral_profile"] = AUDIO_SPECTRAL_SQL


def audio_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style audio segmentation: Arrow-batched decode + per-frame
    energy (operators/audio.py), then gaps-and-islands window
    arithmetic collapses consecutive above-threshold frames into
    segments (start/end/frames/duration/mean energy). The burst synth
    makes frame activity a closed form of doc_id — active frames carry
    energy EXACTLY A^2 — so the oracle replays the same gaps-and-
    islands over the stated activity sequence. Two-stage shape: Arrow
    map for decode, per-clip window for islands (each clip independent,
    so the stage parallelizes per clip at any scale)."""
    from ..operators.audio import (
        FRAME_LEN,
        attach_burst_payload,
        energy_segments,
        frame_energies,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = frame_energies(attach_burst_payload(docs))
    segs = energy_segments(frames)
    rate = 8000 + (F.col("doc_id") % 4) * 1000
    return segs.select(
        "doc_id",
        "seg_id",
        "start_frame",
        "end_frame",
        "n_frames",
        F.round(
            F.col("n_frames") * FRAME_LEN * 1000 / rate, 4
        ).alias("duration_ms"),
        "mean_energy",
    ).orderBy("doc_id", "seg_id")


AUDIO_SEGMENTS_SQL = """
WITH aud AS (
    SELECT doc_id,
           8000 + (doc_id % 4) * 1000 AS rate,
           6 + doc_id % 5 AS n_blocks,
           50 + doc_id % 50 AS amp
    FROM documents WHERE doc_id % 3 = 1
),
blocks AS (
    SELECT doc_id, rate, amp, b.b AS frame_idx
    FROM aud CROSS JOIN range(10) b(b)
    WHERE b.b < n_blocks AND (doc_id * 37 + b.b) % 3 = 0
),
islands AS (
    SELECT doc_id, rate, amp, frame_idx,
           frame_idx - row_number() OVER (PARTITION BY doc_id
                                          ORDER BY frame_idx) AS island
    FROM blocks
),
segs AS (
    SELECT doc_id, rate, amp, island,
           min(frame_idx) AS start_frame,
           max(frame_idx) AS end_frame,
           count(*) AS n_frames
    FROM islands
    GROUP BY doc_id, rate, amp, island
)
SELECT doc_id,
       row_number() OVER (PARTITION BY doc_id ORDER BY start_frame)::INT
           AS seg_id,
       start_frame::INT AS start_frame,
       end_frame::INT AS end_frame,
       n_frames,
       round(n_frames * 16 * 1000 / rate::DOUBLE, 4) AS duration_ms,
       round((amp * amp)::DOUBLE, 4) AS mean_energy
FROM segs
ORDER BY doc_id, seg_id
"""

QUERIES["audio_energy_segments"] = audio_energy_segments
ORACLES["audio_energy_segments"] = AUDIO_SEGMENTS_SQL
