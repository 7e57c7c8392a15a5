"""Multimodal-column queries (north-star scope): binary payload +
metadata plumbing verified against byte-level SQL oracles.

The payload is the UTF-8 encoding of ``documents.text`` (ASCII in this
corpus, so DuckDB's ``strlen``/``ascii`` compute the same bytes the
Spark side sees), which keeps the mapInPandas decode path fully
oracle-checkable: text payloads take the deterministic byte-fake branch
(``codec='bytes'``), while real WAV/BMP/PPM payloads decode for real in
the same UDF (operators/multimodal.py, pinned by
tests/test_multimodal_codecs.py) and compressed formats stay at the
documented NotImplementedError seam.
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


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest -> Arrow-batched decode-stub feature extraction."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs)).orderBy("doc_id")


MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id,
       {_MODALITY_SQL} AS modality,
       'bytes' AS codec,
       strlen(text) AS n_bytes,
       ascii(substring(text, 1, 1)) AS first_byte,
       ascii(substring(text, length(text), 1)) AS last_byte,
       CASE WHEN {_MODALITY_SQL} = 'video'
            THEN CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS INT)
            ELSE 1 END AS n_frames,
       CAST(NULL AS INTEGER) AS width,
       CAST(NULL AS INTEGER) AS height,
       CAST(NULL AS INTEGER) AS sample_rate,
       CAST(NULL AS BIGINT) AS n_samples,
       CAST(NULL AS DOUBLE) AS mean_value
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
       sum(n_chars) AS total_declared_bytes
FROM documents
GROUP BY 1
ORDER BY modality
"""


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sampling": multimodal_frame_sampling,
    "multimodal_metadata_pruning": multimodal_metadata_pruning,
}

ORACLES = {
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frame_sampling": FRAME_SAMPLING_SQL,
    "multimodal_metadata_pruning": METADATA_PRUNING_SQL,
}
