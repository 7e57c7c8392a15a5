"""Streaming media-ingest catalog — the multimodal family's streaming
twin (SURVEY §2.6 requires the north-star families batch+stream
capable).

Media payloads arrive as a bounded binary stream (the stand-in for a
binaryFile-source watch over an object-store landing zone); each
micro-batch demuxes the CONTAINER layer (``demux_container``:
MP3/Ogg/MP4/WebM — duration, dims, frame counts, codec id) through the
same Arrow-batched ``mapInPandas`` kernel as the batch query and
upserts the per-document metadata into an insert-only catalog store.
Demux is a pure per-row function of the payload, so the final catalog
is batch-split invariant by construction and the batch demux query's
DuckDB oracle (``CONTAINER_DEMUX_SQL``) oracles the stream.

Scale: per batch the work is one Arrow pass over the batch's payloads
(the decode profile of ``multimodal_features``); the store merge
touches only the batch's buckets. A real deployment swaps the staged
files for ``cloudFiles``/``binaryFile`` streaming with the same sink.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_container_payload,
    extract_container_metadata,
)
from ..sources import load_table
from .store import BucketedParquetUpsertStore

MEDIA_STREAM_SCHEMA = "doc_id bigint, payload binary"


def stage_media(
    spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 4
) -> str:
    """Write the synthesized container payloads as ``n_files``
    doc_id-ranged parquet files with strictly increasing mtimes
    (idempotent — models the landing-zone feed)."""
    if os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
        return staging_dir
    docs = load_table(spark, sf_dir, "documents")
    (
        attach_container_payload(docs)
        .repartitionByRange(n_files, "doc_id")
        .write.mode("overwrite")
        .parquet(staging_dir)
    )
    parts = sorted(glob.glob(os.path.join(staging_dir, "part-*.parquet")))
    now = time.time()
    for i, p in enumerate(parts):
        os.utime(p, (now + i, now + i))
    return staging_dir


def run_stream_media_ingest(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Replay the bounded media stream; return the demuxed catalog —
    row-identical to the batch ``multimodal_container_demux`` query."""
    staging = stage_media(
        spark, sf_dir, os.path.join(workdir, "staging_media"), n_files
    )
    catalog = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "media_catalog"), key_cols=["doc_id"]
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        catalog.merge(
            extract_container_metadata(batch.select("doc_id", "payload")),
            batch_id=batch_id,
            insert_only=True,
        )

    reader = spark.readStream.schema(MEDIA_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        reader = reader.option("latestFirst", "false")
    query = (
        reader.parquet(staging)
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option(
            "checkpointLocation", os.path.join(workdir, "ckpt_media_ingest")
        )
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = catalog.current()
    assert final is not None
    return final.select(
        "doc_id",
        "container",
        "codec",
        "width",
        "height",
        "n_frames",
        "sample_rate",
        "n_samples",
        "duration_ms",
    )
