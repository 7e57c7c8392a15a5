"""Streaming sources and sinks (SURVEY §2.1 S1/S2/S9/S10/S11).

The Kafka sink (S2, FlinkKafkaProducer, get_entity_job.py:121-123,
determine_change_job.py:472-474) maps to
``df.writeStream.format("kafka").option("topic", ...)`` with
``kafka.max.request.size`` for the reference's 14999999-byte cap; in
this container the staged-file stream plus ``ParquetUpsertStore`` plays
both broker and sink, and the debug ``data_stream.print()`` (S9, every
job, e.g. get_entity_job.py:119) is ``writeStream.format("console")`` —
both swap in without touching pipeline logic.

The reference consumes Kafka topics of JSON strings
(FlinkKafkaConsumer, get_entity_job.py:105-111). Here the pluggable
source is a file stream over parquet — the same DataFrame flows from
``spark.readStream.format("kafka")`` by swapping the reader, because all
downstream logic operates on typed columns, not on the transport.

``stage_events`` converts the driver's ``events`` table into a staging
directory of N parquet files ordered by event time, so a test can
replay it as N micro-batches (``maxFilesPerTrigger=1``) in
deterministic time order — the bounded stand-in for a time-ordered
Kafka partition. File modification times are set strictly increasing in
ts order because FileStreamSource discovers files oldest-first.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

# The transport schema: events.ts carried as epoch millis (bigint) so the
# staging files round-trip without nanosecond-parquet handling.
EVENT_STREAM_SCHEMA = (
    "event_id bigint, ts_ms bigint, user_id bigint, "
    "event_type string, value double, props string"
)


def stage_events(
    spark: SparkSession, sf_dir: str, staging_dir: str, n_files: int = 4
) -> str:
    """Write the events table as ``n_files`` ts-ordered parquet files.

    Idempotent: an already-staged directory is returned untouched — the
    staging dir models an immutable Kafka topic, so a restarted job must
    see the SAME files (re-staging would mint new file names that the
    checkpointed FileStreamSource would re-ingest as new data).
    """
    if os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
        return staging_dir
    events = load_table(spark, sf_dir, "events")
    (
        events.select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        # Range partitioning on ts puts each contiguous time slice in its
        # own part file, so part-00000 < part-00001 < ... in event time.
        .repartitionByRange(n_files, "ts_ms", "event_id")
        .write.mode("overwrite")
        .parquet(staging_dir)
    )
    parts = sorted(glob.glob(os.path.join(staging_dir, "part-*.parquet")))
    t0 = time.time() - len(parts) - 1
    for i, path in enumerate(parts):
        os.utime(path, (t0 + i, t0 + i))
    return staging_dir


def events_file_stream(
    spark: SparkSession, staging_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S1 stand-in: unbounded read of the staged event files."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        reader = reader.option("latestFirst", "false")
    return reader.parquet(staging_dir)


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Decode a Kafka-shaped frame (binary ``value`` column) into the
    event transport schema — the S1 parse path shared by the real
    connector and tests. One ``from_json`` per record replaces the
    reference's per-record ``json.loads`` + dataclass hydration
    (FlinkKafkaConsumer + SimpleStringSchema, get_entity_job.py:105-111).
    Malformed payloads parse to NULL structs and are filtered here —
    the upstream dead-letter split (S3) sees them as poison instead of
    killing the job."""
    return (
        raw.select(
            F.from_json(F.col("value").cast("string"), EVENT_STREAM_SCHEMA).alias(
                "e"
            )
        )
        # PERMISSIVE from_json renders garbage as an all-NULL struct, so
        # gate on the required key field rather than the struct itself.
        .filter(F.col("e").isNotNull() & F.col("e.event_id").isNotNull())
        .select("e.*")
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: the REAL Kafka source behind the same transport contract as
    ``events_file_stream`` — swapping one reader, as documented. Needs
    the ``spark-sql-kafka`` connector on the classpath (absent in this
    container; ``tests/test_kafka_swap_in.py`` gates on that)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_events(raw)


def kafka_events_writer(df: DataFrame, bootstrap_servers: str, topic: str):
    """S2: the Kafka sink — key by event id (per-key topic ordering,
    the property the stateful pipelines assume), JSON-encode the row,
    and carry the reference producer's 14999999-byte request cap
    (FlinkKafkaProducer ``max.request.size``, get_entity_job.py:121-123,
    determine_change_job.py:472-474). Returns the writer so callers
    attach their own checkpoint location."""
    payload = df.select(
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.max.request.size", "14999999")
    )
