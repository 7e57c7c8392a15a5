"""Streaming SCD2: incremental type-2 dimension maintenance.

The streaming form of ``queries/warehouse.py``'s ``scd2_user_status``:
events arrive in time-ordered micro-batches and each batch extends the
per-user status history in place — close the open row when the status
changed, append the new change row, renumber versions. State is kept
as the dimension ROWS themselves in the bucketed store keyed by
user_id, so the merge touches only the buckets holding users present
in the batch.

Maintenance strategy: for touched buckets the combine re-derives the
affected users' histories from (stored change points ∪ new batch
change points) with the same lag/lead/row_number expressions the batch
query proves. Stored rows are themselves collapsed change points, and
ingest is time-ordered (staged topic replay), so re-collapsing change
points plus strictly-later events is exactly equivalent to collapsing
the full raw history — the equality test against the one-shot batch
query pins that. Cost per batch: touched buckets' rows + the batch,
never the store; the 100 TB swap-in is the identical expressions in a
Delta MERGE over the dimension's key-bucketed layout.

Out-of-order arrivals are NOT handled here by design — a late event
older than a user's last change point would need the batch query's
full-history rebuild for that user (the usual warehouse backfill), not
an incremental extend. Documented deviation, matching the topic's
per-key ordering guarantee the reference pipelines also assume
(get_entity_job.py:121-123 keys its producer for exactly this).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sources import events_file_stream, stage_events
from .store import BucketedParquetUpsertStore


def _rebuild(rows: DataFrame) -> DataFrame:
    """Collapse + interval + version over change-point rows
    (user_id, status, valid_from_ms, event_id) — identical expressions
    to the batch SCD2 build. Idempotent on already-collapsed points."""
    w = Window.partitionBy("user_id").orderBy("valid_from_ms", "event_id")
    changes = rows.withColumn("prev", F.lag("status").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("status"))
    )
    return changes.select(
        "user_id",
        "status",
        "valid_from_ms",
        "event_id",
        F.lead("valid_from_ms").over(w).alias("valid_to_ms"),
        F.row_number().over(w).alias("version"),
    )


def scd2_batch(store: BucketedParquetUpsertStore, batch: DataFrame, batch_id: int) -> None:
    """Extend the dimension with one micro-batch of events."""
    points = batch.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.col("ts_ms").alias("valid_from_ms"),
        "event_id",
    )
    def combine(cur: DataFrame, b: DataFrame) -> DataFrame:
        old_points = cur.select(
            "user_id", "status", "valid_from_ms", "event_id"
        )
        new_points = b.select(
            "user_id", "status", "valid_from_ms", "event_id"
        )
        return _rebuild(old_points.unionByName(new_points))

    # collapse within the batch first, so the no-state first merge
    # already writes valid SCD2 rows; the combine re-derives touched
    # buckets from (stored points ∪ batch points)
    store.merge(_rebuild(points), combine=combine, batch_id=batch_id)


def run_stream_scd2(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Replay the bounded event stream; return the maintained SCD2
    dimension (same columns as the batch query)."""
    staging = stage_events(
        spark, sf_dir, os.path.join(workdir, "staging_events"), n_files
    )
    store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "scd2_state"),
        key_cols=["user_id"],
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        scd2_batch(store, batch, batch_id)

    query = (
        events_file_stream(spark, staging, max_files_per_trigger)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = store.current()
    assert final is not None
    return final.select(
        "user_id", "status", "valid_from_ms", "valid_to_ms", "version"
    )
