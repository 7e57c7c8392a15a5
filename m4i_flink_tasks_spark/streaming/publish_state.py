"""Job 2 — publish_state as a Structured Streaming pipeline.

Reference: ``PublishState(MapFunction)`` (scripts/publish_state_job.py:49-104)
reads the enriched-entity Kafka topic, validates the envelope
(publish_state_job.py:56-69), synthesizes ``doc_id = f"{guid}_{updateTime}"``
(:77) and upserts the full entity JSON into an append-only versioned
Elasticsearch index (:77-84), one record at a time with parallelism 1.

Spark-first re-expression over the driver's ``events`` table (the
entity-version stream stand-in — ``user_id`` plays the guid, ``ts`` the
updateTime, ``props`` the attribute payload):

- transport: bounded file stream replayed in event-time order
  (``streaming.sources``); swapping in ``format("kafka")`` changes only
  the reader, every transform below is on typed columns;
- validation (P4) and doc-id synthesis (P12) are codegen'd column
  expressions applied to whole micro-batches, not per-record Python;
- the sink is one idempotent keyed merge per micro-batch
  (``ParquetUpsertStore``, Delta-MERGE contract) instead of a per-record
  HTTP index call — re-delivery of a batch converges to the same store,
  which is the reference's idempotency argument (doc id = guid+time) made
  transactional.

Versions that share ``(guid, update_time)`` collapse to the highest
event_id — deterministic last-writer-wins, where the reference would
nondeterministically overwrite the same ES doc id.

Scale: stateless map + keyed merge; parallelism is bounded only by the
source partition count, and the merge shuffles one micro-batch (not the
stream history) by key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sources import events_file_stream, stage_events
from .store import ParquetUpsertStore


def entity_state_rows(stream: DataFrame) -> DataFrame:
    """The validated, doc-id-keyed projection (P4 + P12 + D9 collapse)."""
    return (
        # P4 envelope validation: drop records missing the payload.
        stream.filter(F.col("props").isNotNull())
        # P12 doc-id synthesis (publish_state_job.py:77).
        .select(
            F.concat_ws("_", F.col("user_id"), F.col("ts_ms")).alias("doc_id"),
            F.col("user_id").alias("guid"),
            F.col("ts_ms").alias("update_time_ms"),
            F.col("event_id"),
            F.col("event_type"),
            F.round("value", 6).alias("value"),
            F.col("props"),
        )
    )


def run_publish_state(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Run the bounded stream to completion; return the final state table."""
    staging = stage_events(
        spark, sf_dir, os.path.join(workdir, "staging_events"), n_files
    )
    store = ParquetUpsertStore(
        spark, os.path.join(workdir, "entity_state"), key_cols=["doc_id"]
    )

    def upsert(batch: DataFrame, _batch_id: int) -> None:
        # D9 collapse inside the batch: one row per doc_id (highest
        # event_id wins) so the merge is deterministic under re-runs.
        collapsed = (
            entity_state_rows(batch)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy(F.desc("event_id"))
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        store.merge(collapsed)

    query = (
        events_file_stream(spark, staging, max_files_per_trigger)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_publish_state"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = store.current()
    assert final is not None
    return final
