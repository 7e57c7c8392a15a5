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
from .store import BucketedParquetUpsertStore


def is_poison(stream: DataFrame) -> F.Column:
    """S3 dead-letter classification (the reference raises inside the
    operator and ships the failure to DEAD_LETTER_BOX,
    publish_state_job.py:88-104 / get_entity_job.py:60-82). Poison =
    missing payload (P4) or a sub-threshold error event (the rule is
    chosen so the channel is non-empty at every test scale)."""
    return F.col("props").isNull() | (
        (F.col("event_type") == "error") & (F.col("value") < 1.0)
    )


def dead_letter_rows(stream: DataFrame) -> DataFrame:
    """DeadLetterBox-shaped records (DeadLetterBoxMessage.py:12-18):
    the original notification plus job name and failure description.
    The reference's wall-clock ``timestamp`` is replaced by the event's
    own time so replays are deterministic."""
    # Int/string fields only in the serialized notification: float
    # rendering differs across engines, which would break the oracle
    # hash for no semantic gain.
    return stream.filter(is_poison(stream)).select(
        F.col("ts_ms").alias("timestamp_ms"),
        F.to_json(F.struct("event_id", "user_id", "event_type")).alias(
            "original_notification"
        ),
        F.lit("publish_state").alias("job"),
        F.when(F.col("props").isNull(), F.lit("missing payload"))
        .otherwise(F.lit("sub-threshold error value"))
        .alias("description"),
        F.col("event_id"),
    )


def entity_state_rows(stream: DataFrame) -> DataFrame:
    """The validated, doc-id-keyed projection (P4 + P12 + D9 collapse)."""
    return (
        # P4 envelope validation + poison split (the dead-letter side).
        stream.filter(~is_poison(stream))
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
) -> tuple[DataFrame, DataFrame]:
    """Run the bounded stream to completion.

    Returns ``(entity_state, dead_letters)`` — one input stream split
    into the success sink and the dead-letter side channel inside the
    same ``foreachBatch`` transaction scope (two filters over one batch,
    not a second consumer; the Spark shape of the reference's in-operator
    KafkaProducer side channel, S3).
    """
    staging = stage_events(
        spark, sf_dir, os.path.join(workdir, "staging_events"), n_files
    )
    # Entity state grows with #entities x #versions — the one store in
    # this repo that genuinely needs merges bounded by touched buckets
    # rather than store size.
    store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "entity_state"), key_cols=["doc_id"]
    )
    # Dead letters are append-only by unique event_id.
    dead_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "dead_letter_box"), key_cols=["event_id"]
    )

    def upsert(batch: DataFrame, batch_id: int) -> None:
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
        store.merge(collapsed, batch_id=batch_id)
        dead_store.merge(dead_letter_rows(batch), batch_id=batch_id, insert_only=True)

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
    dead = dead_store.current()
    if dead is None:
        dead = spark.createDataFrame(
            [],
            "timestamp_ms bigint, original_notification string, job string, "
            "description string, event_id bigint",
        )
    return final, dead
