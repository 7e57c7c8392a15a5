"""Job 1 — get_entity (enrichment) as a stream-static join pipeline.

Reference: ``GetEntity(MapFunction)`` (scripts/get_entity_job.py:27-82)
makes one synchronous Keycloak + Atlas REST round-trip **per record**
(:37-43, cache explicitly disabled :42) to attach the full entity to
each audit notification, emitting the ``{"kafka_notification":…,
"atlas_entity":…}`` envelope (:54); failures go to the dead-letter
topic (:60-82).

Spark-first re-expression: the entity source is a **static snapshot
table joined at scan time** — the per-record RPC becomes a broadcast
hash join against the dimension, so enrichment throughput scales with
partitions instead of REST latency. When a live service is truly
required, ``rest_enrichment.enrich_events_live`` is the implemented
pluggable alternative: the same output contract via ``mapInPandas``
with batched HTTP — one token fetch + one de-duplicated bulk gather
per Arrow batch, never per record (contract pinned hermetically by
tests/test_rest_enrichment.py against an in-process HTTP server,
including byte-identical envelopes vs this join).

- P3 operation-type filter (get_entity_job.py:40) prunes before the join;
- unmatched notifications (entity unknown) divert to the dead-letter
  channel instead of raising (S3);
- the enriched envelope is ``to_json(struct(...))`` — one plan-native
  serialization (P15) replacing the reference's repeated
  parse/serialize round-trips.

The customer table plays the entity snapshot (``user_id`` = guid).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .sources import events_file_stream, stage_events
from .store import BucketedParquetUpsertStore

# The op-type domain the reference accepts (EntityAuditAction,
# get_entity_job.py:40), mapped onto the event-type vocabulary.
ACCEPTED_OPS = ("signup", "purchase", "error")


def enrich_events(stream: DataFrame, entities: DataFrame) -> DataFrame:
    """P3 filter -> broadcast enrichment join -> enveloped output."""
    dim = F.broadcast(
        entities.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("entity_name"),
            F.col("c_nationkey").alias("entity_nation"),
        )
    )
    filtered = stream.filter(F.col("event_type").isin(*ACCEPTED_OPS))
    joined = filtered.join(dim, "user_id", "left")
    return joined.select(
        "event_id",
        "user_id",
        F.col("entity_name").isNotNull().alias("enriched"),
        F.to_json(
            F.struct(
                F.struct("event_id", "user_id", "event_type").alias(
                    "kafka_notification"
                ),
                F.struct("entity_name", "entity_nation").alias("atlas_entity"),
            )
        ).alias("envelope"),
    )


def run_get_entity(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> tuple[DataFrame, DataFrame]:
    """Run the bounded stream to completion.

    Returns ``(enriched, dead_letters)``: notifications whose entity was
    found, and the unmatched remainder (the reference's 404 path,
    get_entity_job.py:60-70).
    """
    staging = stage_events(
        spark, sf_dir, os.path.join(workdir, "staging_events"), n_files
    )
    entities = load_table(spark, sf_dir, "customer")
    # Both sinks are append-only by unique event_id -> O(batch)
    # segment appends regardless of how much state has accumulated.
    store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "enriched_entities"), key_cols=["event_id"]
    )
    dead_store = BucketedParquetUpsertStore(
        spark, os.path.join(workdir, "dead_letter_box"), key_cols=["event_id"]
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        out = enrich_events(batch, entities)
        store.merge(
            out.filter(F.col("enriched")).drop("enriched"),
            batch_id=batch_id,
            insert_only=True,
        )
        dead_store.merge(
            out.filter(~F.col("enriched")).select(
                "event_id",
                F.lit("get_entity").alias("job"),
                F.lit("entity not found").alias("description"),
            ),
            batch_id=batch_id,
            insert_only=True,
        )

    query = (
        events_file_stream(spark, staging, max_files_per_trigger)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_get_entity"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = store.current()
    assert final is not None
    dead = dead_store.current()
    if dead is None:
        dead = spark.createDataFrame(
            [], "event_id bigint, job string, description string"
        )
    return final, dead
