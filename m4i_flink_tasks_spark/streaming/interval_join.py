"""Watermarked stream-stream interval join.

The reference has no joins at all as user-facing operators (SURVEY
§2.6) — its correlations happen via store lookups. This is the
streaming-native correlation primitive Spark adds: two unbounded
streams joined on a key plus an event-time range (here: each signup
matched to that user's purchases within the following hour), with
watermarks on BOTH sides so the join state is provably droppable —
Spark derives the state retention from the watermark delta and the
interval bound, giving O(horizon) state instead of O(stream).

Both sides are separate readers of the same staged topic (a
stream-stream self-join), which is the reference's
one-topic-many-consumers shape. Inner join + append mode: matches emit
as soon as both sides arrive; the keyed store makes re-delivery
idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources import events_file_stream, stage_events
from .store import BucketedParquetUpsertStore


def interval_join(signups: DataFrame, purchases: DataFrame) -> DataFrame:
    """Per user: (signup, purchase) pairs with purchase.ts in
    [signup.ts, signup.ts + 1 hour]."""
    s = (
        signups.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_event_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts_ms").alias("s_ts_ms"),
            F.timestamp_millis(F.col("ts_ms")).alias("s_ts"),
        )
        .withWatermark("s_ts", "2 hours")
    )
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts_ms").alias("p_ts_ms"),
            F.timestamp_millis(F.col("ts_ms")).alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    return s.join(
        p,
        (F.col("s_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(
        "signup_event_id",
        "purchase_event_id",
        F.col("s_user_id").alias("user_id"),
        (F.col("p_ts_ms") - F.col("s_ts_ms")).alias("delay_ms"),
    )


def run_interval_join(
    spark: SparkSession,
    sf_dir: str,
    workdir: str,
    n_files: int = 4,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Replay the bounded stream through the join; return the final
    match table."""
    staging = stage_events(
        spark, sf_dir, os.path.join(workdir, "staging_events"), n_files
    )
    # An append-mode stream-stream join emits each matched pair
    # exactly once -> append-only store, O(batch) per batch.
    store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "interval_matches"),
        key_cols=["signup_event_id", "purchase_event_id"],
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        store.merge(batch, batch_id=batch_id, insert_only=True)

    query = (
        interval_join(
            events_file_stream(spark, staging, max_files_per_trigger),
            events_file_stream(spark, staging, max_files_per_trigger),
        )
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_interval"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    final = store.current()
    assert final is not None
    return final
