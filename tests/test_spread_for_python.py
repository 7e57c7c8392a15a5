"""Regression pins for the Python-stage parallelism fix (SCALE.md
twelfth wave): CPU-bound payload synth/demux stages must not inherit a
compact input's file-split count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.multimodal import (
    attach_binary_payload,
    attach_container_payload,
    spread_for_python,
)


def test_spread_widens_single_split_input(spark):
    """A coalesced (1-partition) input must come out at
    defaultParallelism so the per-row Python work parallelizes."""
    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).select(F.col("id").alias("doc_id")).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    spread = spread_for_python(narrow)
    assert spread.rdd.getNumPartitions() == target
    # values untouched
    assert spread.count() == 1000


def test_spread_is_noop_when_input_already_wide(spark):
    """When the scan already has enough splits (the well-laid-out
    cluster case) no shuffle is added — the plan passes through."""
    target = spark.sparkContext.defaultParallelism
    wide = (
        spark.range(1000)
        .select(F.col("id").alias("doc_id"))
        .repartition(target + 4, "doc_id")
    )
    spread = spread_for_python(wide)
    assert spread is wide


def test_spread_passes_streaming_through(spark):
    """Streaming relations can't be introspected for partition count;
    micro-batch sizing belongs to the trigger, so pass through."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    assert spread_for_python(stream) is stream


def test_payload_attachers_spread_compact_inputs(spark, sf_dir):
    """The real attachers must plan the payload stage at full
    parallelism even when the documents scan is a single split — the
    exact shape that measured 6.6x at the sf1 rehearsal."""
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").coalesce(1)
    target = spark.sparkContext.defaultParallelism
    for attached in (
        attach_container_payload(docs),
        attach_binary_payload(docs),
    ):
        assert attached.rdd.getNumPartitions() >= target
