"""Partition pruning: the directory-layout half of the data-skipping
story (predicate pushdown into row groups is pinned in
test_plan_shape.py; this pins pruning whole directories before any file
is opened).

At 100 TB the event/lineitem facts would be written partitioned by a
coarse time key; a date-predicated query must then touch only the
matching partition directories — visible in the scan node's
``PartitionFilters`` and in the number of files the plan enumerates.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.sources import load_table


def _partitioned_events(spark, sf_dir, root):
    """Write events partitioned by event date (idempotent per session)."""
    path = os.path.join(root, "events_by_day")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        (
            events.withColumn("event_date", F.to_date("ts"))
            .repartition("event_date")
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(path)
        )
    return path


def test_single_day_scan_prunes_partitions(spark, sf_dir):
    root = tempfile.mkdtemp(prefix="m4i_prune_")
    path = _partitioned_events(spark, sf_dir, root)
    n_days = len(
        [d for d in os.listdir(path) if d.startswith("event_date=")]
    )
    assert n_days > 3, "need multiple partitions for a pruning test"
    target_day = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("event_date=")
    )[1]

    df = (
        spark.read.parquet(path)
        .filter(F.col("event_date") == target_day)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan, plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1].split(
        "\n", 2
    )[0] + plan.split("PartitionFilters", 1)[1].split("\n", 2)[1], (
        "partition predicate did not reach the scan"
    )

    # The pruned scan must enumerate strictly fewer files than the
    # full-table scan — pruning happens at planning, before any read.
    # AQE wraps the scan in query stages, so walk down to the
    # FileSourceScanExec and read its numFiles metric.
    def _scan_metric(node, key):
        if node.nodeName().startswith("Scan"):
            m = node.metrics()
            return m.apply(key).value() if m.contains(key) else None
        for meth in ("executedPlan", "plan"):
            if hasattr(node, meth):
                try:
                    r = _scan_metric(getattr(node, meth)(), key)
                    if r is not None:
                        return r
                except Exception:
                    pass
        ch = node.children()
        for i in range(ch.size()):
            r = _scan_metric(ch.apply(i), key)
            if r is not None:
                return r
        return None

    def n_files(frame):
        frame.collect()
        return _scan_metric(
            frame._jdf.queryExecution().executedPlan(), "numFiles"
        )

    full = spark.read.parquet(path).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    pruned_files = n_files(df)
    all_files = n_files(full)
    assert pruned_files is not None and all_files is not None
    assert 0 < pruned_files < all_files, (pruned_files, all_files)


def test_day_range_scan_prunes_partitions(spark, sf_dir):
    """Range predicates over the partition column prune too (dynamic
    partition enumeration compares against directory values)."""
    root = tempfile.mkdtemp(prefix="m4i_prune_rng_")
    path = _partitioned_events(spark, sf_dir, root)
    days = sorted(
        d.split("=", 1)[1]
        for d in os.listdir(path)
        if d.startswith("event_date=")
    )
    lo, hi = days[0], days[len(days) // 3]
    df = (
        spark.read.parquet(path)
        .filter((F.col("event_date") >= lo) & (F.col("event_date") <= hi))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    section = plan.split("PartitionFilters", 1)
    assert len(section) == 2, "no PartitionFilters in scan"
    n = df.collect()[0]["n"]
    # cross-check the pruned answer against an unpartitioned predicate
    events = load_table(spark, sf_dir, "events")
    expected = events.filter(
        (F.to_date("ts") >= lo) & (F.to_date("ts") <= hi)
    ).count()
    assert n == expected
