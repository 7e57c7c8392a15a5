"""Co-located bucketed joins and explicit salting — the two manual
shuffle-elimination techniques for scales where AQE alone is not enough.

Bucketing: writing both join sides bucketed by the join key means a
later join reads co-located buckets and needs NO exchange on either
side — the pattern for a fact-fact join (orders x lineitem) that would
otherwise shuffle 100 TB twice.

Salting: a hot key meeting a non-broadcastable build side spreads over
n reducers; semantics must be join-identical (the oracle parity test
covers values; here we pin the physical shape).
"""

from __future__ import annotations

import pytest

from m4i_flink_tasks_spark.operators.skew import salted_join
from m4i_flink_tasks_spark.sources import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    """orders x lineitem bucketed by order key: the join must read
    co-located buckets with zero Exchange nodes on either input."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    for name, df, key in (
        ("orders_bkt", orders.select("o_orderkey", "o_totalprice"), "o_orderkey"),
        (
            "lineitem_bkt",
            lineitem.select(
                F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
            ),
            "o_orderkey",
        ),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(4, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    try:
        joined = spark.table("orders_bkt").join(
            spark.table("lineitem_bkt"), "o_orderkey"
        )
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        # sanity: the join actually produced the fact-fact row count
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_salted_join_spreads_hot_keys(spark, sf_dir, no_broadcast):
    """The salted join must (a) hash-join on (key, salt) without
    broadcasting and (b) return exactly the unsalted join's result."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    salted = salted_join(events, dim, "event_type", n_salts=4)
    plan = _executed_plan(salted)
    assert "ShuffledHashJoin" in plan, f"expected shuffle-hash join:\n{plan}"
    assert "BroadcastHashJoin" not in plan

    plain = events.join(dim, "event_type")
    assert salted.count() == plain.count()
    key = lambda r: (r["event_id"],)  # noqa: E731
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.select(*salted.columns).collect())
    )


def test_salted_join_left_outer_keeps_unmatched(spark, sf_dir, no_broadcast):
    """Left rows whose key misses the dim must survive exactly once
    (the salt replication must not drop or duplicate them)."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = (
        events.select("event_type")
        .distinct()
        .filter(F.col("event_type") != "error")
        .withColumn("type_weight", F.length("event_type"))
    )
    out = salted_join(events, dim, "event_type", n_salts=4, how="left")
    assert out.count() == events.count()
    misses = out.filter(F.col("type_weight").isNull())
    assert misses.count() == events.filter(F.col("event_type") == "error").count()


def test_minhash_signature_stage_tracks_cluster_parallelism(spark, sf_dir):
    """The CPU-bound signature stage must scale with the cluster: one
    task per core minimum, wider if the input is already wider, and no
    fixed ceiling (a 16-task cap would idle a 1000-executor cluster)."""
    from m4i_flink_tasks_spark.operators.dedup import signature_partitions

    from m4i_flink_tasks_spark.operators.dedup import SIGNATURE_ROWS_PER_TASK

    docs = load_table(spark, sf_dir, "documents")
    n = signature_partitions(docs)
    dp = spark.sparkContext.defaultParallelism
    assert n >= dp, f"signature stage ({n} tasks) under-uses {dp} cores"
    wide = docs.repartition(dp * 4)
    assert signature_partitions(wide) >= dp * 4, "input-wider-than-cluster capped"
    # A rows hint bounds fan-out by actual work: a corpus big enough to
    # feed every core stays at full width, a tiny one doesn't pay
    # per-task Arrow setup for idle tasks.
    big = SIGNATURE_ROWS_PER_TASK * dp * 10
    assert signature_partitions(docs, rows_hint=big) >= dp
    small = signature_partitions(docs, rows_hint=SIGNATURE_ROWS_PER_TASK * 3)
    assert 2 <= small <= 3, f"tiny corpus over-fanned: {small} tasks"
