"""Unit tests for the as-of join operator (SURVEY §2.3 D8 generalized):
tie handling must match the reference's 'strictly earlier version'
semantics (determine_change_job.py:209) in strict mode."""

from __future__ import annotations

from m4i_flink_tasks_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("k1", 100, "o1"), ("k1", 200, "o2"), ("k2", 100, "o3"), ("k3", 50, "o4")],
        "key string, t long, order_id string",
    )
    right = spark.createDataFrame(
        [("k1", 100, 1.0), ("k1", 150, 2.0), ("k2", 90, 3.0)],
        "key string, t long, v double",
    )
    return left, right


def test_asof_join_strict_excludes_same_instant(spark):
    left, right = _frames(spark)
    out = asof_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("t", "rt"),
        on=["key"],
        left_time="lt",
        right_time="rt",
        value_cols=["v"],
        strict=True,
    )
    got = {r.order_id: r.v_asof for r in out.collect()}
    # o1 at t=100: the right row AT 100 is not strictly earlier -> None
    assert got == {"o1": None, "o2": 2.0, "o3": 3.0, "o4": None}


def test_asof_join_non_strict_includes_ties(spark):
    left, right = _frames(spark)
    out = asof_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("t", "rt"),
        on=["key"],
        left_time="lt",
        right_time="rt",
        value_cols=["v"],
        strict=False,
    )
    got = {r.order_id: r.v_asof for r in out.collect()}
    assert got == {"o1": 1.0, "o2": 2.0, "o3": 3.0, "o4": None}


def test_asof_join_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(
        left.withColumnRenamed("t", "lt"),
        right.withColumnRenamed("t", "rt"),
        on=["key"],
        left_time="lt",
        right_time="rt",
        value_cols=["v"],
    )
    assert out.count() == left.count()  # left join: nothing dropped
    assert set(out.columns) == {"key", "lt", "order_id", "v_asof"}
