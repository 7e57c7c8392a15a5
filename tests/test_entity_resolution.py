"""Entity-resolution pins: blocking recall and block-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.entity_resolution import (
    _EVEN_POS,
    _LEV_MAX,
    _ODD_POS,
    _candidate_pairs,
    _interleaved_key,
)
from m4i_flink_tasks_spark.sources import load_table

from .test_plan_shape import plan_of


def test_segment_blocking_has_full_recall(spark, sf_dir):
    """The two-pass segment blocking must enumerate EXACTLY the pairs
    the all-pairs (in nation+segment) lev<=1 match finds — the
    pigeonhole guarantee, checked against a brute-force twin."""
    customer = load_table(spark, sf_dir, "customer")
    blocked = (
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
        .union(
            _candidate_pairs(customer, _interleaved_key("c_name", _EVEN_POS))
        )
        .distinct()
    )
    a = customer.alias("a")
    b = customer.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= _LEV_MAX
        )
        .select(
            F.col("a.c_custkey").alias("src"),
            F.col("b.c_custkey").alias("dst"),
        )
    )
    assert blocked.exceptAll(brute).count() == 0
    assert brute.exceptAll(blocked).count() == 0


def test_block_join_is_hash_equality(spark, sf_dir):
    """Each blocking pass joins on pure equality keys — a hash join,
    never a cartesian with a post-filter."""
    customer = load_table(spark, sf_dir, "customer")
    plan = plan_of(
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
