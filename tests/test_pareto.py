"""Skyline correctness: the window formulation must equal the O(n^2)
dominance definition exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.warehouse import pareto_frontier_parts
from m4i_flink_tasks_spark.sources import load_table


def test_frontier_equals_bruteforce_dominance(spark, sf_dir):
    got = {
        r.p_partkey for r in pareto_frontier_parts(spark, sf_dir).collect()
    }
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("pc"),
    )
    a, b = part.alias("a"), part.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.pc") <= F.col("a.pc"))
            & (F.col("b.p_size") <= F.col("a.p_size"))
            & (
                (F.col("b.pc") < F.col("a.pc"))
                | (F.col("b.p_size") < F.col("a.p_size"))
            ),
            "left_semi",
        )
        .select("a.p_partkey")
    )
    exp = {
        r.p_partkey
        for r in part.join(dominated, "p_partkey", "left_anti").collect()
    }
    assert got == exp and got
