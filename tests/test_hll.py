"""HyperLogLog: accuracy envelope, merge exactness, stream==batch."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.sketches import approx_distinct_hll
from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.hll_state import run_stream_hll_distinct


def test_estimates_inside_error_envelope(spark, sf_dir):
    """m = 256 registers -> standard error 1.04/16 ~ 6.5%; assert a
    generous 3-sigma 20% envelope against the exact counts."""
    est = {
        r.o_orderpriority: r.approx_distinct
        for r in approx_distinct_hll(spark, sf_dir).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 0.20, (k, est[k], n)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_hll_")
    got = sorted(
        map(tuple, run_stream_hll_distinct(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, approx_distinct_hll(spark, sf_dir).collect()))
    assert got == exp and got
