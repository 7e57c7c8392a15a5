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


def test_mid_stream_restart_converges(spark, sf_dir):
    """Register maxes are idempotent AND commutative, so a restart that
    replays a partially-processed stream must land on the identical
    registers — the strongest restart story in the sketch family."""
    import glob
    import os
    import shutil

    from m4i_flink_tasks_spark.streaming.sketch_state import stage_orders

    wd = tempfile.mkdtemp(prefix="m4i_hll_restart_")
    staging = stage_orders(
        spark, sf_dir, os.path.join(wd, "staging_orders"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_hll_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_hll_distinct(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_hll_distinct(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, approx_distinct_hll(spark, sf_dir).collect()))
    assert final == exp
