"""Streaming skyline: the maintained frontier must equal the batch
skyline for any batch split (skyline-of-skylines monoid) and across a
mid-stream restart."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.warehouse import pareto_frontier_parts
from m4i_flink_tasks_spark.streaming.pareto_state import (
    run_stream_pareto_frontier,
)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_pareto_")
    got = sorted(
        map(tuple, run_stream_pareto_frontier(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, pareto_frontier_parts(spark, sf_dir).collect()))
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.pareto_state import stage_parts

    wd = tempfile.mkdtemp(prefix="m4i_pareto_restart_")
    staging = stage_parts(
        spark, sf_dir, os.path.join(wd, "staging_parts"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_pareto_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_pareto_frontier(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_pareto_frontier(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, pareto_frontier_parts(spark, sf_dir).collect()))
    assert final == exp
