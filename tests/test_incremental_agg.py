"""Incremental view maintenance: the streamed q1 view must equal the
batch aggregate over all data seen, and survive replay + mid-stream
restart (addition is associative/commutative; double parts agree after
the batch query's own rounding)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.relational import q1_pricing_summary
from m4i_flink_tasks_spark.streaming.incremental_agg import (
    run_incremental_pricing_summary,
    stage_lineitem,
)


def test_incremental_view_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_")
    inc = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    bat = sorted(map(tuple, q1_pricing_summary(spark, sf_dir).collect()))
    assert inc == bat


def test_incremental_view_replay_idempotent(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_replay_")
    first = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    second = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    assert first == second


def test_incremental_view_mid_stream_restart(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ivm_restart_")
    staging = stage_lineitem(
        spark, sf_dir, os.path.join(wd, "staging_lineitem"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_ivm_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_incremental_pricing_summary(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(
            tuple,
            run_incremental_pricing_summary(spark, sf_dir, wd).collect(),
        )
    )
    bat = sorted(map(tuple, q1_pricing_summary(spark, sf_dir).collect()))
    assert final == bat
