"""Streaming F2 join-size state: additive keyed counts must equal the
batch estimator for any batch split and across a mid-stream restart
(integer counts — a commutative monoid)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.sketches import selfjoin_size_estimate
from m4i_flink_tasks_spark.streaming.f2_state import (
    run_stream_selfjoin_size,
    stage_event_keys,
)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_f2_")
    got = sorted(
        map(tuple, run_stream_selfjoin_size(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, selfjoin_size_estimate(spark, sf_dir).collect()))
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_f2_restart_")
    staging = stage_event_keys(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_f2_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_selfjoin_size(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_selfjoin_size(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, selfjoin_size_estimate(spark, sf_dir).collect()))
    assert final == exp
