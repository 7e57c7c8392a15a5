"""Streaming moment-vector state: the additive statistics row must
yield the batch correlation matrix for any batch split and across a
mid-stream restart (exact decimal sums — a commutative monoid)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.profiling import (
    numeric_correlation_matrix,
)
from m4i_flink_tasks_spark.streaming.moments_state import (
    run_stream_numeric_profile,
    stage_numeric_rows,
)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_moments_")
    got = sorted(
        map(tuple, run_stream_numeric_profile(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, numeric_correlation_matrix(spark, sf_dir).collect())
    )
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_moments_restart_")
    staging = stage_numeric_rows(
        spark, sf_dir, os.path.join(wd, "staging_numeric"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_moments_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_numeric_profile(spark, sf_dir, wd)
    assert partial.count() == 6  # 4 columns -> 6 pairs, even on partial data

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_numeric_profile(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, numeric_correlation_matrix(spark, sf_dir).collect())
    )
    assert final == exp
