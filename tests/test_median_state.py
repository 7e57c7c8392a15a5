"""Streaming exact median: additive value-histogram state must equal
the batch two-pass selection for any batch split and across a
mid-stream restart (integer counts — a commutative monoid)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.sketches import exact_median_twopass
from m4i_flink_tasks_spark.streaming.median_state import (
    run_stream_exact_median,
)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_median_")
    got = sorted(
        map(tuple, run_stream_exact_median(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, exact_median_twopass(spark, sf_dir).collect()))
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.median_state import (
        stage_price_cents,
    )

    wd = tempfile.mkdtemp(prefix="m4i_median_restart_")
    staging = stage_price_cents(
        spark, sf_dir, os.path.join(wd, "staging_prices"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_median_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_exact_median(spark, sf_dir, wd)
    assert partial.count() == 1

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_exact_median(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, exact_median_twopass(spark, sf_dir).collect()))
    assert final == exp
