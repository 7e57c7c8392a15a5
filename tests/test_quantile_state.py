"""Streaming bottom-k quantile sample: the maintained state must equal
the batch twin EXACTLY (k-smallest-of-union is a set operation, so
batching and restarts cannot change the sample), and the sampled
quantiles must sit inside a generous rank envelope of the exact ones."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.quantile_state import (
    batch_quantile_sample,
    run_stream_quantile_sample,
)


def test_stream_sample_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_qs_")
    got = sorted(
        map(tuple, run_stream_quantile_sample(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, batch_quantile_sample(spark, sf_dir).collect()))
    assert got == exp and got


def test_stream_sample_mid_stream_restart(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    wd = tempfile.mkdtemp(prefix="m4i_qs_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_qs_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_quantile_sample(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_quantile_sample(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, batch_quantile_sample(spark, sf_dir).collect()))
    assert final == exp


def test_sampled_median_inside_rank_envelope(spark, sf_dir):
    """The sample median must land between the exact 30th and 70th
    percentiles per group — a deliberately generous envelope that holds
    with overwhelming probability at k=256 (rank sd ≈ 0.03·n) and
    degenerates to exactness when the sample covers the group."""
    wd = tempfile.mkdtemp(prefix="m4i_qs_env_")
    got = {
        r.event_type: r.q50
        for r in run_stream_quantile_sample(spark, sf_dir, wd).collect()
    }
    events = load_table(spark, sf_dir, "events")
    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in events.groupBy("event_type")
        .agg(
            F.expr("percentile(round(value, 6), 0.30)").alias("lo"),
            F.expr("percentile(round(value, 6), 0.70)").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(bounds)
    for t, q50 in got.items():
        lo, hi = bounds[t]
        assert lo <= q50 <= hi, (t, q50, lo, hi)
