"""Streaming sessionization as mergeable interval state: the final
keyed state must EXACTLY equal the batch gaps-and-islands answer —
gap-closure over intervals is associative/commutative, so unlike MG
heavy hitters this pins tuple equality under any batching."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.streaming_like import session_windows
from m4i_flink_tasks_spark.streaming.session_state import (
    run_stream_sessions,
)


def test_stream_sessions_equal_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_sess_")
    streamed = sorted(
        map(tuple, run_stream_sessions(spark, sf_dir, wd).collect())
    )
    batch = sorted(map(tuple, session_windows(spark, sf_dir).collect()))
    assert streamed == batch


def test_stream_sessions_replay_idempotent(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_sess_replay_")
    first = sorted(
        map(tuple, run_stream_sessions(spark, sf_dir, wd).collect())
    )
    second = sorted(
        map(tuple, run_stream_sessions(spark, sf_dir, wd).collect())
    )
    assert first == second


def test_stream_sessions_mid_stream_restart(spark, sf_dir):
    """Kill after the first file, restart with the rest: the merge's
    order-insensitivity means the final state must be IDENTICAL to the
    one-shot (and hence batch) answer, not merely within an envelope."""
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    wd = tempfile.mkdtemp(prefix="m4i_sess_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_sess_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_sessions(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_sessions(spark, sf_dir, wd).collect())
    )
    batch = sorted(map(tuple, session_windows(spark, sf_dir).collect()))
    assert final == batch
