"""DP release mechanism (queries/profiling.py dp_noisy_histogram +
streaming/dp_state.py): threshold-table correctness, clamped support,
determinism, and stream == batch with a mid-stream restart."""

from __future__ import annotations

import glob
import math
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.profiling import (
    _DP_EPS,
    _DP_K,
    _DP_THRESH,
    dp_noisy_histogram,
)
from m4i_flink_tasks_spark.streaming.dp_state import run_stream_dp_release


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_threshold_table_is_a_valid_inverse_cdf():
    """Thresholds are nondecreasing over [0, HASH_MOD), symmetric mass
    around zero, and the implied pmf matches the two-sided geometric
    to float precision."""
    from m4i_flink_tasks_spark.operators.text import HASH_MOD

    assert len(_DP_THRESH) == 2 * _DP_K
    assert all(0 < t <= HASH_MOD for t in _DP_THRESH)
    assert _DP_THRESH == sorted(_DP_THRESH)
    alpha = math.exp(-_DP_EPS)
    p0 = (1 - alpha) / (1 + alpha)
    # implied probability of noise == 0 is the gap between the K-th and
    # (K-1)-th thresholds (k=0 sits between them)
    implied_p0 = (_DP_THRESH[_DP_K] - _DP_THRESH[_DP_K - 1]) / HASH_MOD
    assert abs(implied_p0 - p0) < 1e-6
    # clamped tail mass (left of the first threshold) is tiny
    assert _DP_THRESH[0] / HASH_MOD < 1e-3


def test_noise_support_and_identity(spark, sf_dir):
    rows = dp_noisy_histogram(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -_DP_K <= r["noise"] <= _DP_K
        assert r["released_count"] == r["true_count"] + r["noise"]
        assert r["epsilon"] == _DP_EPS


def test_release_is_deterministic(spark, sf_dir):
    a = _rows(dp_noisy_histogram(spark, sf_dir))
    b = _rows(dp_noisy_histogram(spark, sf_dir))
    assert a == b


def test_stream_equals_batch_with_restart(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    wd = tempfile.mkdtemp(prefix="m4i_dp_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_dp_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_dp_release(spark, sf_dir, wd)
    partial_counts = {
        (r["event_type"], r["ym"]): r["true_count"]
        for r in partial.collect()
    }
    assert partial_counts

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = _rows(run_stream_dp_release(spark, sf_dir, wd))
    exp = _rows(dp_noisy_histogram(spark, sf_dir))
    assert final == exp
    # the restart genuinely added mass somewhere
    full_counts = {
        (r[0], r[1]): r[2] for r in final
    }
    assert sum(full_counts.values()) > sum(partial_counts.values())
