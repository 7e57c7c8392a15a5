"""Count-min sketch: overestimate guarantee, theory error bound,
merge exactness (stream==batch), mid-stream restart."""

from __future__ import annotations

import math
import tempfile

from m4i_flink_tasks_spark.queries.sketches import (
    _CM_D,
    _CM_W,
    approx_freq_countmin,
)
from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.countmin_state import (
    run_stream_countmin_freq,
)


def test_never_underestimates_and_within_theory_bound(spark, sf_dir):
    """CMS guarantees est >= true always, and est <= true + e/W * N
    with probability 1 - exp(-D); assert the hard floor and a generous
    3x slack on the expected-overestimate bound."""
    rows = approx_freq_countmin(spark, sf_dir).collect()
    assert rows
    n_events = load_table(spark, sf_dir, "orders").count()
    bound = 3 * math.e / _CM_W * n_events
    for r in rows:
        assert r.overestimate >= 0, r
        assert r.cm_estimate == r.exact_cnt + r.overestimate
        assert r.overestimate <= bound, (r, bound)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_cm_")
    got = sorted(
        map(tuple, run_stream_countmin_freq(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, approx_freq_countmin(spark, sf_dir).collect()))
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    """Counter sums are commutative and the checkpoint prevents
    replays, so a restart over a partially-processed stream must land
    on the identical counter matrix."""
    import glob
    import os
    import shutil

    from m4i_flink_tasks_spark.streaming.sketch_state import stage_orders

    wd = tempfile.mkdtemp(prefix="m4i_cm_restart_")
    staging = stage_orders(
        spark, sf_dir, os.path.join(wd, "staging_orders"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_cm_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_countmin_freq(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_countmin_freq(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, approx_freq_countmin(spark, sf_dir).collect()))
    assert final == exp


def test_depth_width_are_sane():
    assert _CM_D >= 2 and _CM_W >= 16
