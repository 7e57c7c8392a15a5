"""Split-conformal keep gate (queries/quality_classifier.py) and its
streaming maintained-state twin (streaming/conformal_state.py)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.quality_classifier import (
    _CONF_ALPHA,
    conformal_keep_gate,
)
from m4i_flink_tasks_spark.streaming.conformal_state import (
    run_stream_conformal_gate,
)


def _row(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_conformal_report_sanity(spark, sf_dir):
    r = _row(conformal_keep_gate(spark, sf_dir))
    assert r["alpha"] == _CONF_ALPHA
    assert 1 <= r["k_rank"] <= r["n_cal_pos"]
    # the split-conformal rank guarantees >= (1 - alpha) coverage in
    # expectation; on a fixed draw it can dip slightly below, but the
    # threshold must at least sit inside the score domain and the
    # report must be internally consistent
    assert 0.0 <= r["qhat"] <= 1.0
    assert abs(r["score_threshold"] - round(1 - r["qhat"], 6)) < 1e-9
    assert 0.0 <= r["test_coverage"] <= 1.0
    assert 0.0 <= r["test_false_keep_rate"] <= 1.0
    assert r["n_test_pos"] > 0 and r["n_test_neg"] > 0


def test_stream_equals_batch_with_restart(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    wd = tempfile.mkdtemp(prefix="m4i_conf_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_conf_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = _row(run_stream_conformal_gate(spark, sf_dir, wd))
    assert partial["n_cal_pos"] > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = _row(run_stream_conformal_gate(spark, sf_dir, wd))
    exp = _row(conformal_keep_gate(spark, sf_dir))
    assert tuple(final) == tuple(exp)
    assert final["n_cal_pos"] > partial["n_cal_pos"]
