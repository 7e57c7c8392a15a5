"""Streaming token-frequency state: batch-split invariance and
mid-stream restart convergence (integer addition monoid)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.llm_text import zipf_fit
from m4i_flink_tasks_spark.streaming.zipf_state import (
    run_stream_zipf_fit,
)


def test_stream_equals_batch_any_split(spark, sf_dir):
    wd1 = tempfile.mkdtemp(prefix="m4i_zipf_s1_")
    wd2 = tempfile.mkdtemp(prefix="m4i_zipf_s2_")
    fine = sorted(
        map(
            tuple,
            run_stream_zipf_fit(
                spark, sf_dir, wd1, max_files_per_trigger=1
            ).collect(),
        )
    )
    single = sorted(
        map(
            tuple,
            run_stream_zipf_fit(
                spark, sf_dir, wd2, max_files_per_trigger=None
            ).collect(),
        )
    )
    batch = sorted(map(tuple, zipf_fit(spark, sf_dir).collect()))
    assert fine == single == batch and len(batch) == 1


def test_mid_stream_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import (
        stage_documents,
    )

    wd = tempfile.mkdtemp(prefix="m4i_zipf_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_zipf_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_zipf_fit(spark, sf_dir, wd)
    assert partial.count() == 1

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_zipf_fit(spark, sf_dir, wd).collect())
    )
    batch = sorted(map(tuple, zipf_fit(spark, sf_dir).collect()))
    assert final == batch
