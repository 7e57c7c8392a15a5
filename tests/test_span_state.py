"""Streaming span dedup: the additive keyed state must reproduce the
batch duplicate_span_stats EXACTLY for any batch split and across a
mid-stream restart (counts add, min-positions min — commutative monoid
folds, so the split cannot matter)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.llm_dedup import duplicate_span_stats
from m4i_flink_tasks_spark.streaming.span_state import run_stream_span_dedup


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_spans_")
    got = sorted(
        map(tuple, run_stream_span_dedup(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, duplicate_span_stats(spark, sf_dir).collect()))
    assert got == exp and got
    # the state actually detected cross-document duplication
    assert any(t[2] > 0 for t in got)


def test_mid_stream_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    wd = tempfile.mkdtemp(prefix="m4i_spans_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_spans_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_span_dedup(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_span_dedup(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, duplicate_span_stats(spark, sf_dir).collect()))
    assert final == exp
