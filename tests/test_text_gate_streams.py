"""Streaming twins of the r8 text gates (streaming/text_gates.py):
the replayed stream must materialize exactly the batch report, and a
mid-stream restart (files appearing after a first drained run) must
converge to the same answer — the exactly-once-per-document contract
the doc-keyed insert_only store provides."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.llm_text import (
    gopher_quality_rules,
    intra_doc_span_dedup,
)
from m4i_flink_tasks_spark.streaming.text_gates import (
    run_stream_gopher_rules,
    run_stream_intra_doc_dedup,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_stream_gopher_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_gopher_stream_")
    got = _rows(run_stream_gopher_rules(spark, sf_dir, wd))
    assert got == _rows(gopher_quality_rules(spark, sf_dir))


def test_stream_span_dedup_restart_converges(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    wd = tempfile.mkdtemp(prefix="m4i_textgate_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_textgate_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_intra_doc_dedup(spark, sf_dir, wd)
    n_partial = partial.count()
    assert 0 < n_partial

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = _rows(run_stream_intra_doc_dedup(spark, sf_dir, wd))
    exp = _rows(intra_doc_span_dedup(spark, sf_dir))
    assert len(final) > n_partial
    assert final == exp
