"""Streaming weighted reservoir: the maintained per-language sample
must equal the batch twin EXACTLY (top-k-by-priority of a union is a
set operation, so batching and restarts cannot change the draw), and
the reservoir must show the length bias weighting exists to produce."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators import text as T
from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.weighted_sample_state import (
    batch_weighted_sample,
    run_stream_weighted_sample,
)


def test_stream_reservoir_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_wrs_")
    got = sorted(
        map(tuple, run_stream_weighted_sample(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, batch_weighted_sample(spark, sf_dir).collect()))
    assert got == exp and got


def test_stream_reservoir_mid_stream_restart(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    wd = tempfile.mkdtemp(prefix="m4i_wrs_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_wrs_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_weighted_sample(spark, sf_dir, wd)
    assert partial.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_weighted_sample(spark, sf_dir, wd).collect())
    )
    exp = sorted(map(tuple, batch_weighted_sample(spark, sf_dir).collect()))
    assert final == exp


def test_reservoir_is_length_biased_per_language(spark, sf_dir):
    """Aggregated over languages, the reservoir must overrepresent long
    documents relative to the corpus (same envelope reasoning as the
    batch query's test: observed ratio ~1.2x, asserted above 1.05x)."""
    wd = tempfile.mkdtemp(prefix="m4i_wrs_bias_")
    rows = run_stream_weighted_sample(spark, sf_dir, wd).collect()
    sample_mean = sum(r["n_tokens"] for r in rows) / len(rows)
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg(F.greatest(T.token_count(F.col("text")), F.lit(1))))
        .first()[0]
    )
    assert sample_mean > 1.05 * corpus_mean
