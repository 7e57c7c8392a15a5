"""Streaming WARC ingest: the insert-only record store must equal the
batch extraction for any batch split and across a mid-stream restart
(unique record keys make the append a trivially commutative merge)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.llm_corpus import warc_response_extraction
from m4i_flink_tasks_spark.streaming.warc_ingest import (
    run_stream_warc_ingest,
    stage_doc_ids,
)


def test_stream_equals_batch(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_warc_")
    got = sorted(
        map(tuple, run_stream_warc_ingest(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, warc_response_extraction(spark, sf_dir).collect())
    )
    assert got == exp and got


def test_mid_stream_restart_converges(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_warc_restart_")
    staging = stage_doc_ids(
        spark, sf_dir, os.path.join(wd, "staging_ids"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_warc_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_warc_ingest(spark, sf_dir, wd)
    n_partial = partial.count()
    assert n_partial > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_warc_ingest(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, warc_response_extraction(spark, sf_dir).collect())
    )
    assert final == exp and len(final) > n_partial


def test_wet_stream_equals_batch_capstone(spark, sf_dir):
    """The streaming WARC→WET→gate pipeline's store must equal the
    batch warc_text_pipeline row-for-row (shared gate expressions +
    insert-only unique keys make the merge commutative)."""
    from m4i_flink_tasks_spark.queries.llm_corpus import warc_text_pipeline
    from m4i_flink_tasks_spark.streaming.warc_ingest import (
        run_stream_warc_text,
    )

    wd = tempfile.mkdtemp(prefix="m4i_wet_")
    got_df = run_stream_warc_text(spark, sf_dir, wd)
    exp_df = warc_text_pipeline(spark, sf_dir)
    cols = sorted(exp_df.columns)
    assert sorted(got_df.columns) == cols
    # drop_reason is NULL on kept rows — sort by repr (None vs str)
    got = sorted(map(tuple, got_df.select(*cols).collect()), key=repr)
    exp = sorted(map(tuple, exp_df.select(*cols).collect()), key=repr)
    assert got == exp and got
    # both gate outcomes must actually occur in the fixture corpus
    reasons = {
        row["drop_reason"]
        for row in got_df.select("drop_reason").distinct().collect()
    }
    assert "too_short" in reasons and "link_heavy" in reasons


def test_quarantine_stream_equals_batch(spark, sf_dir):
    """Dead-letter split across micro-batches must union to exactly the
    batch quarantine report, with both channels populated."""
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        warc_ingest_quarantine,
    )
    from m4i_flink_tasks_spark.streaming.warc_ingest import (
        run_stream_warc_quarantine,
    )

    wd = tempfile.mkdtemp(prefix="m4i_warcq_")
    got_df = run_stream_warc_quarantine(spark, sf_dir, wd)
    got = sorted(map(tuple, got_df.collect()))
    exp = sorted(map(tuple, warc_ingest_quarantine(spark, sf_dir).collect()))
    assert got == exp and got
    statuses = {row["status"] for row in got_df.select("status").distinct().collect()}
    assert statuses == {"ok", "dead_letter"}
