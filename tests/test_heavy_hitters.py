"""Streaming Misra–Gries heavy hitters: mergeable-summary guarantees.

MG counter values legitimately depend on the merge sequence (unlike the
KMV sketch's set-union), so these tests pin the properties that hold
under ANY batching — the undercount bound, forced presence of true
heavy hitters, the m-entry state bound — plus replay idempotence and a
mid-stream restart that must land inside the same guarantee envelope.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.heavy_hitters import (
    MG_M,
    run_stream_heavy_hitters,
)


def _exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = (
        docs.select(
            "lang",
            F.explode(
                F.split(F.trim(F.lower("text")), r"\s+")
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .count()
        .collect()
    )
    truth = {(r.lang, r.term): r["count"] for r in rows}
    totals: dict[str, int] = {}
    for (lang, _), c in truth.items():
        totals[lang] = totals.get(lang, 0) + c
    return truth, totals


def _assert_mg_guarantees(rows, truth, totals, m=MG_M):
    est = {(r.lang, r.term): r.est_count for r in rows}
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        assert r.n_total == totals[r.lang], (r.lang, r.n_total)
        assert r.max_undercount == totals[r.lang] // (m + 1)
    assert per_lang and max(per_lang.values()) <= m
    for (lang, term), c in truth.items():
        bound = totals[lang] // (m + 1)
        e = est.get((lang, term))
        if c > bound:
            assert e is not None, f"heavy hitter dropped: {lang}/{term}"
        if e is not None:
            assert c - bound <= e <= c, (lang, term, c, e, bound)


def test_mg_guarantees_and_bounded_state(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_mg_")
    rows = run_stream_heavy_hitters(spark, sf_dir, wd).collect()
    assert rows
    truth, totals = _exact_counts(spark, sf_dir)
    _assert_mg_guarantees(rows, truth, totals)


def test_mg_replay_is_idempotent(spark, sf_dir):
    """Re-running over the same staged files and checkpoint must be a
    no-op: same batch ids, same state (exact tuple equality — replay
    determinism is independent of MG's merge-order sensitivity)."""
    wd = tempfile.mkdtemp(prefix="m4i_mg_replay_")
    first = sorted(
        map(tuple, run_stream_heavy_hitters(spark, sf_dir, wd).collect())
    )
    second = sorted(
        map(tuple, run_stream_heavy_hitters(spark, sf_dir, wd).collect())
    )
    assert first == second


def test_mg_mid_stream_restart_stays_in_envelope(spark, sf_dir):
    """Kill the stream after the first file, restart with the rest: the
    final summary must satisfy the full-stream guarantees. (Counter
    values may differ from the one-shot run — the restart changes the
    merge tree, which the MG bound is explicitly robust to.)"""
    wd = tempfile.mkdtemp(prefix="m4i_mg_restart_")
    staging_dir = os.path.join(wd, "staging_docs")
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    staging = stage_documents(spark, sf_dir, staging_dir, 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_mg_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_heavy_hitters(spark, sf_dir, wd).collect()
    assert partial

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = run_stream_heavy_hitters(spark, sf_dir, wd).collect()
    truth, totals = _exact_counts(spark, sf_dir)
    _assert_mg_guarantees(final, truth, totals)
