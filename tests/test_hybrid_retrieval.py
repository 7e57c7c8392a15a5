"""Hybrid RRF retrieval (queries/hybrid_retrieval.py) and its
streaming inverted-index twin (streaming/bm25_index.py)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.hybrid_retrieval import (
    _ARM_N,
    _FUSED_TOP,
    _RRF_K,
    hybrid_rrf_retrieval,
)
from m4i_flink_tasks_spark.streaming.bm25_index import run_stream_hybrid_rrf


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rrf_report_sanity(spark, sf_dir):
    rows = hybrid_rrf_retrieval(spark, sf_dir).collect()
    assert 0 < len(rows) <= _FUSED_TOP
    for r in rows:
        assert r["rank_lex"] is not None or r["rank_sem"] is not None
        expected = 0.0
        if r["rank_lex"] is not None:
            assert 1 <= r["rank_lex"] <= _ARM_N
            expected += 1.0 / (_RRF_K + r["rank_lex"])
        if r["rank_sem"] is not None:
            assert 1 <= r["rank_sem"] <= _ARM_N
            expected += 1.0 / (_RRF_K + r["rank_sem"])
        assert abs(r["rrf_score"] - round(expected, 6)) < 1e-9
    # a document retrieved by BOTH arms must outrank one retrieved at
    # the same per-arm depth by a single arm — the fusion property
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_stream_index_equals_batch_with_restart(spark, sf_dir):
    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents

    wd = tempfile.mkdtemp(prefix="m4i_rrf_restart_")
    staging = stage_documents(
        spark, sf_dir, os.path.join(wd, "staging_docs"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_rrf_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_hybrid_rrf(spark, sf_dir, wd)
    assert partial.count() > 0  # retrievable before the full corpus

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = _rows(run_stream_hybrid_rrf(spark, sf_dir, wd))
    exp = _rows(hybrid_rrf_retrieval(spark, sf_dir))
    assert final == exp
