"""Streaming PCA moment state: fixed-point moments are a commutative
monoid, so the eigen readout must be bit-identical for any batch split
and across a mid-stream restart, and must sit within quantization
error of the raw-float batch PCA."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from m4i_flink_tasks_spark.queries.llm_similarity import (
    embedding_pca_power,
)
from m4i_flink_tasks_spark.streaming.pca_state import (
    run_stream_embedding_pca,
    stage_quantized_embeddings,
)


def test_batch_split_invariance(spark, sf_dir):
    """maxFilesPerTrigger=1 (4 micro-batches) and a single availableNow
    batch must produce identical loadings — the monoid property that
    makes the state safe under repartitioning and restarts."""
    wd1 = tempfile.mkdtemp(prefix="m4i_pca_split1_")
    wd2 = tempfile.mkdtemp(prefix="m4i_pca_split2_")
    fine = sorted(
        map(
            tuple,
            run_stream_embedding_pca(
                spark, sf_dir, wd1, max_files_per_trigger=1
            ).collect(),
        )
    )
    coarse = sorted(
        map(
            tuple,
            run_stream_embedding_pca(
                spark, sf_dir, wd2, max_files_per_trigger=None
            ).collect(),
        )
    )
    assert fine == coarse and len(fine) == 128


def test_stream_matches_raw_batch_within_quantization(spark, sf_dir):
    """2^-20 quantization must not move the components: loadings agree
    with the raw-float batch PCA to ~1e-3 (the quantized and raw
    covariances differ by ~2^-20 per entry; the near-flat spectrum
    amplifies that by the inverse eigengap, not more)."""
    wd = tempfile.mkdtemp(prefix="m4i_pca_stream_")
    got = {
        (r.component, r.pos): (r.loading, r.eigenvalue)
        for r in run_stream_embedding_pca(spark, sf_dir, wd).collect()
    }
    exp = {
        (r.component, r.pos): (r.loading, r.eigenvalue)
        for r in embedding_pca_power(spark, sf_dir).collect()
    }
    assert got.keys() == exp.keys()
    worst = max(
        abs(got[k][0] - exp[k][0]) for k in exp
    )
    assert worst < 2e-3, f"quantization moved a loading by {worst}"
    assert all(
        abs(got[k][1] - exp[k][1]) < 1e-4 for k in exp
    ), "eigenvalues moved beyond quantization error"


def test_mid_stream_restart_converges(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_pca_restart_")
    staging = stage_quantized_embeddings(
        spark, sf_dir, os.path.join(wd, "staging_pca"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_pca_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_embedding_pca(spark, sf_dir, wd)
    assert partial.count() == 128  # readout works on partial state

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_embedding_pca(spark, sf_dir, wd).collect())
    )
    wd_full = tempfile.mkdtemp(prefix="m4i_pca_full_")
    full = sorted(
        map(
            tuple,
            run_stream_embedding_pca(spark, sf_dir, wd_full).collect(),
        )
    )
    assert final == full
