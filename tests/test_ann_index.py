"""Streaming LSH index: probes against the maintained index must equal
the batch LSH top-k over the same corpus, under re-runs and mid-stream
restarts (the index materializes the same bucket function, and the
combine dedups by vec_id, so ingest order cannot change the answer)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators.similarity import lsh_bucketed_topk
from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.ann_index import (
    probe_topk,
    run_stream_ann_index,
    stage_embeddings,
)

# vec_id 4 sits in a multi-member LSH bucket at both test SFs, so the
# probe (which excludes the query itself) returns a non-vacuous top-k.
QUERY_VEC_ID = 4


def _query_embedding(spark, sf_dir):
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()
    )
    assert row, "query vector missing from testdata"
    return list(row[0].embedding)


def _batch_answer(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return sorted(
        map(tuple, lsh_bucketed_topk(emb, QUERY_VEC_ID).collect())
    )


def test_index_probe_equals_batch_lsh(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ann_idx_")
    store = run_stream_ann_index(spark, sf_dir, wd)
    got = sorted(
        map(
            tuple,
            probe_topk(
                spark, store, QUERY_VEC_ID, _query_embedding(spark, sf_dir)
            ).collect(),
        )
    )
    assert got == _batch_answer(spark, sf_dir)
    assert got, "probe returned nothing"


def test_index_survives_mid_stream_restart(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_ann_idx_restart_")
    staging = stage_embeddings(
        spark, sf_dir, os.path.join(wd, "staging_embeddings"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_ann_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial_store = run_stream_ann_index(spark, sf_dir, wd)
    assert partial_store.current() is not None

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    store = run_stream_ann_index(spark, sf_dir, wd)
    got = sorted(
        map(
            tuple,
            probe_topk(
                spark, store, QUERY_VEC_ID, _query_embedding(spark, sf_dir)
            ).collect(),
        )
    )
    assert got == _batch_answer(spark, sf_dir)


def test_pq_stream_index_equals_batch_encode(spark, sf_dir):
    """The streaming PQ index (offline-trained frozen codebook +
    insert-only per-batch encodes) must equal the batch pq_encode
    row-for-row under the default batch split."""
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_similarity import pq_encode
    from m4i_flink_tasks_spark.streaming.pq_index import run_stream_pq_index

    wd = tempfile.mkdtemp(prefix="m4i_pqidx_")
    got = sorted(map(tuple, run_stream_pq_index(spark, sf_dir, wd).collect()))
    exp = sorted(map(tuple, pq_encode(spark, sf_dir).collect()))
    assert got == exp and got


def test_ivfpq_stream_probe_equals_batch(spark, sf_dir):
    """The cell-bucketed streamed IVF-PQ index probed with the frozen
    artifacts must equal the batch ivfpq_adc_topk top-k."""
    import tempfile

    from pyspark.sql import functions as F

    from m4i_flink_tasks_spark.queries.llm_similarity import (
        _QUERY_VEC_ID,
        ivfpq_adc_topk,
    )
    from m4i_flink_tasks_spark.sources import load_table
    from m4i_flink_tasks_spark.streaming.ivfpq_index import (
        ivfpq_probe_topk,
        run_stream_ivfpq_index,
    )

    wd = tempfile.mkdtemp(prefix="m4i_ivfpq_")
    store, coarse, final = run_stream_ivfpq_index(spark, sf_dir, wd)
    q_emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select(F.col("embedding").alias("q_emb"))
    )
    got = [tuple(r) for r in ivfpq_probe_topk(spark, store, coarse, final, q_emb).collect()]
    exp = [tuple(r) for r in ivfpq_adc_topk(spark, sf_dir).collect()]
    assert got == exp and got


def test_pq_index_mid_stream_restart_converges(spark, sf_dir):
    """Hiding the tail of the staged feed, ingesting, then restoring it
    and re-running must converge the PQ index to the batch encode —
    the checkpoint + batch-id fence replays nothing and misses
    nothing."""
    import glob
    import os
    import shutil
    import tempfile

    from m4i_flink_tasks_spark.queries.llm_similarity import pq_encode
    from m4i_flink_tasks_spark.streaming.ann_index import stage_embeddings
    from m4i_flink_tasks_spark.streaming.pq_index import run_stream_pq_index

    wd = tempfile.mkdtemp(prefix="m4i_pq_restart_")
    staging = stage_embeddings(
        spark, sf_dir, os.path.join(wd, "staging_embeddings"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_pq_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    n_partial = run_stream_pq_index(spark, sf_dir, wd).count()
    assert n_partial > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(map(tuple, run_stream_pq_index(spark, sf_dir, wd).collect()))
    exp = sorted(map(tuple, pq_encode(spark, sf_dir).collect()))
    assert final == exp and len(final) > n_partial


def test_ivfpq_batch_serving_cache_is_transparent(spark, sf_dir):
    """The batch IVF-PQ index (coarse centroids + residual codebook +
    encoded codes) is trained once per (session, sf_dir) and frozen —
    the FAISS train/add/search split (r6 verdict item 4: the bench row
    should measure serving, not repeated k-means builds). The cache
    must be semantically invisible: a cold call, a warm call, and a
    cache-evicted rebuild all return identical rows."""
    from m4i_flink_tasks_spark.queries import llm_similarity as L

    L._IVFPQ_INDEX_CACHE.clear()
    cold = [tuple(r) for r in L.ivfpq_adc_topk(spark, sf_dir).collect()]
    assert sf_dir in L._IVFPQ_INDEX_CACHE
    warm = [tuple(r) for r in L.ivfpq_adc_topk(spark, sf_dir).collect()]
    L._IVFPQ_INDEX_CACHE.clear()
    rebuilt = [tuple(r) for r in L.ivfpq_adc_topk(spark, sf_dir).collect()]
    assert cold == warm == rebuilt and cold
