"""Hardening tests (SURVEY §7.1 step 7): checkpoint restart and
idempotent re-delivery.

The reference is at-least-once with idempotency only where the doc id
happens to be deterministic (publish_state_job.py:77); a crashed job
re-reads from the last committed Kafka offset and re-applies effects.
Here: re-running a completed pipeline against its existing checkpoint
must be a no-op, and replaying a batch into the store must converge
(effectively-once end to end).
"""

from __future__ import annotations

import os
import tempfile

from m4i_flink_tasks_spark.streaming.publish_state import run_publish_state
from m4i_flink_tasks_spark.streaming.store import ParquetUpsertStore

from .conftest import full_only


def test_publish_state_restart_is_noop(spark, sf_dir):
    workdir = tempfile.mkdtemp(prefix="m4i_restart_")
    first, _dead = run_publish_state(spark, sf_dir, workdir)
    rows_first = first.count()
    store_root = os.path.join(workdir, "entity_state")
    versions_first = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )

    # "Restart" the job with the same checkpoint: the file source finds
    # no new files, so no batch runs and no store version is written.
    second, _dead2 = run_publish_state(spark, sf_dir, workdir)
    assert second.count() == rows_first
    versions_second = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )
    assert versions_second == versions_first


def test_store_replay_converges(spark):
    # At-least-once delivery: applying the same micro-batch merge twice
    # must leave the store byte-identical (the keyed-merge idempotency
    # the reference only gets from deterministic ES doc ids).
    root = tempfile.mkdtemp(prefix="m4i_replay_")
    store = ParquetUpsertStore(spark, root, key_cols=["k"])
    batch = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    store.merge(batch)
    once = sorted(map(tuple, store.current().collect()))
    store.merge(batch)  # redelivery
    twice = sorted(map(tuple, store.current().collect()))
    assert once == twice


def test_combine_replay_skipped_by_batch_id(spark):
    """The synchronize pipeline's additive combine would double-count on
    a foreachBatch replay (crash after pointer swap, before checkpoint
    commit). The store records the batch id atomically with each version
    and skips replays, so the combine path is effectively-once too."""
    from m4i_flink_tasks_spark.streaming.synchronize import combine_docs

    root = tempfile.mkdtemp(prefix="m4i_combine_replay_")
    store = ParquetUpsertStore(spark, root, key_cols=["guid"])
    schema = (
        "guid string, n_events long, sum_value double, min_value double, "
        "max_value double, event_types array<string>, last_ts_ms long, "
        "last_event_id long, last_value double, last_event_type string"
    )
    b0 = spark.createDataFrame(
        [("u1", 2, 10.0, 3.0, 7.0, ["click"], 100, 1, 7.0, "click")], schema
    )
    b1 = spark.createDataFrame(
        [("u1", 1, 5.0, 5.0, 5.0, ["view"], 200, 2, 5.0, "view")], schema
    )
    store.merge(b0, batch_id=0)
    store.merge(combine_docs(store.current(), b1), batch_id=1)
    applied = sorted(map(tuple, store.current().collect()))
    assert store.last_batch_id() == 1

    # Replay of batch 1 (same id): must be a no-op, not a double-add.
    store.merge(combine_docs(store.current(), b1), batch_id=1)
    replayed = sorted(map(tuple, store.current().collect()))
    assert replayed == applied
    assert applied[0][1] == 3  # n_events = 2 + 1, counted once


def test_stream_dedup_restart_is_noop(spark, sf_dir):
    """Restarting the watermark-dedup pipeline against its checkpoint
    must neither re-emit already-seen events nor write a store version:
    the dedup state and source offsets both live in the checkpoint."""
    from m4i_flink_tasks_spark.streaming.stream_dedup import run_stream_dedup

    workdir = tempfile.mkdtemp(prefix="m4i_dedup_restart_")
    first = run_stream_dedup(spark, sf_dir, workdir)
    rows_first = first.count()
    store_root = os.path.join(workdir, "deduped_events")
    versions_first = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )

    second = run_stream_dedup(spark, sf_dir, workdir)
    assert second.count() == rows_first
    versions_second = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )
    assert versions_second == versions_first


def test_determine_change_entities_mid_stream_restart(spark, sf_dir):
    """Kill the expression-native entity differ mid-stream and restart:
    the keyed version store plus checkpointed offsets must produce
    EXACTLY the one-shot answer — the first event after the restart
    diffs against state written before it, across a batch split the
    one-shot run never saw."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.determine_change import (
        run_determine_change_entities,
    )
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    wd_ref = tempfile.mkdtemp(prefix="m4i_dce_ref_")
    expected = sorted(
        map(tuple, run_determine_change_entities(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_dce_restart_")
    staging = stage_events(spark, sf_dir, os.path.join(wd, "staging_events"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_dce_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    # "Crash" after the first time slice: only file 0 exists.
    first = run_determine_change_entities(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    # Recovery: the remaining slices appear; restart with the same
    # checkpoint + stores. Batch split is now 1|2|1 files vs the
    # reference run's 2|2 — the answer must not care.
    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_determine_change_entities(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


@full_only  # 99 s: the sink's restart bookkeeping stays pinned by test_synchronize_docs_restart_is_noop
def test_synchronize_docs_mid_stream_restart(spark, sf_dir):
    """Crash the doc-graph dispatcher mid-stream and restart: batch ids
    recorded in the bucketed store plus checkpointed offsets must
    reproduce the one-shot final store, across a different batch
    split."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.synchronize_docs import (
        run_synchronize_appsearch,
    )
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    def rows(df):
        return sorted(map(str, (tuple(r) for r in df.collect())))

    wd_ref = tempfile.mkdtemp(prefix="m4i_sync_ref_")
    expected = rows(run_synchronize_appsearch(spark, sf_dir, wd_ref))

    wd = tempfile.mkdtemp(prefix="m4i_sync_restart_")
    staging = stage_events(spark, sf_dir, os.path.join(wd, "staging_events"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_sync_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    run_synchronize_appsearch(spark, sf_dir, wd)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = run_synchronize_appsearch(spark, sf_dir, wd)
    assert rows(final) == expected


def test_synchronize_docs_restart_is_noop(spark, sf_dir):
    """Restarting the doc-graph dispatcher pipeline against its
    checkpoint must neither re-run batches nor write a store version:
    offsets live in the checkpoint, applied batch ids in the store."""
    from m4i_flink_tasks_spark.streaming.synchronize_docs import (
        run_synchronize_appsearch,
    )

    workdir = tempfile.mkdtemp(prefix="m4i_syncdocs_restart_")
    first = run_synchronize_appsearch(spark, sf_dir, workdir)
    rows_first = sorted(map(tuple, first.collect()))
    store_root = os.path.join(workdir, "appsearch_docs")
    versions_first = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )

    second = run_synchronize_appsearch(spark, sf_dir, workdir)
    assert sorted(map(tuple, second.collect())) == rows_first
    versions_second = len(
        [d for d in os.listdir(store_root) if d.startswith("v")]
    )
    assert versions_second == versions_first


def test_corpus_ingest_keep_first_across_batches(spark):
    """A duplicate text body arriving in a LATER batch must lose to the
    first acceptance (and must not violate the insert-only store's
    key-uniqueness invariant by appending a second row for the same
    fingerprint). The driver corpus happens to contain no cross-batch
    duplicates, so this pins the code path with synthetic ones."""
    from m4i_flink_tasks_spark.streaming.corpus_ingest import (
        DOC_STREAM_SCHEMA,
        ingest_batch,
    )
    from m4i_flink_tasks_spark.streaming.store import (
        BucketedParquetUpsertStore,
    )

    dup = "the cat and the dog of the house is to be good here"
    other = "the red fox and the old owl of the barn is to be wise now"
    store = BucketedParquetUpsertStore(
        spark,
        tempfile.mkdtemp(prefix="m4i_ci_keepfirst_"),
        key_cols=["fingerprint"],
    )
    b1 = spark.createDataFrame(
        [(1, dup, "en", "s0", len(dup))], DOC_STREAM_SCHEMA
    )
    b2 = spark.createDataFrame(
        [(2, dup, "en", "s0", len(dup)), (3, other, "en", "s1", len(other))],
        DOC_STREAM_SCHEMA,
    )
    ingest_batch(store, b1, 0)
    ingest_batch(store, b2, 1)
    rows = store.current().select("doc_id", "fingerprint").collect()
    by_fp: dict[int, list[int]] = {}
    for r in rows:
        by_fp.setdefault(r["fingerprint"], []).append(r["doc_id"])
    assert all(len(ids) == 1 for ids in by_fp.values()), by_fp
    assert sorted(d for ids in by_fp.values() for d in ids) == [1, 3]


def test_near_dedup_mid_stream_restart(spark, sf_dir):
    """Kill the streaming near-dedup mid-stream and restart: band-index,
    signature and accepted stores plus checkpointed offsets must
    reproduce the one-shot survivor set — including near-dup drops
    whose earlier half was seen before the crash."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.corpus_ingest import stage_documents
    from m4i_flink_tasks_spark.streaming.near_dedup import (
        run_stream_near_dedup,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_nd_ref_")
    expected = sorted(
        map(tuple, run_stream_near_dedup(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_nd_restart_")
    staging = stage_documents(spark, sf_dir, os.path.join(wd, "staging_docs"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_nd_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_near_dedup(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_near_dedup(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_corpus_ingest_mid_stream_restart(spark, sf_dir):
    """Kill the streaming corpus curation mid-stream and restart: the
    fingerprint-keyed insert-only store plus checkpointed offsets must
    reproduce the one-shot accepted corpus — including keep-first
    dedup decisions that now straddle the crash point (a duplicate
    arriving after the restart must still lose to a pre-crash
    acceptance)."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.corpus_ingest import (
        run_corpus_ingest,
        stage_documents,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_ci_ref_")
    expected = sorted(
        map(tuple, run_corpus_ingest(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_ci_restart_")
    staging = stage_documents(spark, sf_dir, os.path.join(wd, "staging_docs"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_ci_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_corpus_ingest(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_corpus_ingest(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_scd2_mid_stream_restart(spark, sf_dir):
    """Kill the streaming SCD2 maintenance mid-way and restart: the
    user-keyed dimension store plus checkpointed offsets must
    reproduce the one-shot dimension — including interval closes and
    version renumbers that straddle the crash point (a user whose
    status changes again after the restart must get the pre-crash open
    row closed)."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.scd2 import (
        run_stream_scd2,
        stage_events,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_scd2_ref_")
    expected = sorted(
        map(tuple, run_stream_scd2(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_scd2_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_scd2_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_scd2(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_scd2(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_windowed_distinct_mid_stream_restart(spark, sf_dir):
    """Kill the per-window sketch stream mid-way and restart: the
    window-keyed sketch state plus checkpointed offsets must reproduce
    the one-shot answer (batch-id replay contract on the keyed combine
    path, second key shape after the per-group sketch)."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.sketch_state import (
        run_stream_windowed_distinct,
    )
    from m4i_flink_tasks_spark.streaming.sources import stage_events

    wd_ref = tempfile.mkdtemp(prefix="m4i_wdu_ref_")
    expected = sorted(
        map(
            tuple,
            run_stream_windowed_distinct(spark, sf_dir, wd_ref).collect(),
        )
    )

    wd = tempfile.mkdtemp(prefix="m4i_wdu_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_wdu_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_windowed_distinct(spark, sf_dir, wd)
    assert 0 < first.count() < len(expected) + 1

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_windowed_distinct(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_semantic_dedup_mid_stream_restart(spark, sf_dir):
    """Kill the streaming SemDeDup mid-stream and restart: cluster
    index, member and verdict stores plus checkpointed offsets must
    reproduce the one-shot verdicts — including duplicates whose
    lower-id neighbor was seen before the crash."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.ann_index import stage_embeddings
    from m4i_flink_tasks_spark.streaming.semantic_dedup import (
        run_stream_semantic_dedup,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_sd_ref_")
    expected = sorted(
        map(tuple, run_stream_semantic_dedup(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_sd_restart_")
    staging = stage_embeddings(spark, sf_dir, os.path.join(wd, "staging_emb"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_sd_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_semantic_dedup(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_semantic_dedup(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected

    # Cross-crash duplicate: at least one post-crash vector must be
    # flagged against a pre-crash neighbor (the state actually worked).
    first_ids = {r.vec_id for r in first.collect()}
    crossed = [
        t for t in expected if t[0] not in first_ids and t[3]  # is_dup
    ]
    assert crossed, "no post-restart duplicate hit pre-crash state"


def test_media_ingest_mid_stream_restart(spark, sf_dir):
    """Kill the streaming media ingest mid-stream and restart: the
    insert-only catalog plus checkpointed offsets must reproduce the
    one-shot demuxed catalog."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.media_ingest import (
        run_stream_media_ingest,
        stage_media,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_mi_ref_")
    expected = sorted(
        map(tuple, run_stream_media_ingest(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_mi_restart_")
    staging = stage_media(spark, sf_dir, os.path.join(wd, "staging_media"), 4)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_mi_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_media_ingest(spark, sf_dir, wd)
    n_first = first.count()
    assert 0 < n_first < len(expected)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_media_ingest(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_rate_anomalies_stream_equals_batch(spark, sf_dir):
    import tempfile

    from m4i_flink_tasks_spark.queries.streaming_like import (
        event_rate_anomalies,
    )
    from m4i_flink_tasks_spark.streaming.windowed import (
        run_stream_rate_anomalies,
    )

    wd = tempfile.mkdtemp(prefix="m4i_anomaly_")
    got = sorted(
        map(tuple, run_stream_rate_anomalies(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, event_rate_anomalies(spark, sf_dir).collect())
    )
    assert got == exp and got


def test_rate_anomalies_mid_stream_restart(spark, sf_dir):
    """The hourly-count store is a keyed upsert with checkpointed
    batch ids, so a restart over a partially-processed event stream
    must land on the identical scored report."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from m4i_flink_tasks_spark.queries.streaming_like import (
        event_rate_anomalies,
    )
    from m4i_flink_tasks_spark.streaming.sources import stage_events
    from m4i_flink_tasks_spark.streaming.windowed import (
        run_stream_rate_anomalies,
    )

    wd = tempfile.mkdtemp(prefix="m4i_anomaly_restart_")
    staging = stage_events(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(_glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_anomaly_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_rate_anomalies(spark, sf_dir, wd)
    assert partial.count() >= 0  # partial stream may score few windows

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = sorted(
        map(tuple, run_stream_rate_anomalies(spark, sf_dir, wd).collect())
    )
    exp = sorted(
        map(tuple, event_rate_anomalies(spark, sf_dir).collect())
    )
    assert final == exp


def test_markov_attribution_mid_stream_restart(spark, sf_dir):
    """Kill the streaming attribution maintenance mid-stream and
    restart: transition-count monoid, per-user last-touch state and
    checkpointed offsets must reproduce the one-shot report — including
    cross-batch edges whose first half (the user's last touch) was seen
    before the crash and journey tails that re-open after it."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.markov_state import (
        run_stream_markov_attribution,
        stage_event_topic,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_mk_ref_")
    expected = sorted(
        map(
            tuple,
            run_stream_markov_attribution(spark, sf_dir, wd_ref).collect(),
        )
    )

    wd = tempfile.mkdtemp(prefix="m4i_mk_restart_")
    staging = stage_event_topic(
        spark, sf_dir, os.path.join(wd, "staging_events"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_mk_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_markov_attribution(spark, sf_dir, wd)
    assert first.count() > 0  # partial-stream report still well-formed

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_markov_attribution(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_t_closeness_mid_stream_restart(spark, sf_dir):
    """Kill the streaming privacy monitor mid-stream and restart: the
    additive cell-count state plus checkpointed offsets must reproduce
    the one-shot audit."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.privacy_state import (
        run_stream_t_closeness,
        stage_customer_rows,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_tc_ref_")
    expected = sorted(
        map(tuple, run_stream_t_closeness(spark, sf_dir, wd_ref).collect())
    )

    wd = tempfile.mkdtemp(prefix="m4i_tc_restart_")
    staging = stage_customer_rows(
        spark, sf_dir, os.path.join(wd, "staging_customers"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_tc_hidden_")
    later = parts[2:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_t_closeness(spark, sf_dir, wd)
    assert first.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_t_closeness(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_sequential_ab_mid_stream_restart(spark, sf_dir):
    """Kill the streaming A/B monitor mid-stream and restart: the
    per-user idempotent-monoid state must reproduce the one-shot
    report — including users whose first exposure and conversion
    straddle the crash."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.ab_state import (
        run_stream_sequential_ab,
        stage_ab_events,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_ab_ref_")
    expected = sorted(
        map(
            tuple,
            run_stream_sequential_ab(spark, sf_dir, wd_ref).collect(),
        )
    )

    wd = tempfile.mkdtemp(prefix="m4i_ab_restart_")
    staging = stage_ab_events(
        spark, sf_dir, os.path.join(wd, "staging_ab"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_ab_hidden_")
    later = parts[2:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    first = run_stream_sequential_ab(spark, sf_dir, wd)
    assert first.count() > 0

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_sequential_ab(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_fs_linkage_mid_stream_restart(spark, sf_dir):
    """Kill the streaming FS linkage mid-stream and restart: block
    index, attribute and scored-pair stores plus checkpointed offsets
    must reproduce the one-shot band report — including pairs whose
    earlier record was seen before the crash."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.fs_linkage import (
        run_stream_fs_linkage,
        stage_customers,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_fs_ref_")
    expected = sorted(
        map(tuple, run_stream_fs_linkage(spark, sf_dir, wd_ref).collect())
    )
    assert expected, "no candidate pairs at this SF - vacuous test"

    wd = tempfile.mkdtemp(prefix="m4i_fs_restart_")
    staging = stage_customers(
        spark, sf_dir, os.path.join(wd, "staging_cust"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_fs_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    run_stream_fs_linkage(spark, sf_dir, wd)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_fs_linkage(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected


def test_fs_linkage_matches_batch_at_any_split(spark, sf_dir):
    """Batch-split invariance: 1-file and 4-file replays of the
    customer stream must both band-report exactly the batch query's
    answer (the pair-discovered-once argument in the module
    docstring)."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        fellegi_sunter_bands,
    )
    from m4i_flink_tasks_spark.streaming.fs_linkage import (
        run_stream_fs_linkage,
    )

    batch = sorted(
        map(tuple, fellegi_sunter_bands(spark, sf_dir).collect())
    )
    for n_files, per_trigger in ((1, None), (4, 1)):
        wd = tempfile.mkdtemp(prefix=f"m4i_fs_split{n_files}_")
        got = sorted(
            map(
                tuple,
                run_stream_fs_linkage(
                    spark,
                    sf_dir,
                    wd,
                    n_files=n_files,
                    max_files_per_trigger=per_trigger,
                ).collect(),
            )
        )
        assert got == batch, f"split {n_files}/{per_trigger} diverged"


def test_entity_clusters_mid_stream_restart(spark, sf_dir):
    """Kill the streaming match-graph maintenance mid-stream and
    restart: block index, name store, pair store and checkpointed
    offsets must reproduce the one-shot cluster report."""
    import glob
    import shutil

    from m4i_flink_tasks_spark.streaming.fs_linkage import (
        run_stream_entity_clusters,
        stage_customers,
    )

    wd_ref = tempfile.mkdtemp(prefix="m4i_erc_ref_")
    expected = sorted(
        map(
            tuple,
            run_stream_entity_clusters(spark, sf_dir, wd_ref).collect(),
        )
    )
    assert expected, "no clusters at this SF - vacuous test"

    wd = tempfile.mkdtemp(prefix="m4i_erc_restart_")
    staging = stage_customers(
        spark, sf_dir, os.path.join(wd, "staging_cust"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    assert len(parts) == 4
    hidden = tempfile.mkdtemp(prefix="m4i_erc_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    run_stream_entity_clusters(spark, sf_dir, wd)

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    second = run_stream_entity_clusters(spark, sf_dir, wd)
    assert sorted(map(tuple, second.collect())) == expected
