"""BucketedParquetUpsertStore — the bounded-merge contract, enforced.

The base store is O(store) per merge; the bucketed store must (a) give
byte-identical ANSWERS to the base store for any merge/delete sequence,
and (b) leave untouched buckets' files on disk untouched — merge cost
bounded by touched buckets, not store size (the posture Delta/Iceberg
MERGE file pruning gives at 100 TB).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.streaming.store import (
    BucketedParquetUpsertStore,
    ParquetUpsertStore,
)


def _rows(store):
    return sorted(map(tuple, store.current().collect()))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_bucketed_matches_flat_store_semantics(spark):
    root_b = tempfile.mkdtemp(prefix="m4i_bstore_")
    root_f = tempfile.mkdtemp(prefix="m4i_fstore_")
    b = BucketedParquetUpsertStore(spark, root_b, ["k"], n_buckets=4)
    f = ParquetUpsertStore(spark, root_f, ["k"])

    seed = _mk(spark, [(i, f"v{i}") for i in range(20)])
    upd = _mk(spark, [(3, "x3"), (7, "x7"), (40, "new")])
    dels = spark.createDataFrame([(5,), (40,)], "k long")
    for store in (b, f):
        store.merge(seed)
        store.merge(upd)
        store.delete(dels)
    assert _rows(b) == _rows(f)


def test_merge_rewrites_only_touched_buckets(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_touch_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=8)
    store.merge(_mk(spark, [(i, f"v{i}") for i in range(64)]))
    state0 = store._state()
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, "v*", "_bucket=*", "*.parquet"))
    }

    # One key -> one touched bucket.
    store.merge(_mk(spark, [(3, "updated")]))
    state1 = store._state()
    moved = [
        bkt
        for bkt in state0["buckets"]
        if state1["buckets"].get(bkt) != state0["buckets"][bkt]
    ]
    assert len(moved) == 1, f"expected 1 rewritten bucket, got {moved}"

    # Every pre-existing data file is still there, unmodified: untouched
    # buckets cost zero bytes of rewrite.
    for p, mtime in files_before.items():
        assert os.path.exists(p), f"pre-existing file removed: {p}"
        assert os.path.getmtime(p) == mtime, f"pre-existing file rewritten: {p}"

    got = dict(map(tuple, store.current().collect()))
    assert got[3] == "updated" and len(got) == 64


def test_bucketed_replay_skipped_by_batch_id(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_replay_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=4)
    store.merge(_mk(spark, [(1, "a")]), batch_id=0)

    def add_suffix(cur, batch):
        merged = cur.join(batch.select("k", F.col("v").alias("nv")), "k", "full_outer")
        return merged.select(
            "k", F.concat_ws("+", F.col("v"), F.col("nv")).alias("v")
        )

    store.merge(_mk(spark, [(1, "b")]), combine=add_suffix, batch_id=1)
    applied = _rows(store)
    assert applied == [(1, "a+b")]
    assert store.last_batch_id() == 1

    # Replayed non-idempotent combine must be a no-op.
    store.merge(_mk(spark, [(1, "b")]), combine=add_suffix, batch_id=1)
    assert _rows(store) == applied


def test_insert_only_appends_segment_without_reading_or_rewriting(spark):
    """The O(batch) append path: no pre-existing file is rewritten, no
    bucket is compacted — new keys land in fresh segments appended to
    the bucket lists."""
    root = tempfile.mkdtemp(prefix="m4i_bstore_append_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=4)
    store.merge(_mk(spark, [(i, f"v{i}") for i in range(32)]), batch_id=0)
    state0 = store._state()
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(root, "v*", "_bucket=*", "*.parquet"))
    }

    store.merge(
        _mk(spark, [(i, f"n{i}") for i in range(100, 132)]),
        batch_id=1,
        insert_only=True,
    )
    state1 = store._state()
    for bkt, segs in state0["buckets"].items():
        assert state1["buckets"][bkt][: len(segs)] == segs, (
            f"bucket {bkt} was compacted by an append"
        )
    for p, mtime in files_before.items():
        assert os.path.exists(p) and os.path.getmtime(p) == mtime, (
            f"append rewrote pre-existing file: {p}"
        )
    got = dict(map(tuple, store.current().collect()))
    assert len(got) == 64 and got[5] == "v5" and got[105] == "n105"

    # A later upsert still compacts the touched bucket back to one segment.
    store.merge(_mk(spark, [(5, "x5")]), batch_id=2)
    state2 = store._state()
    touched = [
        b
        for b in state2["buckets"]
        if state2["buckets"][b] != state1["buckets"].get(b)
    ]
    assert len(touched) == 1 and len(state2["buckets"][touched[0]]) == 1
    got = dict(map(tuple, store.current().collect()))
    assert len(got) == 64 and got[5] == "x5"


def test_append_segments_compact_at_threshold(spark):
    """Insert-only appends must not grow a bucket's segment list without
    bound: past max_segments the bucket folds to one segment (LSM-style
    amortization), with no data loss and untouched buckets untouched."""
    root = tempfile.mkdtemp(prefix="m4i_bstore_compact_")
    store = BucketedParquetUpsertStore(
        spark, root, ["k"], n_buckets=1, max_segments=3
    )
    for i in range(5):
        store.merge(
            _mk(spark, [(i * 10 + j, f"v{i}_{j}") for j in range(4)]),
            batch_id=i,
            insert_only=True,
        )
        segs = store._state()["buckets"]["0"]
        assert len(segs) <= 3, f"segment list grew unbounded: {segs}"
    got = dict(map(tuple, store.current().collect()))
    assert len(got) == 20 and got[0] == "v0_0" and got[43] == "v4_3"


def test_touch_keys_widens_bucket_set_for_combine_deletes(spark):
    """A combine that deletes keys ABSENT from the batch needs those
    keys' buckets in the touched set — touch_keys supplies them."""
    root = tempfile.mkdtemp(prefix="m4i_bstore_touchkeys_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=8)
    store.merge(_mk(spark, [(i, f"v{i}") for i in range(32)]), batch_id=0)

    deletes = spark.createDataFrame([(7,), (19,)], "k long")

    def upsert_and_delete(cur, batch):
        gone = batch.select("k").unionByName(deletes).distinct()
        return cur.join(F.broadcast(gone), "k", "left_anti").unionByName(batch)

    store.merge(
        _mk(spark, [(3, "x3")]),
        combine=upsert_and_delete,
        batch_id=1,
        touch_keys=deletes,
    )
    got = dict(map(tuple, store.current().collect()))
    assert got[3] == "x3" and 7 not in got and 19 not in got
    assert len(got) == 30  # 32 seeded - 2 deleted (key 3 updated in place)


def test_current_for_keys_plans_only_touched_bucket_files(spark):
    """The pruned snapshot read must plan ONLY the parquet files of
    buckets containing the requested keys (df.inputFiles() is the
    planned scan set) while still returning those buckets' full rows."""
    root = tempfile.mkdtemp(prefix="m4i_bstore_prune_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=8)
    store.merge(_mk(spark, [(i, f"v{i}") for i in range(64)]))

    keys = spark.createDataFrame([(3,)], "k long")
    pruned = store.current_for_keys(keys)
    all_files = set(store.current().inputFiles())
    pruned_files = set(pruned.inputFiles())
    assert pruned_files < all_files, "pruned read planned the whole store"
    assert len(pruned_files) <= len(all_files) // 2

    got = dict(map(tuple, pruned.collect()))
    assert got[3] == "v3"
    full = dict(map(tuple, store.current().collect()))
    assert all(full[k] == v for k, v in got.items())


def test_random_op_sequences_match_dict_model(spark):
    """The store is now load-bearing for every streaming sink, so pin
    its semantics against the obvious model: any interleaving of
    upserts, deletes, and insert-only appends (fresh keys) must leave
    ``current()`` equal to a plain dict replay — across bucket counts
    that force both multi-key buckets and compaction."""
    import itertools
    import random

    rng = random.Random(20260813)
    for trial, n_buckets in ((0, 2), (1, 3), (2, 8)):
        root = tempfile.mkdtemp(prefix=f"m4i_bstore_model_{trial}_")
        store = BucketedParquetUpsertStore(
            spark, root, ["k"], n_buckets=n_buckets, max_segments=2
        )
        model: dict[int, str] = {}
        fresh = itertools.count(1000)
        for step in range(6):
            op = rng.choice(["upsert", "delete", "append"])
            if op == "append":
                keys = [next(fresh) for _ in range(rng.randint(1, 4))]
                rows = [(k, f"a{step}_{k}") for k in keys]
                store.merge(_mk(spark, rows), batch_id=step, insert_only=True)
                model.update(dict(rows))
            elif op == "upsert":
                keys = rng.sample(range(16), rng.randint(1, 4)) + (
                    rng.sample(sorted(model), min(2, len(model))) if model else []
                )
                rows = [(k, f"u{step}_{k}") for k in set(keys)]
                store.merge(_mk(spark, rows), batch_id=step)
                model.update(dict(rows))
            else:
                keys = rng.sample(sorted(model), min(3, len(model))) if model else [99]
                store.delete(
                    spark.createDataFrame([(k,) for k in keys], "k long"),
                    batch_id=step,
                )
                for k in keys:
                    model.pop(k, None)
        cur = store.current()
        got = {} if cur is None else dict(map(tuple, cur.collect()))
        assert got == model, f"trial {trial} (n_buckets={n_buckets}) diverged"


def test_delete_emptied_bucket_leaves_pointer_map(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_empty_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=2)
    store.merge(_mk(spark, [(1, "a"), (2, "b")]))
    store.delete(spark.createDataFrame([(1,), (2,)], "k long"))
    cur = store.current()
    assert cur is None or cur.count() == 0


def test_time_travel_reads_committed_versions(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_tt_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=4)
    store.merge(_mk(spark, [(1, "a"), (2, "b")]), batch_id=0)
    store.merge(_mk(spark, [(2, "B"), (3, "c")]), batch_id=1)
    store.merge(_mk(spark, [(1, "A2")]), batch_id=2)

    hist = store.history()
    assert [h["batch_id"] for h in hist] == [0, 1, 2]
    v0, v1, v2 = (h["version"] for h in hist)
    assert sorted(map(tuple, store.read_version(v0).collect())) == [
        (1, "a"), (2, "b")]
    assert sorted(map(tuple, store.read_version(v1).collect())) == [
        (1, "a"), (2, "B"), (3, "c")]
    assert sorted(map(tuple, store.read_version(v2).collect())) == _rows(store)

    import pytest
    with pytest.raises(KeyError):
        store.read_version(v2 + 1)  # never committed


def test_vacuum_bounds_history_but_keeps_referenced_segments(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_vac_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=4)
    # keys chosen so the second merge touches a strict subset of buckets:
    store.merge(_mk(spark, [(k, f"v{k}") for k in range(8)]), batch_id=0)
    before = _rows(store)
    store.merge(_mk(spark, [(0, "V0")]), batch_id=1)
    expected = [(0, "V0")] + [t for t in before if t[0] != 0]

    hist = store.history()
    dropped = store.vacuum(keep_last=1)
    assert dropped == [hist[0]["version"]]
    # old version unreadable, current intact INCLUDING untouched buckets
    import pytest
    with pytest.raises(KeyError):
        store.read_version(hist[0]["version"])
    assert _rows(store) == sorted(expected)
    assert [h["version"] for h in store.history()] == [hist[1]["version"]]
    # the v0 version dir must SURVIVE the vacuum: untouched buckets of
    # the current map still point into it
    assert os.path.isdir(os.path.join(root, f"v{hist[0]['version']:06d}"))


def test_vacuum_removes_fully_unreferenced_version_dirs(spark):
    root = tempfile.mkdtemp(prefix="m4i_bstore_vac2_")
    store = BucketedParquetUpsertStore(spark, root, ["k"], n_buckets=2)
    store.merge(_mk(spark, [(1, "a"), (2, "b"), (3, "c"), (4, "d")]), batch_id=0)
    # rewrite EVERY bucket so version 0's segments become unreferenced
    store.merge(_mk(spark, [(1, "A"), (2, "B"), (3, "C"), (4, "D")]), batch_id=1)
    hist = store.history()
    v_old = hist[0]["version"]
    assert os.path.isdir(os.path.join(root, f"v{v_old:06d}"))
    store.vacuum(keep_last=1)
    assert not os.path.isdir(os.path.join(root, f"v{v_old:06d}"))
    assert _rows(store) == [(1, "A"), (2, "B"), (3, "C"), (4, "D")]
