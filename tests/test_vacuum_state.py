"""stream_vacuum_plan — the retention plan over the LIVE store's
version log, plus the physical half no SQL oracle can restate: which
version directories and snapshot files ``vacuum()`` actually deletes.
(Logical parity vs DuckDB is covered by tests/test_oracle_parity.py
like every other registered query.)
"""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from m4i_flink_tasks_spark.queries.warehouse import _VACUUM_RETAIN
from m4i_flink_tasks_spark.streaming.vacuum_state import (
    run_stream_vacuum_plan,
)


@pytest.fixture(scope="module")
def plan_and_workdir(spark, sf_dir):
    workdir = tempfile.mkdtemp(prefix="m4i_spark_test_vacuum_")
    plan = run_stream_vacuum_plan(spark, sf_dir, workdir).collect()
    return plan, workdir


def test_plan_covers_every_epoch_and_retains_exactly_keep_last(
    plan_and_workdir,
):
    plan, _ = plan_and_workdir
    versions = [r["version"] for r in plan]
    assert versions == list(range(len(plan)))  # one row per commit, dense
    assert [r["batch_id"] for r in plan] == versions  # batch == version
    retained = [r for r in plan if r["retained"]]
    assert len(retained) == _VACUUM_RETAIN
    for r in plan:
        assert r["retained"] == (not r["expired"])
        assert r["current_version"] == versions[-1]
    # state only grows: later versions hold at least as many keys
    keys = [r["n_keys"] for r in plan]
    assert keys == sorted(keys)


def test_vacuum_physically_deleted_exactly_the_expired_versions(
    plan_and_workdir,
):
    plan, workdir = plan_and_workdir
    root = os.path.join(workdir, "order_state")
    dirs = {
        int(os.path.basename(p)[1:])
        for p in glob.glob(os.path.join(root, "v*"))
        if os.path.basename(p)[1:].isdigit()
    }
    snaps = {
        int(os.path.basename(p)[len("_SNAP.v"):-len(".json")])
        for p in glob.glob(os.path.join(root, "_SNAP.v*.json"))
    }
    survivors = {r["version"] for r in plan if r["retained"]}
    assert dirs == survivors
    assert snaps == survivors


def test_time_travel_post_vacuum_matches_the_plan(
    plan_and_workdir, spark, sf_dir
):
    from m4i_flink_tasks_spark.streaming.store import (
        BucketedParquetUpsertStore,
    )

    plan, workdir = plan_and_workdir
    store = BucketedParquetUpsertStore(
        spark,
        os.path.join(workdir, "order_state"),
        key_cols=["o_custkey"],
        n_buckets=4,
    )
    newest_expired = max(
        (r["version"] for r in plan if r["expired"]), default=None
    )
    if newest_expired is not None:
        with pytest.raises(KeyError):
            store.read_version(newest_expired)
    current = plan[-1]
    assert store.current().count() == current["n_keys"]
    oldest_retained = min(r["version"] for r in plan if r["retained"])
    row = next(r for r in plan if r["version"] == oldest_retained)
    assert store.read_version(oldest_retained).count() == row["n_keys"]


def test_rerun_against_checkpoint_leaves_the_store_untouched(
    plan_and_workdir, spark, sf_dir
):
    """Restarting the drained pipeline against its checkpoint must not
    write a single new version or snapshot (the file source finds no
    new files; the batch-id fences are never even consulted), and the
    re-read plan over the post-vacuum store covers exactly the
    retained versions."""
    plan, workdir = plan_and_workdir
    root = os.path.join(workdir, "order_state")
    before = sorted(os.listdir(root))
    from m4i_flink_tasks_spark.streaming.vacuum_state import (
        run_stream_vacuum_plan,
    )

    replan = run_stream_vacuum_plan(spark, sf_dir, workdir).collect()
    assert sorted(os.listdir(root)) == before
    survivors = sorted(r["version"] for r in plan if r["retained"])
    assert sorted(r["version"] for r in replan) == survivors
    # per-version facts unchanged for the surviving versions
    by_v = {r["version"]: r for r in plan}
    for r in replan:
        assert r["n_keys"] == by_v[r["version"]]["n_keys"]
        assert r["total_cents"] == by_v[r["version"]]["total_cents"]
