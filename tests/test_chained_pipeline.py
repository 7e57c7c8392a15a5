"""The four jobs chained as one topology: cross-job invariants a real
deployment relies on (downstream consumes exactly what upstream
accepted; success and dead-letter channels partition the feed)."""

from __future__ import annotations

import tempfile

from m4i_flink_tasks_spark.streaming.chained import run_chained_pipeline

from .conftest import full_only


def _ids(df, col="event_id"):
    return {r[0] for r in df.select(col).collect()}


def test_chained_pipeline_invariants(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="m4i_chain_")
    out = run_chained_pipeline(spark, sf_dir, wd)

    accepted = _ids(out["enriched"])
    assert accepted, "job 1 accepted nothing"
    # Job 1's channels are disjoint.
    assert accepted.isdisjoint(_ids(out["dead_get_entity"]))

    # Job 2 consumed ONLY the chained feed, and split it cleanly.
    state_ids = _ids(out["entity_state"])
    dead2_ids = _ids(out["dead_publish_state"])
    assert state_ids <= accepted
    assert dead2_ids <= accepted
    assert state_ids.isdisjoint(dead2_ids)
    # D9 collapse may drop same-doc_id duplicates but never poison rows.
    assert len(state_ids) + len(dead2_ids) <= len(accepted)
    assert len(state_ids) > 0 and len(dead2_ids) > 0

    # Job 3 diffed every accepted event exactly once.
    assert _ids(out["diffs"]) == accepted

    # Job 4 materialized a doc store from the same feed.
    assert out["docs"].count() > 0


@full_only  # 132 s: full-topology re-run stability; invariants test keeps the default pin
def test_chained_pipeline_rerun_is_stable(spark, sf_dir):
    """Re-running the chained topology over the same workdir must be a
    no-op end to end (every stage's staging + checkpoint + batch-id
    contract holds through the composition)."""
    wd = tempfile.mkdtemp(prefix="m4i_chain_rerun_")
    first = run_chained_pipeline(spark, sf_dir, wd)
    snap = {
        k: sorted(map(tuple, df.collect())) for k, df in first.items()
    }
    second = run_chained_pipeline(spark, sf_dir, wd)
    for k, df in second.items():
        assert sorted(map(tuple, df.collect())) == snap[k], k
