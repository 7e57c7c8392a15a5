"""Streaming pipeline tests: bounded replay through real Structured
Streaming machinery must converge to the batch answer, and the upsert
store must honor MERGE semantics (upsert / delete / idempotent re-merge).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.pipelines import (
    stream_determine_change,
    stream_publish_state,
    stream_synchronize_docstore,
)
from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.store import ParquetUpsertStore

from .oracle_harness import compare
from .test_oracle_parity import ORACLES


def test_store_merge_upsert_delete_idempotent(spark):
    root = tempfile.mkdtemp(prefix="m4i_store_test_")
    store = ParquetUpsertStore(spark, root, key_cols=["k"])
    assert store.current() is None

    df = lambda rows: spark.createDataFrame(rows, "k long, v string")  # noqa: E731
    store.merge(df([(1, "a"), (2, "b")]))
    store.merge(df([(2, "b2"), (3, "c")]))
    got = {r.k: r.v for r in store.current().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}

    # Idempotency: replaying the same batch leaves the store unchanged.
    store.merge(df([(2, "b2"), (3, "c")]))
    assert {r.k: r.v for r in store.current().collect()} == got

    store.delete(spark.createDataFrame([(1,)], "k long"))
    assert {r.k: r.v for r in store.current().collect()} == {2: "b2", 3: "c"}


def test_publish_state_stream_matches_batch(spark, sf_dir):
    ok, msg = compare(
        spark, stream_publish_state, ORACLES["stream_publish_state"], sf_dir
    )
    assert ok, msg


def test_determine_change_stream_matches_batch(spark, sf_dir):
    ok, msg = compare(
        spark,
        stream_determine_change,
        ORACLES["stream_determine_change"],
        sf_dir,
    )
    assert ok, msg


def test_determine_change_kinds_are_complete(spark, sf_dir):
    out = stream_determine_change(spark, sf_dir)
    kinds = {r.change_kind for r in out.select("change_kind").distinct().collect()}
    assert "EntityCreated" in kinds
    assert kinds <= {"EntityCreated", "EntityValueAudit", "EntityUnchanged"}
    # Exactly one EntityCreated per key: the state seeded each guid once.
    n_keys = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    n_created = out.filter(F.col("change_kind") == "EntityCreated").count()
    assert n_created == n_keys


def test_synchronize_stream_matches_batch(spark, sf_dir):
    ok, msg = compare(
        spark,
        stream_synchronize_docstore,
        ORACLES["stream_synchronize_docstore"],
        sf_dir,
    )
    assert ok, msg
