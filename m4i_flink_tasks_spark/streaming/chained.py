"""The four reference jobs composed into ONE topology, chained the way
the reference chains them through Kafka topics.

Reference wiring (SURVEY §0): get_entity publishes ENRICHED_ENTITIES;
publish_state and determine_change consume that topic; synchronize
consumes the downstream DETERMINED_CHANGES. Here each "topic" is a
staged file feed (the same Kafka stand-in every pipeline uses —
``streaming/sources.py``), and the chain adapter materializes job 1's
accepted event set as the downstream feed:

    events ──▶ job 1 (enrich + dead-letter) ──▶ enriched event ids
      enriched feed = events ⋉ enriched ids      (the "topic")
      ├──▶ job 2 publish_state   (versioned entity state)
      ├──▶ job 3 determine_change (full-entity CDC diffs)
      └──▶ job 4 synchronize      (doc-graph maintenance)

Every runner already short-circuits on a pre-staged
``<workdir>/staging_events`` (the idempotent-staging contract), so the
composition changes NOTHING inside the jobs — it only provides their
input feed, exactly how a topic switch would. The test asserts the
cross-job invariants a chained deployment relies on: downstream
outputs exist only for upstream-accepted events, dead letters stay
disjoint from successes, and the diff stream's users are a subset of
the enriched feed's.

Scale: the adapter is one semi-join of the raw feed against job 1's
accepted ids (key-only broadcast at dimension size, shuffle join past
broadcast size) and a ranged write — the cost a topic would charge
anyway. Reference parity: get_entity_job.py:86-126 feeding
publish_state_job.py:107-141 / determine_change_job.py:457-464 /
synchronize_elastic_job.py:167-175 over Kafka.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .determine_change import run_determine_change_entities
from .get_entity import run_get_entity
from .publish_state import run_publish_state
from .synchronize_docs import run_synchronize_appsearch


def _stage_filtered_feed(
    spark: SparkSession,
    sf_dir: str,
    accepted_ids: DataFrame,
    staging_dir: str,
    n_files: int = 4,
) -> str:
    """Materialize the chained 'topic': the raw event feed semi-joined
    to the upstream job's accepted event ids, staged in time order."""
    if os.path.exists(os.path.join(staging_dir, "_SUCCESS")):
        return staging_dir
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    feed = events.join(
        accepted_ids.select("event_id"), "event_id", "left_semi"
    )
    (
        feed.repartitionByRange(n_files, "ts_ms", "event_id")
        .write.mode("overwrite")
        .parquet(staging_dir)
    )
    parts = sorted(glob.glob(os.path.join(staging_dir, "part-*.parquet")))
    t0 = time.time() - len(parts) - 1
    for i, path in enumerate(parts):
        os.utime(path, (t0 + i, t0 + i))
    return staging_dir


def run_chained_pipeline(
    spark: SparkSession, sf_dir: str, workdir: str
) -> dict[str, DataFrame]:
    """Run jobs 1→{2,3,4} chained; return every terminal surface."""
    enriched, dead_1 = run_get_entity(
        spark, sf_dir, os.path.join(workdir, "job1")
    )
    accepted = enriched.select("event_id")

    downstream: dict[str, DataFrame] = {}
    for job in ("job2", "job3", "job4"):
        wd = os.path.join(workdir, job)
        os.makedirs(wd, exist_ok=True)
        _stage_filtered_feed(
            spark,
            sf_dir,
            accepted,
            os.path.join(wd, "staging_events"),
        )
    entity_state, dead_2 = run_publish_state(
        spark, sf_dir, os.path.join(workdir, "job2")
    )
    diffs = run_determine_change_entities(
        spark, sf_dir, os.path.join(workdir, "job3")
    )
    docs = run_synchronize_appsearch(
        spark, sf_dir, os.path.join(workdir, "job4")
    )
    downstream.update(
        enriched=enriched,
        dead_get_entity=dead_1,
        entity_state=entity_state,
        dead_publish_state=dead_2,
        diffs=diffs,
        docs=docs,
    )
    return downstream
