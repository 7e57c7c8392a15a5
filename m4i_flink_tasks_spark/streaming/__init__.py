"""Structured Streaming pipelines — the Spark-native re-expression of the
reference's four PyFlink DataStream jobs (SURVEY §0).

| Reference job (file in /root/reference/)            | Here |
|-----------------------------------------------------|------|
| get_entity  (scripts/get_entity_job.py:86-126)      | validated/enriched stream feeding publish_state |
| publish_state (scripts/publish_state_job.py:107-141)| ``publish_state.run_publish_state`` |
| determine_change (scripts/determine_change_job.py)  | ``determine_change.run_determine_change`` (scalar) / ``run_determine_change_entities`` (full payloads) |
| synchronize_app_search (scripts/synchronize_elastic_job.py) | ``synchronize_docs.run_synchronize_appsearch`` (real G26-G28 dispatcher); aggregate proxy in ``synchronize.run_synchronize`` |

Design: file-source streams (Kafka swaps in with one reader change),
``foreachBatch`` sinks with idempotent upsert semantics, and keyed state
via ``applyInPandasWithState`` replacing the reference's per-record
Elasticsearch round-trips. Every pipeline runs bounded with
``trigger(availableNow=True)`` so the DuckDB gate can hash-match the
final state against batch SQL.
"""

from .sources import EVENT_STREAM_SCHEMA, events_file_stream, stage_events
from .store import BucketedParquetUpsertStore, ParquetUpsertStore
from .get_entity import run_get_entity
from .publish_state import run_publish_state
from .determine_change import (
    run_determine_change,
    run_determine_change_entities,
)
from .heavy_hitters import run_stream_heavy_hitters
from .incremental_agg import run_incremental_pricing_summary
from .session_state import run_stream_sessions
from .synchronize import run_synchronize
from .synchronize_docs import run_synchronize_appsearch
from .windowed import run_windowed_counts

__all__ = [
    "EVENT_STREAM_SCHEMA",
    "events_file_stream",
    "stage_events",
    "BucketedParquetUpsertStore",
    "ParquetUpsertStore",
    "run_get_entity",
    "run_publish_state",
    "run_determine_change",
    "run_determine_change_entities",
    "run_incremental_pricing_summary",
    "run_stream_heavy_hitters",
    "run_stream_sessions",
    "run_synchronize",
    "run_synchronize_appsearch",
    "run_windowed_counts",
]
