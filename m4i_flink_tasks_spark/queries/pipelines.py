"""End-to-end Structured Streaming pipeline queries (SURVEY §0, §3).

Each entry replays the ``events`` table as a bounded, time-ordered file
stream (micro-batched via ``maxFilesPerTrigger``) through one of the
reference's four jobs re-expressed in ``streaming/``, and returns the
**final materialized state** — which the DuckDB oracle recomputes as one
batch SQL statement over the same input. A hash match therefore proves
the incremental path (keyed state + ``foreachBatch`` merges across
micro-batches) converges to exactly the batch answer: the streaming/batch
duality the reference never had (its state lives in Elasticsearch and is
only eyeballed via stdout, README.md:19-25).

These run real streaming machinery (checkpoints, state store,
``applyInPandasWithState``), so they are slower than the batch queries —
they are correctness probes for the pipeline layer, not bench headliners.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _workdir(prefix: str) -> str:
    # Deliberately not cleaned up here: the returned DataFrame lazily
    # reads these files when the caller collects it.
    return tempfile.mkdtemp(prefix=f"m4i_spark_{prefix}_")


def stream_publish_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 2: versioned entity-state store built by keyed upsert per
    micro-batch (publish_state_job.py:49-104); poison records divert to
    the dead-letter channel (see stream_dead_letter_box)."""
    from ..streaming.publish_state import run_publish_state

    final, _dead = run_publish_state(spark, sf_dir, _workdir("publish_state"))
    return final.orderBy("doc_id")


_POISON_SQL = "(props IS NULL OR (event_type = 'error' AND value < 1.0))"

PUBLISH_STATE_SQL = f"""
WITH ranked AS (
    SELECT user_id || '_' || epoch_ms(ts) AS doc_id,
           user_id AS guid,
           epoch_ms(ts) AS update_time_ms,
           event_id,
           event_type,
           round(value, 6) AS value,
           props,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events
    WHERE NOT {_POISON_SQL}
)
SELECT doc_id, guid, update_time_ms, event_id, event_type, value, props
FROM ranked
WHERE rn = 1
ORDER BY doc_id
"""


def stream_dead_letter_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the dead-letter side channel of the publish_state run — one
    DeadLetterBox record per poison input (get_entity_job.py:60-82,
    DeadLetterBoxMessage.py:12-18)."""
    from ..streaming.publish_state import run_publish_state

    _final, dead = run_publish_state(spark, sf_dir, _workdir("dead_letter"))
    return dead.orderBy("event_id")


DEAD_LETTER_BOX_SQL = f"""
SELECT epoch_ms(ts) AS timestamp_ms,
       '{{"event_id":' || event_id || ',"user_id":' || user_id
           || ',"event_type":"' || event_type || '"}}' AS original_notification,
       'publish_state' AS job,
       CASE WHEN props IS NULL THEN 'missing payload'
            ELSE 'sub-threshold error value' END AS description,
       event_id
FROM events
WHERE {_POISON_SQL}
ORDER BY event_id
"""


def stream_determine_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 3: per-key stateful CDC — previous version from streaming
    state, not a per-record store query (determine_change_job.py:194-226)."""
    from ..streaming.determine_change import run_determine_change

    final = run_determine_change(spark, sf_dir, _workdir("determine_change"))
    return final.orderBy("event_id")


DETERMINE_CHANGE_SQL = """
SELECT event_id,
       user_id,
       round(value, 6) AS value,
       round(lag(value) OVER w, 6) AS prev_value,
       epoch_ms(lag(ts) OVER w) AS prev_ts_ms,
       CASE WHEN lag(ts) OVER w IS NULL THEN 'EntityCreated'
            WHEN value <> lag(value) OVER w THEN 'EntityValueAudit'
            ELSE 'EntityUnchanged' END AS change_kind
FROM events
WHERE props IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
"""


def stream_determine_change_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 3 over FULL entity payloads: keyed streaming state holds the
    last complete entity version (attributes map + relationshipAttributes
    map), and each event emits an EntityMessage-shaped diff — inserted/
    changed/deleted attributes plus added/deleted relationship guids per
    key (determine_change_job.py:230-425, AtlasEntityChangeMessage.py:12-30).
    The oracle recomputes every diff with lag() over the same entity
    construction — a hash match proves the incremental map-diff state
    machine equals the batch as-of answer."""
    from ..streaming.determine_change import run_determine_change_entities

    final = run_determine_change_entities(
        spark, sf_dir, _workdir("determine_change_entities")
    )
    return final.orderBy("event_id")


DETERMINE_CHANGE_ENTITIES_SQL = """
WITH base AS (
    SELECT event_id, user_id, ts, event_type, value,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE props IS NOT NULL
), ent AS (
    SELECT event_id, user_id, ts,
           event_type AS a_et,
           CAST(floor(value * 100) AS BIGINT) AS a_vc,
           CASE WHEN k % 2 = 0 THEN k END AS a_k,
           list_sort(list_distinct(['CH' || (k % 4), 'CH' || (user_id % 4)]))
               AS r_channel,
           CASE WHEN value >= 5.0 THEN ['F' || (k % 3)]
                ELSE CAST([] AS VARCHAR[]) END AS r_flags
    FROM base
    WHERE k IS NOT NULL
), lagged AS (
    SELECT *,
           (lag(event_id) OVER w IS NULL) AS created,
           lag(a_et) OVER w AS p_et,
           lag(a_vc) OVER w AS p_vc,
           lag(a_k) OVER w AS p_k,
           lag(r_channel) OVER w AS p_channel,
           lag(r_flags) OVER w AS p_flags
    FROM ent
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
), rel AS (
    SELECT *,
           CASE WHEN created THEN r_channel
                ELSE list_filter(r_channel, x -> NOT list_contains(p_channel, x))
           END AS add_channel,
           CASE WHEN created THEN CAST([] AS VARCHAR[])
                ELSE list_filter(p_channel, x -> NOT list_contains(r_channel, x))
           END AS del_channel,
           CASE WHEN created THEN r_flags
                ELSE list_filter(r_flags, x -> NOT list_contains(p_flags, x))
           END AS add_flags,
           CASE WHEN created THEN CAST([] AS VARCHAR[])
                ELSE list_filter(p_flags, x -> NOT list_contains(r_flags, x))
           END AS del_flags
    FROM lagged
), diffs AS (
    SELECT event_id, user_id, created,
           coalesce(array_to_string(list_filter([
               CASE WHEN created THEN 'event_type=' || a_et END,
               CASE WHEN a_k IS NOT NULL AND (created OR p_k IS NULL)
                    THEN 'k=' || a_k END,
               CASE WHEN created THEN 'value_cents=' || a_vc END
           ], x -> x IS NOT NULL), '|'), '') AS inserted_attrs,
           coalesce(array_to_string(list_filter([
               CASE WHEN NOT created AND a_et <> p_et
                    THEN 'event_type=' || a_et END,
               CASE WHEN NOT created AND a_k IS NOT NULL AND p_k IS NOT NULL
                         AND a_k <> p_k THEN 'k=' || a_k END,
               CASE WHEN NOT created AND a_vc <> p_vc
                    THEN 'value_cents=' || a_vc END
           ], x -> x IS NOT NULL), '|'), '') AS changed_attrs,
           coalesce(array_to_string(list_filter([
               CASE WHEN NOT created AND a_k IS NULL AND p_k IS NOT NULL
                    THEN 'k' END
           ], x -> x IS NOT NULL), '|'), '') AS deleted_attrs,
           coalesce(array_to_string(list_filter([
               CASE WHEN len(add_channel) > 0
                    THEN 'channel:' || array_to_string(add_channel, ',') END,
               CASE WHEN len(add_flags) > 0
                    THEN 'flags:' || array_to_string(add_flags, ',') END
           ], x -> x IS NOT NULL), '|'), '') AS added_rels,
           coalesce(array_to_string(list_filter([
               CASE WHEN len(del_channel) > 0
                    THEN 'channel:' || array_to_string(del_channel, ',') END,
               CASE WHEN len(del_flags) > 0
                    THEN 'flags:' || array_to_string(del_flags, ',') END
           ], x -> x IS NOT NULL), '|'), '') AS deleted_rels
    FROM rel
)
SELECT event_id, user_id,
       CASE WHEN created THEN 'EntityCreated'
            WHEN inserted_attrs = '' AND changed_attrs = ''
                 AND deleted_attrs = '' AND added_rels = ''
                 AND deleted_rels = '' THEN 'EntityUnchanged'
            ELSE 'EntityChanged' END AS change_kind,
       inserted_attrs, changed_attrs, deleted_attrs, added_rels, deleted_rels
FROM diffs
ORDER BY event_id
"""


def stream_synchronize_docstore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 4: incrementally maintained denormalized doc store —
    associative per-batch combine (synchronize_elastic_job.py:55-142)."""
    from ..streaming.synchronize import run_synchronize

    final = run_synchronize(spark, sf_dir, _workdir("synchronize"))
    return final.orderBy("guid")


SYNCHRONIZE_SQL = """
WITH ranked AS (
    SELECT user_id, value, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
    WHERE props IS NOT NULL
), agg AS (
    SELECT user_id AS guid,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           epoch_ms(max(ts)) AS last_ts_ms
    FROM events
    WHERE props IS NOT NULL
    GROUP BY user_id
)
SELECT agg.guid, agg.n_events, agg.sum_value, agg.min_value, agg.max_value,
       agg.event_types, agg.last_ts_ms,
       round(ranked.value, 6) AS last_value,
       ranked.event_type AS last_event_type
FROM agg
JOIN ranked ON ranked.user_id = agg.guid AND ranked.rn = 1
ORDER BY agg.guid
"""


def stream_synchronize_appsearch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 4 driving the REAL G26-G28 dispatcher: every micro-batch of
    EntityMessage diff events runs through ``plans.synchronize_plan``
    inside ``foreachBatch`` — doc creation (G23) under seeded domains,
    breadcrumb derivation (G9), derived-field inheritance (G15), deletes
    (Q7) and the D9 collapse — merging real APP_SEARCH_DOC rows into the
    versioned store (synchronize_elastic_job.py:55-142). The oracle
    recomputes the final doc store from each user's last event in one
    SQL statement; a hash match proves the incremental doc-graph
    maintenance converges to the batch answer."""
    from ..streaming.synchronize_docs import run_synchronize_appsearch

    final = run_synchronize_appsearch(spark, sf_dir, _workdir("synchronize_docs"))
    return final.select(
        "guid",
        "typename",
        "name",
        "referenceablequalifiedname",
        "sourcetype",
        F.array_join("m4isourcetype", "|").alias("m4isourcetype"),
        F.array_join("supertypenames", "|").alias("supertypenames"),
        "definition",
        "email",
        "parentguid",
        F.array_join("breadcrumbguid", "|").alias("breadcrumbguid"),
        F.array_join("breadcrumbname", "|").alias("breadcrumbname"),
        F.array_join("breadcrumbtype", "|").alias("breadcrumbtype"),
        "deriveddataownerguid",
        "deriveddomainleadguid",
    ).orderBy("guid")


SYNCHRONIZE_APPSEARCH_SQL = """
WITH last_event AS (
    SELECT user_id, event_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
    FROM events
    WHERE props IS NOT NULL
), winners AS (
    SELECT * FROM last_event WHERE rn = 1 AND event_type <> 'error'
), entity_docs AS (
    SELECT 'E' || user_id AS guid,
           'm4i_data_entity' AS typename,
           'U' || user_id || '~' || event_id AS name,
           'qn://E' || user_id AS referenceablequalifiedname,
           'Business' AS sourcetype,
           'm4i_data_entity' AS m4isourcetype,
           'Referenceable|m4i_data_entity|m4i_referenceable' AS supertypenames,
           event_type AS definition,
           'u' || user_id || '@ex.com' AS email,
           'D' || (user_id % 10) AS parentguid,
           'D' || (user_id % 10) AS breadcrumbguid,
           'Domain' || (user_id % 10) AS breadcrumbname,
           'm4i_data_domain' AS breadcrumbtype,
           CAST(NULL AS VARCHAR) AS deriveddataownerguid,
           'L' || (user_id % 10) AS deriveddomainleadguid
    FROM winners
), domain_docs AS (
    SELECT 'D' || i AS guid,
           'm4i_data_domain' AS typename,
           'Domain' || i AS name,
           'qn://D' || i AS referenceablequalifiedname,
           'Business' AS sourcetype,
           'm4i_data_domain' AS m4isourcetype,
           'Referenceable|m4i_data_domain|m4i_referenceable' AS supertypenames,
           CAST(NULL AS VARCHAR) AS definition,
           CAST(NULL AS VARCHAR) AS email,
           CAST(NULL AS VARCHAR) AS parentguid,
           '' AS breadcrumbguid,
           '' AS breadcrumbname,
           '' AS breadcrumbtype,
           CAST(NULL AS VARCHAR) AS deriveddataownerguid,
           'L' || i AS deriveddomainleadguid
    FROM range(10) t(i)
)
SELECT * FROM entity_docs
UNION ALL
SELECT * FROM domain_docs
ORDER BY guid
"""


def stream_get_entity_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Job 1: op-type filter + broadcast enrichment join + enveloped
    output — the per-record REST enrichment (S12 get_entity_by_guid,
    get_entity_job.py:42-43) re-expressed as a stream-static join
    (get_entity_job.py:27-82). The per-record Keycloak token fetch (S15,
    get_entity_job.py:37) has no analogue: auth is connector-level
    config resolved once per micro-batch, never per row."""
    from ..streaming.get_entity import run_get_entity

    final, _dead = run_get_entity(spark, sf_dir, _workdir("get_entity"))
    return final.orderBy("event_id")


GET_ENTITY_SQL = """
SELECT event_id,
       user_id,
       '{"kafka_notification":{"event_id":' || event_id
           || ',"user_id":' || user_id
           || ',"event_type":"' || event_type
           || '"},"atlas_entity":{"entity_name":"' || c_name
           || '","entity_nation":' || c_nationkey || '}}' AS envelope
FROM events
JOIN customer ON user_id = c_custkey
WHERE event_type IN ('signup', 'purchase', 'error')
ORDER BY event_id
"""


def stream_windowed_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling windows, update-mode merged — the
    final store must equal the one-shot batch aggregation
    (streaming/windowed.py)."""
    from ..streaming.windowed import run_windowed_counts

    final = run_windowed_counts(spark, sf_dir, _workdir("windowed"))
    return final.orderBy("window_start_ms", "event_type")


WINDOWED_SQL = """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start_ms, event_type
"""


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with watermark-bounded state
    (streaming/stream_dedup.py): every 10th event is re-delivered 30
    minutes later inside the stream; the final store must equal the
    plain distinct input."""
    from ..streaming.stream_dedup import run_stream_dedup

    final = run_stream_dedup(spark, sf_dir, _workdir("stream_dedup"))
    return final.orderBy("event_id")


STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type, round(value, 6) AS value
FROM events
ORDER BY event_id
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join
    (streaming/interval_join.py): each signup matched to the same
    user's purchases within the following hour; state bounded by the
    watermark + interval, not stream length."""
    from ..streaming.interval_join import run_interval_join

    final = run_interval_join(spark, sf_dir, _workdir("interval_join"))
    return final.orderBy("signup_event_id", "purchase_event_id")


INTERVAL_JOIN_SQL = """
SELECT s.event_id AS signup_event_id,
       p.event_id AS purchase_event_id,
       s.user_id,
       epoch_ms(p.ts) - epoch_ms(s.ts) AS delay_ms
FROM events s
JOIN events p
  ON s.user_id = p.user_id
 AND s.event_type = 'signup'
 AND p.event_type = 'purchase'
 AND p.ts >= s.ts
 AND p.ts <= s.ts + INTERVAL 1 HOUR
ORDER BY signup_event_id, purchase_event_id
"""


QUERIES = {
    "stream_get_entity_enrichment": stream_get_entity_enrichment,
    "stream_publish_state": stream_publish_state,
    "stream_dead_letter_box": stream_dead_letter_box,
    "stream_determine_change": stream_determine_change,
    "stream_determine_change_entities": stream_determine_change_entities,
    "stream_synchronize_docstore": stream_synchronize_docstore,
    "stream_synchronize_appsearch_docs": stream_synchronize_appsearch_docs,
    "stream_windowed_aggregation": stream_windowed_aggregation,
    "stream_dedup_within_watermark": stream_dedup_within_watermark,
    "stream_interval_join": stream_interval_join,
}

ORACLES = {
    "stream_get_entity_enrichment": GET_ENTITY_SQL,
    "stream_publish_state": PUBLISH_STATE_SQL,
    "stream_dead_letter_box": DEAD_LETTER_BOX_SQL,
    "stream_determine_change": DETERMINE_CHANGE_SQL,
    "stream_determine_change_entities": DETERMINE_CHANGE_ENTITIES_SQL,
    "stream_synchronize_docstore": SYNCHRONIZE_SQL,
    "stream_synchronize_appsearch_docs": SYNCHRONIZE_APPSEARCH_SQL,
    "stream_windowed_aggregation": WINDOWED_SQL,
    "stream_dedup_within_watermark": STREAM_DEDUP_SQL,
    "stream_interval_join": INTERVAL_JOIN_SQL,
}
