"""Live-REST enrichment variant (S12): the batching contract and output
parity with the stream-static join, against an in-process HTTP server.

The whole point of the variant is the request SHAPE: one token fetch and
one bulk entity gather per Arrow batch — never a round-trip per record
(the reference's GetEntity.map does ≥2 per record,
scripts/get_entity_job.py:37-43). The server counts requests
server-side, so the assertion holds across Python worker processes.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.sources import load_table
from m4i_flink_tasks_spark.streaming.get_entity import enrich_events
from m4i_flink_tasks_spark.streaming.rest_enrichment import (
    RestEnrichmentConfig,
    enrich_events_live,
)


class _EntityService:
    """Keycloak + Atlas-bulk stand-in with request accounting."""

    def __init__(self, entities: dict[int, dict]):
        self.entities = {str(k): v for k, v in entities.items()}
        self.lock = threading.Lock()
        self.token_calls = 0
        self.bulk_calls = 0
        self.bulk_guid_lists: list[list[int]] = []
        self.bad_auth = 0

        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/token":
                    with service.lock:
                        service.token_calls += 1
                        tok = f"tok-{service.token_calls}"
                    out = {"access_token": tok}
                elif self.path == "/entities/bulk":
                    auth = self.headers.get("Authorization", "")
                    with service.lock:
                        service.bulk_calls += 1
                        service.bulk_guid_lists.append(list(body["guids"]))
                        if not auth.startswith("Bearer tok-"):
                            service.bad_auth += 1
                    out = {
                        "entities": {
                            str(g): service.entities[str(g)]
                            for g in body["guids"]
                            if str(g) in service.entities
                        }
                    }
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    @property
    def config(self) -> RestEnrichmentConfig:
        port = self.httpd.server_address[1]
        return RestEnrichmentConfig(
            token_url=f"http://127.0.0.1:{port}/token",
            bulk_url=f"http://127.0.0.1:{port}/entities/bulk",
        )

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def service():
    svc = _EntityService(
        {u: {"entity_name": f"Entity#{u}", "entity_nation": u % 25}
         for u in range(0, 400)}
    )
    yield svc
    svc.stop()


def test_one_token_and_one_gather_per_arrow_batch(spark, service):
    """120 accepted rows, one partition, Arrow batch size 50 -> exactly
    ceil(120/50) = 3 batches, so exactly 3 token calls and 3 bulk calls
    (NOT 120 of each, and ≥2 distinct guids per gather)."""
    rows = [(i, i % 40, "signup") for i in range(120)]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string"
    ).repartition(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = enrich_events_live(df, service.config).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(out) == 120
    assert service.token_calls == 3
    assert service.bulk_calls == 3
    assert service.bad_auth == 0
    # gathers are batched AND de-duplicated: each call carries the
    # distinct guids of its batch, bounded by the batch size
    for guids in service.bulk_guid_lists:
        assert 1 < len(guids) <= 50
        assert len(guids) == len(set(guids))
    assert all(r.enriched for r in out)


def test_unaccepted_ops_never_reach_the_service(spark, service):
    rows = [(1, 7, "signup"), (2, 8, "view"), (3, 9, "scroll")]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string"
    ).repartition(1)
    out = enrich_events_live(df, service.config).collect()
    assert [r.event_id for r in out] == [1]
    assert service.bulk_guid_lists == [[7]]  # filtered rows never queried


def test_live_output_matches_stream_static_join(spark, sf_dir):
    """Semantic parity: on identical data the live variant must produce
    byte-identical envelopes to the broadcast-join default (including
    the empty atlas_entity object on misses)."""
    events = load_table(spark, sf_dir, "events").limit(300)
    entities = load_table(spark, sf_dir, "customer")
    svc = _EntityService(
        {
            int(r.c_custkey): {
                "entity_name": r.c_name,
                "entity_nation": int(r.c_nationkey),
            }
            for r in entities.collect()
        }
    )
    try:
        live = sorted(
            map(tuple, enrich_events_live(events, svc.config).collect())
        )
        joined = sorted(map(tuple, enrich_events(events, entities).collect()))
        assert live == joined and live
        # both outcomes represented
        assert {t[2] for t in live} <= {True, False}
    finally:
        svc.stop()
