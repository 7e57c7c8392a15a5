"""Driver-facing query inventory.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB ANSI SQL over the same
parquet views).

The driver's correctness gate checks a bounded number of queries (50 in
round 1), so the declared surface is curated: ``all_queries()`` returns
exactly the ``DRIVER_QUERIES`` set — one proof row per SURVEY §2 operator
family, merged where several trivial proofs shared a family (e.g.
``row_transform_suite`` = P2+P3+P4+P12+P13+P14). Every declared query has
an oracle and a CORRECTNESS row; nothing ships unverified.

The remaining standalone forms stay registered via ``extra_queries()`` /
``extra_oracles()`` — they are redundant proofs of operators already
covered by a driver query, and are still pinned by the local pytest gate
(tests/test_oracle_parity.py) and used by bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytic_windows,
    cdc,
    collocations,
    doc_lifecycle,
    doc_maintenance,
    extended_relational,
    graph,
    graph_analytics,
    llm_corpus,
    llm_decontam,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    llm_text,
    pipelines,
    profiling,
    relational,
    sketches,
    state_store,
    streaming_like,
    subqueries,
    text_ranking,
    tpch_tail,
    warehouse,
)


_MODULES = (
    relational,
    extended_relational,
    subqueries,
    tpch_tail,
    cdc,
    state_store,
    graph,
    graph_analytics,
    doc_maintenance,
    doc_lifecycle,
    streaming_like,
    pipelines,
    llm_dedup,
    llm_similarity,
    llm_text,
    text_ranking,
    collocations,
    llm_corpus,
    llm_decontam,
    llm_multimodal,
    sketches,
    warehouse,
    analytic_windows,
    profiling,
)

# The declared driver surface: every SURVEY §2 operator family has exactly
# one proof row here (see COVERAGE.md for the query -> operator-ID map).
# Order = priority order the driver walks; all entries fit the gate budget.
#
# ROTATION (round 3): the gate caps the surface at 50 rows, so per the
# r2 verdict seven consolidated extras are rotated IN for independent
# driver attestation (q3, q6, top-N, rollup, cube, set ops, as-of join)
# and seven rows whose operators keep another green attestation are
# rotated OUT to extras (order_priority_counts, dead_letter_split,
# schema_introspection, parent_guid_extraction, doc_update_collapse,
# sliding_window_activity, ann_ivf_probe — each has a green driver row
# recorded in CORRECTNESS_r01/r02 and stays pytest-pinned; see
# COVERAGE.md rotation log).
#
# ROTATION (round 4): the r3 rotations were never judged (no
# CORRECTNESS_r03 was recorded), so the r3 rotated-in rows STAY declared
# until they get their first driver attestation. Six NEW rows rotate in
# (the r4 corpus-curation family: repetition_metrics, corpus_token_stats,
# corpus_sampling_splits, pii_scrub; plus the r3-built extras
# ann_multi_query_topk and training_corpus_filter) and six rows with
# green CORRECTNESS_r01/r02 attestations rotate out to extras
# (delete_by_id, language_id, dedup_simhash, skew_salted_join,
# direct_change_classifier, text_metrics — all stay pytest-pinned).
#
# ROTATION PLAN (next round, once the current 50 are attested): rotate
# in the strongest of the newer families —
# approx_distinct_kmv, bloom_semijoin_reduction,
# pagerank_power_iterations, scd2_user_status, scd2_point_in_time,
# stream_scd2_dimension, stream_distinct_sketch, stream_quantile_sample,
# stream_weighted_sample, table_profile,
# integrity_checks, jl_random_projection, and from the later r3 wave:
# q4_priority_exists / q21_sole_returner_suppliers (semi/anti shapes),
# q17_small_quantity_revenue (correlated-scalar rewrite),
# q11_important_parts / q12_shipclass_priority / q16_supplier_part_counts /
# q20_promotion_suppliers (the TPC-H tail — all 22 shapes now covered),
# triangle_count, tfidf_top_terms, bm25_search, pmi_collocations,
# rolling_30d_customer_revenue, stratified_fixed_k_sample,
# weighted_corpus_sample, temperature_mixture_sample —
# against rows that will then hold fresh attestations (candidates:
# q6_forecast_revenue, rollup_order_totals, cube_lineitem_stats,
# set_operations, tumbling_window_counts, breadcrumb_prefix_ops,
# store_filter_scan, corpus_token_stats, pii_scrub,
# multimodal_frame_sampling).
DRIVER_QUERIES: tuple[str, ...] = (
    # relational engine proofs (flagship bench queries; rotated in r3:
    # q3/q6/top-N/rollup/cube/set-op/as-of forms)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "top_orders_per_customer",
    "rollup_order_totals",
    "cube_lineitem_stats",
    "set_operations",
    "asof_join_orders_events",
    # CDC / diff kernels (P2-P4, P12-P14 merged; P5-P11; D1-D8; S3)
    "row_transform_suite",
    "attribute_diff",
    "diff_event_materialization",
    "attribute_flattening",
    "asof_previous_version",
    # state-store queries (Q1-Q7, S5-S8)
    "state_store_lookups",
    "store_filter_scan",
    # graph / hierarchy dimensions (G1, G4, S14)
    "type_hierarchy_ops",
    # doc-graph maintenance (G9-G25, D9)
    "breadcrumb_materialization",
    "rename_propagation",
    "breadcrumb_prefix_ops",
    "derived_field_lifecycle",
    "relationship_classification",
    "governance_role_update",
    "doc_creation",
    "attribute_update_application",
    "attribute_field_linkage",
    # G26-G28 dispatcher with relationship-audit cascades (single batch)
    "synchronize_rel_cascades",
    # event-time windows
    "tumbling_window_counts",
    "session_windows",
    # streaming pipelines (reference jobs 1-4 + streaming dedup/joins)
    "stream_get_entity_enrichment",
    "stream_publish_state",
    "stream_determine_change_entities",
    "stream_synchronize_appsearch_docs",
    "stream_dedup_within_watermark",
    "stream_interval_join",
    # LLM-pipeline: dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "neardup_components",
    # LLM-pipeline: similarity family (IVF probe rotated to extras in r3;
    # batched multi-query top-k rotated in r4)
    "ann_brute_force_topk",
    "ann_lsh_bucketed",
    "embedding_neardup_pairs",
    "ann_multi_query_topk",
    # LLM-pipeline: text analysis + corpus curation (r4 family)
    "document_fingerprints",
    "training_corpus_filter",
    "repetition_metrics",
    "corpus_token_stats",
    "corpus_sampling_splits",
    "pii_scrub",
    # LLM-pipeline: multimodal plumbing
    "multimodal_features",
    "multimodal_frame_sampling",
)


def _merged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        merged.update(mod.QUERIES)
    return merged


def _merged_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLES)
    return merged


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The declared driver surface, in priority order."""
    merged = _merged_queries()
    missing = [n for n in DRIVER_QUERIES if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_QUERIES not implemented: {missing}")
    return {name: merged[name] for name in DRIVER_QUERIES}


def all_oracles() -> dict[str, str]:
    merged = _merged_oracles()
    return {name: merged[name] for name in DRIVER_QUERIES if name in merged}


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Redundant standalone proofs kept for pytest + bench, not declared
    to the driver."""
    merged = _merged_queries()
    return {n: fn for n, fn in merged.items() if n not in DRIVER_QUERIES}


def extra_oracles() -> dict[str, str]:
    merged = _merged_oracles()
    return {n: sql for n, sql in merged.items() if n not in DRIVER_QUERIES}
