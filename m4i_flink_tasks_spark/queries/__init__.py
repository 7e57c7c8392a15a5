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
    behavior,
    cdc,
    collocations,
    doc_lifecycle,
    doc_maintenance,
    entity_resolution,
    extended_relational,
    graph,
    graph_analytics,
    llm_corpus,
    llm_decontam,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    llm_text,
    lm_scoring,
    pipelines,
    profiling,
    quality_classifier,
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
    entity_resolution,
    streaming_like,
    pipelines,
    llm_dedup,
    llm_similarity,
    llm_text,
    lm_scoring,
    text_ranking,
    collocations,
    llm_corpus,
    llm_decontam,
    llm_multimodal,
    sketches,
    warehouse,
    analytic_windows,
    behavior,
    profiling,
    quality_classifier,
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
# ROTATION (round 4 — as built): CORRECTNESS_r03 WAS recorded after all
# (50/50 green, contrary to the stale note this paragraph replaces), so
# the whole r3-declared surface — including the r3 rotated-in relational
# rows and the early-r4 corpus rows — now holds fresh attestations.
# Also rotated out with r3 green rows during r3 development:
# delete_by_id, language_id, dedup_simhash, skew_salted_join,
# direct_change_classifier, text_metrics (green CORRECTNESS_r01/r02,
# pytest-pinned).
#
# ROTATION (round 4 — this round): sixteen rows whose operators all
# hold green CORRECTNESS_r03 rows rotate OUT to extras (q6_forecast_revenue,
# rollup_order_totals, cube_lineitem_stats, set_operations,
# top_orders_per_customer, asof_join_orders_events,
# tumbling_window_counts, store_filter_scan,
# attribute_flattening, asof_previous_version, document_fingerprints,
# corpus_token_stats, pii_scrub, ann_multi_query_topk,
# multimodal_frame_sampling, diff_event_materialization (D7 keeps its
# declared proof via stream_determine_change_entities) — every §2
# operator they prove keeps either
# another declared row or its r3 attestation + the pytest parity pin),
# and the sixteen strongest never-attested extras rotate IN: the TPC-H
# tail (q11_important_parts, q12_shipclass_priority,
# q16_supplier_part_counts, q20_promotion_suppliers), the semi/anti and
# correlated-scalar shapes (q4_priority_exists,
# q21_sole_returner_suppliers, q17_small_quantity_revenue),
# triangle_count, tfidf_top_terms, bm25_search, pmi_collocations, the
# SCD2 pair (scd2_user_status, scd2_point_in_time), and the streaming
# mergeable-state family (stream_quantile_sample, stream_weighted_sample,
# stream_distinct_sketch).
#
# ROTATION PLAN (next round, once the current 50 are attested): rotate
# in the remaining unattested extras — strongest first: the round-4
# builds (ngram_lm_perplexity, lm_head_sample, duplicate_span_stats,
# top_duplicate_spans, stream_duplicate_spans, pq_encode, pq_adc_topk,
# ivfpq_adc_topk, quality_classifier_scores, corpus_filter_audit,
# media_quality_filter, approx_distinct_hll, stream_hll_distinct,
# stream_interval_join_left, bpe_merge_table, semantic_dedup,
# ann_recall_at_k, ann_multiprobe_topk, multimodal_container_demux,
# dsir_importance_resampling, stream_semantic_dedup,
# curriculum_shards, source_vocab_overlap, split_drift_psi,
# dedup_ngram_containment, stream_media_ingest,
# dedup_impact_report, language_confusion_matrix,
# audio_spectral_profile, approx_freq_countmin,
# stream_countmin_freq, image_perceptual_dedup,
# image_perceptual_neardup, stream_image_dedup,
# document_chunking, stream_audio_ingest,
# length_bucketed_batching, corpus_version_diff,
# embedding_health_report, audio_energy_segments,
# event_rate_anomalies, join_skew_report,
# stream_rate_anomalies, markup_text_extraction,
# supplier_cooccurrence_rules, user_retention_cohorts,
# rfm_segments, funnel_conversion, attribution_report,
# seasonal_naive_forecast, exp_smoothing_backtest, ab_test_report,
# label_propagation_communities, k_core_peeling,
# entity_match_clusters, inverted_postings, revenue_trend_slopes,
# k_anonymity_audit, pareto_frontier_parts, bucketed_colocated_join,
# exact_median_twopass, price_tier_revenue, stream_trend_slopes,
# stream_pareto_frontier, schema_evolution_read,
# ppjoin_exact_jaccard — all oracle-backed),
# then approx_distinct_kmv, bloom_semijoin_reduction,
# pagerank_power_iterations, stream_scd2_dimension, table_profile,
# integrity_checks, jl_random_projection,
# rolling_30d_customer_revenue, nation_revenue_distribution,
# stratified_fixed_k_sample, weighted_corpus_sample,
# temperature_mixture_sample, zorder_mapping, sequence_packing,
# hard_negative_mining, kmeans_refine — against rows that will then
# hold fresh r4 attestations (candidates: q3, q5, session_windows,
# neardup_components, embedding_neardup_pairs, repetition_metrics,
# corpus_sampling_splits, and this round's sixteen rotated-in rows).
DRIVER_QUERIES: tuple[str, ...] = (
    # relational engine proofs (flagship bench queries)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    # TPC-H tail + subquery shapes (rotated in r4)
    "q4_priority_exists",
    "q11_important_parts",
    "q12_shipclass_priority",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q20_promotion_suppliers",
    "q21_sole_returner_suppliers",
    # CDC / diff kernels (P2-P4, P12-P14 merged; P5-P11; D1-D8; S3)
    "row_transform_suite",
    "attribute_diff",
    # state-store queries (Q1-Q7, S5-S8)
    "state_store_lookups",
    # graph / hierarchy dimensions (G1, G4, S14)
    "type_hierarchy_ops",
    "triangle_count",
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
    "session_windows",
    # warehouse dimension maintenance (rotated in r4)
    "scd2_user_status",
    "scd2_point_in_time",
    # streaming pipelines (reference jobs 1-4 + streaming dedup/joins)
    "stream_get_entity_enrichment",
    "stream_publish_state",
    "stream_determine_change_entities",
    "stream_synchronize_appsearch_docs",
    "stream_dedup_within_watermark",
    "stream_interval_join",
    # streaming mergeable-state family (rotated in r4)
    "stream_quantile_sample",
    "stream_weighted_sample",
    "stream_distinct_sketch",
    # LLM-pipeline: dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "neardup_components",
    # LLM-pipeline: similarity family
    "ann_brute_force_topk",
    "ann_lsh_bucketed",
    "embedding_neardup_pairs",
    # LLM-pipeline: text analysis + ranking + corpus curation
    "training_corpus_filter",
    "repetition_metrics",
    "corpus_sampling_splits",
    "tfidf_top_terms",
    "bm25_search",
    "pmi_collocations",
    # LLM-pipeline: multimodal plumbing
    "multimodal_features",
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
