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
    hybrid_retrieval,
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
    hybrid_retrieval,
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
# ROTATION (round 5 — this round): CORRECTNESS_r04 recorded ALL 50
# declared rows green, so for the first time every declared row holds a
# fresh same-round attestation and the whole surface can rotate at once.
# Per the r4 verdict's top item ("burn down the 128-query attestation
# debt"), all 50 slots rotate to never-attested extras — the verdict's
# named sixteen (lm-scoring span family, PQ/IVF-PQ, quality classifier,
# SemDeDup, recall@k, PPJoin, perceptual image dedup, markup
# extraction, HLL, and the streaming twins) plus the strongest
# remainder: the r4 eighth wave (CUPED, drawdown, exact-median state,
# corrupt-record quarantine), the rest of the streaming state family
# (SCD2, Pareto, OLS trends, rate anomalies, left interval join, media
# ingest), the corpus-curation set (chunking, curriculum, DSIR, vocab
# overlap, PSI drift, version diff, filter audit, length bucketing,
# confusion matrix, BPE), audio container analytics, and the new
# container_quality_filter. Every rotated-out row keeps its green
# CORRECTNESS_r04 attestation + the every-round pytest parity pin
# (tests/test_oracle_parity.py — same SF, same rows/schema/hash check
# as the driver gate); see COVERAGE.md rotation log.
#
# ROTATION (round 6 — this round): CORRECTNESS_r05 recorded ALL 50
# declared rows green (the full-rotation surface), so every r5 row
# rotates OUT with a fresh same-round attestation + the every-round
# pytest parity pin. Per the r5 verdict's top item, all 50 slots go to
# never-attested rows (judge-recounted debt: 96 of 240 after the twelve
# late-r5 additions): the late-r5 table-maintenance/sketch/WARC wave
# (flac_stream_info, compaction_plan, zone_map_pruning_report,
# manifest_partition_pruning, selfjoin_size_estimate,
# kmv_set_operations, numeric_correlation_matrix,
# warc_response_extraction + the four streaming twins and
# stream_warc_ingest), the new r6 capstone warc_text_pipeline and the
# r6 streaming twins (stream_session_windows, stream_ann_index_topk —
# the r5 verdict's item 6), the behavioral/retention set
# (user_retention_cohorts, weekly_retention, rfm_segments,
# attribution_report, ab_test_report, event_funnel), forecasting/
# anomaly (seasonal_naive_forecast, exp_smoothing_backtest,
# revenue_trend_slopes, event_rate_anomalies, daily_anomaly_zscores),
# graph (label_propagation_communities, k_core_peeling,
# pagerank_power_iterations, degree_distribution,
# entity_match_clusters), IR/text (inverted_postings, token_stats,
# word_entropy_quality), profiling/warehouse (table_profile,
# integrity_checks, join_skew_report, k_anonymity_audit,
# schema_evolution_read, bucketed_colocated_join,
# bloom_semijoin_reduction), sketches (approx_distinct_kmv,
# approx_freq_countmin, exact_median_twopass), and the LLM tail
# (lm_head_sample, jl_random_projection, hard_negative_mining,
# sequence_packing, stream_windowed_distinct).
#
# ROTATION (round 8 — this round): CORRECTNESS_r07 recorded all 50
# declared rows green (the third consecutive 100%-first-time surface),
# so the r7 surface rotates OUT with fresh attestations and this round
# declares EVERY remaining never-attested row — the full debt-retiring
# tranche named in COVERAGE.md's machine-checked ledger (the exact
# membership and counts are derived live by
# tests/test_coverage_doc.py::test_attestation_debt_arithmetic, which
# is authoritative; this comment deliberately repeats no numbers).
# The spare slots are filled with the strongest previously-green §2
# proofs so the reference-parity surface (diff kernels, as-of, state
# store, hierarchy closure, synchronize cascades, publish/dead-letter
# streaming) re-attests concurrently, per the r7 verdict's item 1.
# When CORRECTNESS_r08 comes back green the attestation debt is zero;
# the post-debt STABLE surface policy is declared in COVERAGE.md.
#
# STABLE SURFACE (round 9 — this round): CORRECTNESS_r08 came back
# 50/50 green and retired the attestation debt, so the surface
# switches from rotation to the policy's STABLE selection
# (COVERAGE.md "Post-debt stable-surface policy"; the policy is data
# in queries/surface_policy.py, evaluated by
# tools/attestation_report.py and pinned by tests/test_coverage_doc.py).
# Rule citations per block are inline below; the per-row map is in
# COVERAGE.md's r9 surface log. Summary: rule 1 declares the five
# §2-critical streaming proofs and one row per heavy LLM family;
# rule 3 FIRES at r9 for all five §2 families (their newest driver
# rows date to r2-r4, older than the 4-round threshold), so the
# strongest row of every §2 sub-family re-enters; rule 2 gives each
# r9 newcomer a slot by displacing the most redundantly attested
# non-protected row (the tool's --candidates order).
DRIVER_QUERIES: tuple[str, ...] = (
    # --- rule 1: the five §2-critical streaming proofs, always declared ---
    "stream_determine_change",
    "stream_synchronize_docstore",
    "stream_publish_state",
    "stream_dead_letter_box",
    "stream_determine_change_entities",
    # --- rule 3 (staleness backstop, fires for every §2 family at r9) ---
    # S sources/sinks
    "state_store_lookups",
    "store_filter_scan",
    "stream_get_entity_enrichment",
    "direct_change_classifier",
    "type_hierarchy_ops",
    # P row transforms
    "row_transform_suite",
    "attribute_flattening",
    # D diff kernels (attribute_diff / asof_previous_version rotated out
    # at r10 by rule 2 — the tool's top displacement candidates, each
    # green r1-r4 + r9; the family floor holds via the three rows below
    # and test_stable_surface_policy re-checks it)
    "diff_event_materialization",
    "doc_update_collapse",
    # Q state-store queries
    "point_lookup",
    "array_membership",
    "multi_field_or",
    "batched_multiget",
    "schema_introspection",
    "delete_by_id",
    # G graph/hierarchy maintenance (breadcrumb_materialization /
    # breadcrumb_prefix_ops / attribute_field_linkage rotated out at
    # r10 by rule 2 — candidates 3-5 in the tool's order, each green
    # r2-r4 + r9; the G floor stays 11-deep)
    "supertype_closure",
    "source_type_classification",
    "parent_type_lookup",
    "derived_field_lifecycle",
    "governance_role_update",
    "rename_propagation",
    "parent_guid_extraction",
    "doc_creation",
    "synchronize_rel_cascades",
    "stream_synchronize_appsearch_docs",
    # --- rule 1: one row per heavy LLM-pipeline family ---
    "neardup_components",
    "ivfpq_adc_topk",
    "quality_classifier_scores",
    "dsir_importance_resampling",
    "warc_text_pipeline",
    "embedding_pca_power",
    "hdr_histogram_quantiles",
    # --- rule 2: in-round r9 newcomers (each oracle-green at three SFs
    # on arrival), each displacing the head of the tool's --candidates
    # order at the time it landed ---
    # the chained four-job topology (get_entity -> publish_state /
    # determine_change -> synchronize over one accepted-event 'topic'),
    # surfaced as a six-surface invariant report whose oracle composes
    # the four jobs' batch oracles around the accepted-feed CTE; its
    # slot came from attribute_update_application (G24/G25 keep their
    # r1-r4 rows + the G-family floor stays 14-deep)
    "stream_chained_topology",
    # streaming twins of the r8 text gates (the r8 verdict's item 7):
    # the shared per-document kernels folded into the corpus-ingest
    # stream with doc-keyed exactly-once state; the batch oracles
    # oracle the streams. Slots came from q1_pricing_summary and
    # q5_region_revenue (next in the tool's displacement order; both
    # keep r1-r4 rows and stay pytest- and bench-pinned).
    "stream_gopher_quality",
    "stream_intra_doc_dedup",
    # the differential-privacy release pair: the two-sided-geometric
    # (discrete Laplace) mechanism over the (event_type, month)
    # histogram with integer-exact threshold-table noise, batch
    # (queries/profiling.py) and as additive maintained cells
    # (streaming/dp_state.py) — the fourth privacy gate beside the
    # k-anon/l-div/t-closeness audit triad. Slots came from
    # relationship_classification and session_windows (next in the
    # tool's displacement order; G5-G8 keep their r1-r4 rows and run
    # inside the declared stream_synchronize_appsearch_docs dispatch
    # every round, sessionization keeps stream_session_windows' r6 row).
    "dp_noisy_histogram",
    "stream_dp_release",
    # --- spare slots: strongest stale rows; each is the row rule 2
    # displaces FIRST (tool --candidates order) as r9 newcomers land ---
    "stream_dedup_within_watermark",
    "dedup_exact",
    "embedding_neardup_pairs",
    # --- rule 2: the r10 newcomer tranche — the five late-r9 additions
    # ledgered as never-attested in the r9 verdict (each oracle-green
    # at three SFs in pytest on arrival). Slots came from the tool's
    # r10 --candidates order: attribute_diff, asof_previous_version,
    # attribute_field_linkage, breadcrumb_materialization,
    # breadcrumb_prefix_ops (each green r1-r4 + r9, most redundantly
    # attested; D keeps a 3-row floor, G an 11-row floor —
    # tests/test_coverage_doc.py::test_stable_surface_policy re-checks
    # both post-rotation).
    "hybrid_rrf_retrieval",
    "stream_hybrid_rrf",
    "conformal_keep_gate",
    "stream_conformal_gate",
    "fellegi_sunter_bands",
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
