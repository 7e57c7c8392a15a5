"""Semantic-dedup + ANN-evaluation invariants.

The DuckDB hash match (test_oracle_parity) proves cross-engine value
equality; these tests pin the SEMANTICS — the survivor rule, the recall
definition, and the multi-probe dominance guarantee — independently of
the oracle, so a bug mirrored into both engines still gets caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.llm_similarity import (
    _GATE_LSH_BITS,
    _QUERY_VEC_ID,
    _SEM_TAU,
    _TOPK,
    ann_multiprobe_topk,
    ann_recall_at_k,
    semantic_dedup,
)
from m4i_flink_tasks_spark.operators import similarity as S
from m4i_flink_tasks_spark.sources import load_table


def test_semantic_dedup_keep_first_survivor_rule(spark, sf_dir):
    out = semantic_dedup(spark, sf_dir).collect()
    # The lowest-id vector of every cluster has no lower-id neighbor,
    # so it must survive (nn_sim = sentinel -1, is_dup false).
    first_per_label: dict[int, int] = {}
    for r in out:
        first_per_label.setdefault(r.label, r.vec_id)
        first_per_label[r.label] = min(first_per_label[r.label], r.vec_id)
    by_id = {r.vec_id: r for r in out}
    for label, vid in first_per_label.items():
        r = by_id[vid]
        assert not r.is_dup and r.nn_sim == -1.0, (label, vid, r)
    # The gate is exactly nn_sim >= tau.
    for r in out:
        assert r.is_dup == (r.nn_sim >= _SEM_TAU), r
    # Non-degenerate at the smoke SF: some survivors, some duplicates
    # at tau (sf0.001 and sf0.01 both produce a mixed verdict).
    verdicts = {r.is_dup for r in out}
    assert verdicts == {True, False}


def test_semantic_dedup_is_cluster_scoped(spark, sf_dir):
    """nn_sim must come from the SAME cluster: recompute one flagged
    duplicate's best lower-id in-cluster cosine by brute force."""
    out = semantic_dedup(spark, sf_dir)
    dup = out.filter(F.col("is_dup")).orderBy("vec_id").first()
    emb = load_table(spark, sf_dir, "embeddings")
    target = emb.filter(F.col("vec_id") == dup.vec_id).select(
        F.col("embedding").alias("t_emb")
    )
    best = (
        emb.filter(
            (F.col("label") == dup.label) & (F.col("vec_id") < dup.vec_id)
        )
        .crossJoin(F.broadcast(target))
        .select(
            F.round(S.cosine(F.col("embedding"), F.col("t_emb")), 6).alias("sim")
        )
        .agg(F.max("sim").alias("m"))
        .first()
    )
    assert best.m == dup.nn_sim


def test_recall_at_k_counts_the_intersection(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r.vec_id for r in S.brute_force_topk(emb, _QUERY_VEC_ID, _TOPK).collect()
    }
    approx = {
        r.vec_id
        for r in S.lsh_bucketed_topk(
            emb, _QUERY_VEC_ID, _TOPK, bits=_GATE_LSH_BITS
        ).collect()
    }
    row = ann_recall_at_k(spark, sf_dir).first()
    assert row.k == _TOPK
    assert row.n_hits == len(exact & approx)
    assert row.recall == round(row.n_hits / _TOPK, 6)


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe candidates are a superset of the single bucket, and a
    candidate displaced from the top-k is only ever displaced by a
    higher-cosine vector (itself in the exact top-k), so multi-probe
    recall is >= single-probe recall — the operator's whole point."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r.vec_id for r in S.brute_force_topk(emb, _QUERY_VEC_ID, _TOPK).collect()
    }
    single = {
        r.vec_id
        for r in S.lsh_bucketed_topk(
            emb, _QUERY_VEC_ID, _TOPK, bits=_GATE_LSH_BITS
        ).collect()
    }
    multi_rows = ann_multiprobe_topk(spark, sf_dir).collect()
    multi = {r.vec_id for r in multi_rows}
    assert len(multi & exact) >= len(single & exact)
    assert len(multi_rows) <= _TOPK
    # Rerank order is exact cosine, descending, id tie-break.
    sims = [r.cosine_sim for r in multi_rows]
    assert sims == sorted(sims, reverse=True)
