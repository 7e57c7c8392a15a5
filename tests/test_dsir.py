"""DSIR importance-resampling invariants — the method's point, pinned
independently of the DuckDB hash match (which proves cross-engine value
equality but not that the selection behaves like DSIR)."""

from __future__ import annotations

from m4i_flink_tasks_spark.queries.quality_classifier import (
    _DSIR_K,
    _DSIR_TARGET,
    dsir_importance_resampling,
)


def test_dsir_upweights_the_target_domain(spark, sf_dir):
    """Documents from the target slice must score a higher MEAN log
    importance weight than the rest — the likelihood ratio is fit to
    prefer exactly them. (Individual overlaps are expected; the mean
    separating is the method working.)"""
    rows = dsir_importance_resampling(spark, sf_dir).collect()
    tgt = [r.log_w for r in rows if r.source in _DSIR_TARGET]
    rest = [r.log_w for r in rows if r.source not in _DSIR_TARGET]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_selects_exactly_topk_by_rounded_weight(spark, sf_dir):
    rows = dsir_importance_resampling(spark, sf_dir).collect()
    selected = {r.doc_id for r in rows if r.selected}
    assert len(selected) == min(_DSIR_K, len(rows))
    expected = {
        r.doc_id
        for r in sorted(rows, key=lambda r: (-r.log_w, r.doc_id))[:_DSIR_K]
    }
    assert selected == expected


def test_dsir_target_overrepresented_in_selection(spark, sf_dir):
    """The selected set must contain target-domain docs at a higher rate
    than the corpus base rate — importance RESAMPLING shifts the mix."""
    rows = dsir_importance_resampling(spark, sf_dir).collect()
    base = sum(r.source in _DSIR_TARGET for r in rows) / len(rows)
    sel = [r for r in rows if r.selected]
    sel_rate = sum(r.source in _DSIR_TARGET for r in sel) / len(sel)
    assert sel_rate > base


def test_dsir_gumbel_resampling_is_a_real_draw(spark, sf_dir):
    """Gumbel-top-k must (a) select exactly k, (b) overlap heavily with
    the deterministic top-k (the noise perturbs, the weights dominate),
    and (c) not equal it exactly at this corpus size — otherwise the
    noise column is dead code."""
    rows = dsir_importance_resampling(spark, sf_dir).collect()
    det = {r.doc_id for r in rows if r.selected}
    gum = {r.doc_id for r in rows if r.gumbel_selected}
    assert len(gum) == min(_DSIR_K, len(rows))
    assert len(det & gum) >= len(det) // 4
    assert det != gum
