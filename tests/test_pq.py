"""Product quantization: compression contract + retrieval quality.

Oracle parity (hash vs DuckDB) is covered by test_oracle_parity; this
file pins the semantics — codes are byte-ranged, the codebook is
actually used (not a constant), and ADC retrieval has non-trivial
recall against the exact scan it approximates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.llm_similarity import (
    _PQ_K,
    _PQ_M,
    _TOPK,
    ann_brute_force_topk,
    pq_adc_topk,
    pq_encode,
)


def test_codes_are_byte_ranged_and_diverse(spark, sf_dir):
    codes = pq_encode(spark, sf_dir)
    rows = codes.collect()
    assert rows
    for r in rows:
        for s in range(_PQ_M):
            assert 0 <= r[f"c{s}"] < _PQ_K
    # the quantizer must actually discriminate: every subspace uses
    # more than one code across the corpus
    distinct = codes.select(
        *[F.count_distinct(f"c{s}").alias(f"d{s}") for s in range(_PQ_M)]
    ).collect()[0]
    assert all(distinct[f"d{s}"] >= 2 for s in range(_PQ_M))


def test_adc_recall_against_exact_topk(spark, sf_dir):
    """PQ is lossy; with 16 codes x 8 subspaces over this corpus the
    ADC top-10 must still recover a meaningful share of the exact
    top-10 (>= 30% — loose on purpose; the point is 'approximates the
    right ranking', not a tuned recall benchmark)."""
    exact = {r.vec_id for r in ann_brute_force_topk(spark, sf_dir).collect()}
    approx = {r.vec_id for r in pq_adc_topk(spark, sf_dir).collect()}
    assert len(approx) == _TOPK
    assert len(exact & approx) >= 3


def test_ivfpq_probe_restricts_and_recalls(spark, sf_dir):
    """IVF-PQ results must come only from the probed cells, and the
    probe+quantize pipeline must still recover part of the exact
    top-10 (loose bound — correctness of the composition, not a tuned
    recall benchmark)."""
    from m4i_flink_tasks_spark.queries.llm_similarity import (
        _IVFPQ_NPROBE,
        ivfpq_adc_topk,
    )

    rows = ivfpq_adc_topk(spark, sf_dir).collect()
    assert len(rows) == _TOPK
    assert len({r.label for r in rows}) <= _IVFPQ_NPROBE
    exact = {r.vec_id for r in ann_brute_force_topk(spark, sf_dir).collect()}
    assert len(exact & {r.vec_id for r in rows}) >= 2
