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


def test_sq8_error_bounded_by_half_step(spark, sf_dir):
    """Affine int8 quantization error is at most half a step per
    dimension: max_abs_err <= max_dim_range / 255 / 2 (+ float slack)."""
    from pyspark.sql import functions as F

    from m4i_flink_tasks_spark.queries.llm_similarity import (
        sq8_reconstruction_error,
    )
    from m4i_flink_tasks_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rng = emb.select(
        F.max(
            F.expr(
                "aggregate(sequence(1, 64), cast(0.0 as double), (acc, i) "
                "-> greatest(acc, embedding[i-1]))"
            )
        ).alias("hi"),
        F.min(
            F.expr(
                "aggregate(sequence(1, 64), cast(999.0 as double), (acc, i) "
                "-> least(acc, embedding[i-1]))"
            )
        ).alias("lo"),
    ).collect()[0]
    bound = (rng.hi - rng.lo) / 255 / 2 + 1e-9
    out = sq8_reconstruction_error(spark, sf_dir)
    worst = out.agg(F.max("max_abs_err")).collect()[0][0]
    assert 0 < worst <= bound
    codes = out.agg(F.min("c0"), F.max("c0")).collect()[0]
    assert 0 <= codes[0] and codes[1] <= 255


def test_pq_sampled_training_parity(spark, monkeypatch):
    """The sampled-training branch (corpus above _PQ_TRAIN_FLOOR) is
    dormant at the test SFs by design — activate it by lowering the
    floor and pin full oracle parity for all three PQ queries at
    sf0.01 (2000 vectors > 100 -> the 1-in-4 LCG sample trains the
    codebook, everything still encodes). The SQL builders read the
    module constants at call time, so the oracle states the SAME
    lowered floor."""
    from m4i_flink_tasks_spark.queries import llm_similarity as L

    from .oracle_harness import compare

    monkeypatch.setattr(L, "_PQ_TRAIN_FLOOR", 100)
    sf = "/root/testdata/sf0.01"
    for fn, sql in (
        (L.pq_encode, L._pq_encode_sql()),
        (L.pq_adc_topk, L._pq_adc_sql()),
        (L.ivfpq_adc_topk, L._ivfpq_sql()),
    ):
        ok, msg = compare(spark, fn, sql, sf)
        assert ok, f"{fn.__name__} (sampled branch): {msg}"
