"""Entity-resolution pins: blocking recall and block-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.entity_resolution import (
    _EVEN_POS,
    _LEV_MAX,
    _ODD_POS,
    _candidate_pairs,
    _interleaved_key,
)
from m4i_flink_tasks_spark.sources import load_table

from .test_plan_shape import plan_of


def test_segment_blocking_has_full_recall(spark, sf_dir):
    """The two-pass segment blocking must enumerate EXACTLY the pairs
    the all-pairs (in nation+segment) lev<=1 match finds — the
    pigeonhole guarantee, checked against a brute-force twin."""
    customer = load_table(spark, sf_dir, "customer")
    blocked = (
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
        .union(
            _candidate_pairs(customer, _interleaved_key("c_name", _EVEN_POS))
        )
        .distinct()
    )
    a = customer.alias("a")
    b = customer.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_mktsegment") == F.col("b.c_mktsegment"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= _LEV_MAX
        )
        .select(
            F.col("a.c_custkey").alias("src"),
            F.col("b.c_custkey").alias("dst"),
        )
    )
    assert blocked.exceptAll(brute).count() == 0
    assert brute.exceptAll(blocked).count() == 0


def test_block_join_is_hash_equality(spark, sf_dir):
    """Each blocking pass joins on pure equality keys — a hash join,
    never a cartesian with a post-filter."""
    customer = load_table(spark, sf_dir, "customer")
    plan = plan_of(
        _candidate_pairs(customer, _interleaved_key("c_name", _ODD_POS))
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_fellegi_sunter_bands(spark, sf_dir):
    """FS banding: bands partition the candidate set, score extremes
    respect the band cliffs, and the probabilistic link band agrees
    with the deterministic lev<=1 rule at these m/u parameters."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        _FS_T_LINK,
        _FS_T_POSSIBLE,
        _FS_W,
        fellegi_sunter_bands,
    )

    for wa, wd in _FS_W.values():
        assert wa > 0 > wd  # agreement adds evidence, disagreement removes
    rows = {r["band"]: r for r in fellegi_sunter_bands(spark, sf_dir).collect()}
    assert set(rows) <= {"1 link", "2 possible", "3 non-link"}
    if "1 link" in rows:
        r = rows["1 link"]
        assert r["min_score_micro"] >= _FS_T_LINK
        # at these parameters a link REQUIRES name agreement (the two
        # other fields alone cannot reach the cliff)
        assert r["n_lev_matches"] == r["n_pairs"]
    if "2 possible" in rows:
        r = rows["2 possible"]
        assert _FS_T_POSSIBLE <= r["min_score_micro"]
        assert r["max_score_micro"] < _FS_T_LINK
    if "3 non-link" in rows:
        r = rows["3 non-link"]
        assert r["max_score_micro"] < _FS_T_POSSIBLE
        assert r["n_lev_matches"] == 0


def test_fs_2of3_blocking_has_full_lev1_recall(spark, sf_dir):
    """Every lev<=1 same-nation pair must appear in the 2-of-3-parts
    candidate enumeration (the pigeonhole guarantee) — pinned against
    a brute-force quadratic join."""
    from pyspark.sql import functions as F

    from m4i_flink_tasks_spark.queries.entity_resolution import (
        _FS_PART_PAIRS,
        _fs_candidates,
        _interleaved_key,
    )
    from m4i_flink_tasks_spark.sources import load_table

    customer = load_table(spark, sf_dir, "customer")
    passes = [
        _fs_candidates(customer, _interleaved_key("c_name", pp))
        for pp in _FS_PART_PAIRS
    ]
    cands = {
        (r["src"], r["dst"])
        for r in passes[0]
        .union(passes[1])
        .union(passes[2])
        .select("src", "dst")
        .distinct()
        .collect()
    }
    side = customer.select("c_custkey", "c_name", "c_nationkey")
    a, b = side.alias("a"), side.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1
        )
        .select(
            F.col("a.c_custkey").alias("src"),
            F.col("b.c_custkey").alias("dst"),
        )
    )
    expected = {(r["src"], r["dst"]) for r in brute.collect()}
    assert expected, "brute force found no lev<=1 pairs - vacuous test"
    assert expected <= cands
