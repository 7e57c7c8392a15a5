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


def test_fs_em_is_a_true_em_fixpoint_path():
    """The integer EM must track a float EM reference: run both from
    the same start on a synthetic pattern histogram and require the
    nano-unit params to sit within 5e-6 of the float path (the
    floor-per-multiply error is ~1 nano-unit, but on small
    intermediate products — am ~ p*prod(m) can sit near 3e7 nano —
    the RELATIVE error reaches ~3e-8 per step and compounds to the
    low-micro range over 12 iterations; 5e-6 bounds that with slack
    while still pinning the integer recurrence to the true EM
    trajectory)."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        _FS_EM_ITERS,
        _FS_FIELDS,
        _FS_ONE,
        _fs_em,
        _fs_em_init,
    )

    # two well-separated populations: matches (pattern 7, all agree)
    # plus noise, and non-matches concentrated on low patterns
    counts = [5000, 800, 700, 120, 400, 90, 80, 310]
    p_i, m_i, u_i = _fs_em(counts)

    p0, m0, u0 = _fs_em_init()
    p = p0 / _FS_ONE
    m = {f: m0[f] / _FS_ONE for f, _ in _FS_FIELDS}
    u = {f: u0[f] / _FS_ONE for f, _ in _FS_FIELDS}
    for _ in range(_FS_EM_ITERS):
        s_tot = t_tot = 0.0
        s_f = {f: 0.0 for f, _ in _FS_FIELDS}
        t_f = {f: 0.0 for f, _ in _FS_FIELDS}
        for g, n in enumerate(counts):
            am, au = p, 1.0 - p
            for f, b in _FS_FIELDS:
                am *= m[f] if g & b else 1.0 - m[f]
                au *= u[f] if g & b else 1.0 - u[f]
            w = am / (am + au)
            s_tot += n * w
            t_tot += n * (1.0 - w)
            for f, b in _FS_FIELDS:
                if g & b:
                    s_f[f] += n * w
                    t_f[f] += n * (1.0 - w)
        p = s_tot / sum(counts)
        m = {f: s_f[f] / s_tot for f, _ in _FS_FIELDS}
        u = {f: t_f[f] / t_tot for f, _ in _FS_FIELDS}

    assert abs(p_i / _FS_ONE - p) < 5e-6
    for f, _ in _FS_FIELDS:
        assert abs(m_i[f] / _FS_ONE - m[f]) < 5e-6
        assert abs(u_i[f] / _FS_ONE - u[f]) < 5e-6
    # separation: every field must carry positive evidence (m > u)
    for f, _ in _FS_FIELDS:
        assert m_i[f] > u_i[f]


def test_fs_em_parameters_query(spark, sf_dir):
    """Driver-surface shape + semantics: 3 rows (one per scored
    field), shared p and n_pairs, params in (0, 1) nano-range, and
    m > u for the name field (names carry the match signal on this
    data)."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        _FS_ONE,
        fs_em_parameters,
    )

    rows = {r["field"]: r for r in fs_em_parameters(spark, sf_dir).collect()}
    assert set(rows) == {"name", "segment", "balance"}
    ps = {r["p_nano"] for r in rows.values()}
    ns = {r["n_pairs"] for r in rows.values()}
    assert len(ps) == 1 and len(ns) == 1
    assert next(iter(ns)) > 0
    for r in rows.values():
        assert 0 < r["m_nano"] < _FS_ONE
        assert 0 < r["u_nano"] < _FS_ONE
    # name carries the match signal; at the smoke SF the candidate set
    # can be so name-pure that both params clamp to the ceiling, so
    # require non-strict dominance (strict separation is pinned on the
    # synthetic histogram in the fixpoint test above)
    assert rows["name"]["m_nano"] >= rows["name"]["u_nano"]


def test_fs_em_posterior_bands(spark, sf_dir):
    """EM-weighted banding: bands partition the same candidate set the
    fixed-literal banding sees, posterior extremes respect the band
    cliffs, and name-agreement counts never exceed the band size."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        _FS_POST_LINK,
        _FS_POST_POSSIBLE,
        fellegi_sunter_bands,
        fs_em_posterior_bands,
    )

    rows = {r["band"]: r for r in fs_em_posterior_bands(spark, sf_dir).collect()}
    assert set(rows) <= {"1 link", "2 possible", "3 non-link"}
    n_total = sum(r["n_pairs"] for r in rows.values())
    n_fixed = sum(
        r["n_pairs"] for r in fellegi_sunter_bands(spark, sf_dir).collect()
    )
    assert n_total == n_fixed  # same blocked candidate relation
    for r in rows.values():
        assert 0 <= r["min_posterior_nano"] <= r["max_posterior_nano"]
        assert 0 <= r["n_lev_matches"] <= r["n_pairs"]
    if "1 link" in rows:
        assert rows["1 link"]["min_posterior_nano"] >= _FS_POST_LINK
    if "2 possible" in rows:
        assert rows["2 possible"]["min_posterior_nano"] >= _FS_POST_POSSIBLE
        assert rows["2 possible"]["max_posterior_nano"] < _FS_POST_LINK
    if "3 non-link" in rows:
        assert rows["3 non-link"]["max_posterior_nano"] < _FS_POST_POSSIBLE


def test_golden_record_survivorship(spark, sf_dir):
    """Survivorship semantics: clusters match entity_match_clusters'
    components, every golden name belongs to a cluster member, the
    balance rule holds (max >= survivor's own balance) and the
    segment mode is a member segment."""
    from m4i_flink_tasks_spark.queries.entity_resolution import (
        entity_match_clusters,
        golden_record_survivorship,
    )

    clusters = {
        r["component_id"]: r
        for r in entity_match_clusters(spark, sf_dir).collect()
    }
    golden = golden_record_survivorship(spark, sf_dir).collect()
    assert golden, "no duplicate clusters at this SF - vacuous test"
    cust = {
        r["c_custkey"]: r
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    for g in golden:
        assert g["component_id"] in clusters
        assert g["n_members"] == clusters[g["component_id"]]["n_members"]
        assert g["n_members"] >= 2  # every component node has an edge
        # the cluster id is the min member id and a real customer; its
        # nation must equal the golden nation (nation blocks the rule)
        seed = cust[g["component_id"]]
        assert g["nationkey"] == seed["c_nationkey"]
        # round() is monotone, so round(max) >= round(member) holds
        assert g["max_acctbal"] >= round(seed["c_acctbal"], 2)
        # listed members of the report include the survivor candidates
        members = [
            int(x)
            for x in clusters[g["component_id"]]["members"].split(",")
        ]
        assert g["component_id"] == min(members)


def test_stream_entity_clusters_matches_batch(spark, sf_dir):
    """The maintained match-pair graph must cluster to exactly the
    batch report at any batch split."""
    import tempfile

    from m4i_flink_tasks_spark.queries.entity_resolution import (
        entity_match_clusters,
    )
    from m4i_flink_tasks_spark.streaming.fs_linkage import (
        run_stream_entity_clusters,
    )

    batch = sorted(
        map(tuple, entity_match_clusters(spark, sf_dir).collect())
    )
    assert batch, "no clusters at this SF - vacuous test"
    wd = tempfile.mkdtemp(prefix="m4i_er_stream_")
    got = sorted(
        map(
            tuple,
            run_stream_entity_clusters(spark, sf_dir, wd).collect(),
        )
    )
    assert got == batch


def test_fs_linkage_sink_handles_out_of_order_arrival(spark):
    """A pair whose LOWER-key record arrives AFTER its higher-key
    partner must still be discovered: after least/greatest
    normalization the prior record is the dst side, so the store read
    must cover both pair columns (not just src)."""
    import os
    import tempfile

    from m4i_flink_tasks_spark.streaming.fs_linkage import link_batch
    from m4i_flink_tasks_spark.streaming.store import (
        BucketedParquetUpsertStore,
    )

    wd = tempfile.mkdtemp(prefix="m4i_fs_ooo_")
    block = BucketedParquetUpsertStore(
        spark,
        os.path.join(wd, "block_index"),
        key_cols=["pass_idx", "blk", "c_nationkey"],
    )
    attrs = BucketedParquetUpsertStore(
        spark, os.path.join(wd, "attrs"), key_cols=["c_custkey"]
    )
    pairs = BucketedParquetUpsertStore(
        spark, os.path.join(wd, "pairs"), key_cols=["src", "dst"]
    )
    schema = (
        "c_custkey long, c_name string, c_nationkey int, "
        "c_mktsegment string, c_acctbal double"
    )
    high_first = spark.createDataFrame(
        [(2, "Customer#000000002", 7, "BUILDING", 100.0)], schema
    )
    low_later = spark.createDataFrame(
        [(1, "Customer#000000001", 7, "BUILDING", 200.0)], schema
    )
    link_batch(block, attrs, pairs, high_first, batch_id=0)
    link_batch(block, attrs, pairs, low_later, batch_id=1)
    got = sorted(
        (r["src"], r["dst"], r["ag_name"])
        for r in pairs.current().collect()
    )
    assert got == [(1, 2, True)]
