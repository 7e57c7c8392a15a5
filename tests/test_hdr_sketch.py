"""HDR-histogram quantile sketch: error bound, monotone bucketing,
batch/stream agreement, and prototypicality-pruning invariants."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.llm_similarity import (
    prototypicality_pruning,
)
from m4i_flink_tasks_spark.queries.sketches import (
    hdr_histogram_quantiles,
)


def test_hdr_sketch_error_bound(spark, sf_dir):
    """The midpoint readout's relative error is bounded by half a
    leading-digit-pair step: 1/(2*10) = 5% worst case."""
    rows = hdr_histogram_quantiles(spark, sf_dir).collect()
    assert [r["q"] for r in rows] == [0.5, 0.9, 0.99]
    for r in rows:
        assert r["rel_err"] <= 0.05, r


def test_hdr_bucket_monotone(spark):
    """Bucket id must be monotone in the value, else the cumulative
    walk reads out the wrong order statistic."""
    from m4i_flink_tasks_spark.queries.sketches import _hdr_bucket

    vals = [1, 5, 9, 10, 11, 99, 100, 101, 999, 1000, 123456, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    out = (
        df.select("c", _hdr_bucket("c").alias("b"))
        .orderBy("c")
        .collect()
    )
    buckets = [r["b"] for r in out]
    assert buckets == sorted(buckets)
    # distinct decades never collide
    assert len({b for b in buckets}) >= 8


def test_hdr_stream_matches_batch(spark, sf_dir):
    """Streamed sketch state equals the batch sketch for the replayed
    feed: the quantile estimates agree exactly."""
    from m4i_flink_tasks_spark.streaming.hdr_state import (
        run_stream_hdr_quantiles,
    )

    wd = tempfile.mkdtemp(prefix="m4i_hdr_")
    got = {
        r["q"]: (r["est"], r["n"])
        for r in run_stream_hdr_quantiles(spark, sf_dir, wd).collect()
    }
    exp = {
        r["q"]: r["est"]
        for r in hdr_histogram_quantiles(spark, sf_dir).collect()
    }
    assert set(got) == set(exp)
    n = {v[1] for v in got.values()}
    assert len(n) == 1
    for q, est in exp.items():
        assert got[q][0] == est


def test_prototypicality_prune_fraction(spark, sf_dir):
    """Per cluster: exactly ceil(0.2*n) vectors pruned, ranks are a
    permutation of 1..n, and pruned vectors are the TOP-ranked (most
    prototypical) ones."""
    out = prototypicality_pruning(spark, sf_dir)
    per = (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("pruned").cast("int")).alias("n_pruned"),
            F.max("proto_rank").alias("max_rank"),
            F.max(F.when(F.col("pruned"), F.col("proto_rank"))).alias(
                "max_pruned_rank"
            ),
        )
        .collect()
    )
    assert per
    for r in per:
        assert r["n_pruned"] == math.ceil(0.2 * r["n"])
        assert r["max_rank"] == r["n"]
        assert r["max_pruned_rank"] == r["n_pruned"]


def test_mmr_rerank_properties(spark, sf_dir):
    """MMR invariants: picks are distinct members of the relevance
    top-N, the first pick is the relevance argmax, and the selection
    actually diversifies (it is NOT simply the relevance order unless
    the candidate set is degenerate)."""
    from m4i_flink_tasks_spark.operators.similarity import (
        brute_force_topk,
    )
    from m4i_flink_tasks_spark.queries.llm_similarity import (
        _MMR_K,
        _MMR_N,
        _QUERY_VEC_ID,
        mmr_diverse_topk,
    )
    from m4i_flink_tasks_spark.sources import load_table

    out = mmr_diverse_topk(spark, sf_dir).collect()
    assert [r["mmr_rank"] for r in out] == list(range(1, _MMR_K + 1))
    picks = [r["vec_id"] for r in out]
    assert len(set(picks)) == _MMR_K

    emb = load_table(spark, sf_dir, "embeddings")
    cand = brute_force_topk(emb, _QUERY_VEC_ID, _MMR_N).collect()
    topn = [r["vec_id"] for r in cand]
    assert set(picks) <= set(topn)
    assert picks[0] == topn[0]
    # scores are the lambda-tradeoff, so each later pick's mmr_score
    # can't exceed pure relevance of the first pick
    assert all(r["mmr_score"] <= out[0]["mmr_score"] for r in out)


def test_hdr_mid_stream_restart_converges(spark, sf_dir):
    """(cnt,+ / c_min,min) keyed state is a commutative monoid pair, so
    a kill-and-resume replay converges to the batch sketch."""
    import glob
    import os
    import shutil

    from m4i_flink_tasks_spark.streaming.hdr_state import (
        run_stream_hdr_quantiles,
    )
    from m4i_flink_tasks_spark.streaming.median_state import (
        stage_price_cents,
    )

    wd = tempfile.mkdtemp(prefix="m4i_hdr_restart_")
    staging = stage_price_cents(
        spark, sf_dir, os.path.join(wd, "staging_prices"), 4
    )
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    hidden = tempfile.mkdtemp(prefix="m4i_hdr_hidden_")
    later = parts[1:]
    mtimes = {p: os.stat(p).st_mtime for p in later}
    for p in later:
        shutil.move(p, os.path.join(hidden, os.path.basename(p)))

    partial = run_stream_hdr_quantiles(spark, sf_dir, wd)
    assert partial.count() == 3

    for p in later:
        shutil.move(os.path.join(hidden, os.path.basename(p)), p)
        os.utime(p, (mtimes[p], mtimes[p]))
    final = {
        r["q"]: (r["est"], r["n"])
        for r in run_stream_hdr_quantiles(spark, sf_dir, wd).collect()
    }
    exp = {
        r["q"]: r["est"]
        for r in hdr_histogram_quantiles(spark, sf_dir).collect()
    }
    assert {q: v[0] for q, v in final.items()} == exp


def test_hdr_bucket_matches_reference_on_broad_sample(spark):
    """500 LCG-sampled values across 12 decades: the Spark bucket
    expression must equal an independent Python reference (digit-count
    decade + two leading digits), and midpoints must bracket the
    value within the bucket's range."""
    from m4i_flink_tasks_spark.queries.sketches import (
        _hdr_bucket,
        _hdr_midpoint_dollars,
    )

    def ref_bucket(c: int) -> int:
        if c < 10:
            return c - 10
        s = str(c)
        d = len(s) - 1
        lead2 = int(s[:2])
        return d * 90 + lead2 - 10

    vals, x = [], 12345
    for _ in range(500):
        x = (x * 1103515245 + 12345) % (2**31)
        vals.append(1 + x % 10 ** (1 + x % 12))
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {
        r["c"]: (r["b"], r["m"])
        for r in df.select(
            "c",
            _hdr_bucket("c").alias("b"),
            _hdr_midpoint_dollars("c").alias("m"),
        ).collect()
    }
    for v in vals:
        b, m = got[v]
        assert b == ref_bucket(v), (v, b, ref_bucket(v))
        # midpoint (in dollars) stays within the bucket's value range
        if v >= 10:
            lo = int(str(v)[:2]) * 10 ** (len(str(v)) - 2)
            hi = (int(str(v)[:2]) + 1) * 10 ** (len(str(v)) - 2)
            assert lo / 100.0 <= m < hi / 100.0, (v, m, lo, hi)
        else:
            assert m == v / 100.0


def test_signature_frame_matches_expression_form(spark, sf_dir):
    """The Arrow signature kernel must equal the HOF expression form
    component-for-component (the planner's oracle also proves this
    via SQL; this pins it engine-internally and per-component)."""
    from pyspark.sql import functions as F2

    from m4i_flink_tasks_spark.operators import dedup as D
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: list(r["sig"])
        for r in D.signature_frame(docs, "doc_id", "text", n=3).collect()
    }
    sh = docs.select(
        "doc_id", D.shingle_hashes(F2.col("text"), 3).alias("sh")
    ).filter(F2.size("sh") > 0)
    exp = {
        r["doc_id"]: list(r["sig"])
        for r in sh.select(
            "doc_id", D.minhash_signature(F2.col("sh")).alias("sig")
        ).collect()
    }
    assert got == exp and got
