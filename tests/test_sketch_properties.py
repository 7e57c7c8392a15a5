"""Property-based pins for the sketch primitives: the Spark column
expressions must agree with an independent pure-Python model on
arbitrary inputs (the DuckDB oracle then being the third
implementation), and the KMV merge must be partition-invariant.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators import text as T

# printable-ascii strings; the hash folds code points, so anything in
# [32, 126] exercises it fully without depending on string encodings
_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=40,
)


def _py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * T.HASH_BASE + ord(ch)) % T.HASH_MOD
    return acc


def _py_scrambled(s: str) -> int:
    return (_py_poly_hash(s) * T.MIX_MULT) % T.HASH_MOD


@settings(max_examples=20, deadline=None)
@given(st.lists(_ascii_text, min_size=1, max_size=8, unique=True))
def test_hashes_match_python_model(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    rows = df.select(
        "s",
        T.poly_hash(F.col("s")).alias("p"),
        T.scrambled_hash(F.col("s")).alias("m"),
    ).collect()
    for r in rows:
        assert r.p == _py_poly_hash(r.s), r.s
        assert r.m == _py_scrambled(r.s), r.s
        assert 0 <= r.m < T.HASH_MOD


def test_kmv_merge_partition_invariant():
    """k-min-of-union == k-min of (k-min per part) for EVERY partition
    of the value set — the property that makes the sketch mergeable
    across shards, micro-batches, and days. Pure-Python model check
    over random partitions (the Spark path is pinned by
    test_sketches.test_kmv_sharded_build_equals_global_build)."""
    rng = random.Random(7)
    k = 16
    values = sorted({rng.randrange(10**9) for _ in range(500)})
    global_kmin = sorted(values)[:k]
    for n_parts in (1, 2, 3, 7):
        parts: list[list[int]] = [[] for _ in range(n_parts)]
        for v in values:
            parts[rng.randrange(n_parts)].append(v)
        merged = sorted(
            {x for p in parts for x in sorted(p)[:k]}
        )[:k]
        assert merged == global_kmin, n_parts


def test_scrambled_hash_kth_min_tracks_cardinality(spark):
    """The estimator's premise on the hash actually used: for
    sequential keys, the k-th smallest scrambled hash scales like
    k*M/n, so the KMV estimate lands near n — while the UNscrambled
    polynomial hash violates it badly (the reason scrambled_hash
    exists)."""
    n, k = 3000, 32
    df = spark.range(1, n + 1).select(
        T.scrambled_hash(F.concat(F.lit("p:"), F.col("id"))).alias("s")
    )
    kth = df.orderBy("s").limit(k).agg(F.max("s")).collect()[0][0]
    est = (k - 1) * T.HASH_MOD // kth
    assert 0.5 * n < est < 2.0 * n, est
