"""Semantics pins for exact_substr_cut_plan (queries/llm_dedup.py).

The oracle-parity gate proves whole-corpus hash equality at every SF;
these tests pin the removal RULE on crafted corpora the generated data
can't isolate: global-first-keeper survival, adjacent-window island
merging, overlapping-window coalescing, short-document passthrough,
and the cleaned-content fingerprint — plus the okey position bound the
integer winner arithmetic depends on.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.llm_dedup import (
    _ESS_POS_BOUND,
    SPAN_K,
    _span_windows,
    exact_substr_cut_plan,
)
from m4i_flink_tasks_spark.sources import load_table


def _py_poly_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


def _stage(spark, rows) -> str:
    d = tempfile.mkdtemp(prefix="m4i_ess_")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    return d


def test_crafted_cut_semantics(spark):
    assert SPAN_K == 8, "crafted spans below assume the 8-token window"
    S = " ".join(f"s{i}" for i in range(1, 9))     # one exact window
    R = " ".join(f"r{i}" for i in range(1, 10))    # two overlapping windows
    rows = [
        (1, f"{S} u1 u2", "en", "a"),          # global first keeper
        (2, f"v1 {S} v2", "en", "a"),          # later copy -> cut [2,9]
        (3, f"{S} {S}", "en", "a"),            # both copies cut, merged
        (4, f"a1 {R}", "en", "a"),             # global first keeper
        (5, f"b1 c1 {R}", "en", "a"),          # overlap-merged cut [3,11]
        (6, "short text", "en", "a"),          # < k tokens: passthrough
    ]
    got = {
        r["doc_id"]: r
        for r in exact_substr_cut_plan(spark, _stage(spark, rows)).collect()
    }
    assert len(got) == 6

    # doc 1 holds the global first occurrence of S: nothing cut
    assert got[1]["n_cut_ranges"] == 0 and got[1]["tokens_cut"] == 0
    assert got[1]["kept_fingerprint"] == _py_poly_hash(f"{S} u1 u2")

    # doc 2's copy of S is cut as one range of exactly k tokens
    assert got[2]["n_cut_ranges"] == 1 and got[2]["tokens_cut"] == 8
    assert got[2]["kept_fingerprint"] == _py_poly_hash("v1 v2")
    assert abs(got[2]["cut_ratio"] - 8 / 10) < 1e-9

    # doc 3: BOTH its occurrences are non-first; flagged positions 1 and
    # 9 are k apart, so they merge into a single [1,16] island
    assert got[3]["n_cut_ranges"] == 1 and got[3]["tokens_cut"] == 16
    assert got[3]["kept_fingerprint"] == _py_poly_hash("")
    assert got[3]["cut_ratio"] == 1.0

    # doc 5: the two overlapping duplicated windows of R coalesce into
    # one 9-token range; doc 4 (first occurrence) keeps everything
    assert got[4]["tokens_cut"] == 0
    assert got[5]["n_cut_ranges"] == 1 and got[5]["tokens_cut"] == 9
    assert got[5]["kept_fingerprint"] == _py_poly_hash("b1 c1")

    # short doc: no windows exist, full text survives
    assert got[6]["n_tokens"] == 2 and got[6]["tokens_cut"] == 0
    assert got[6]["kept_fingerprint"] == _py_poly_hash("short text")


def test_corpus_invariants(spark, sf_dir):
    """On the generated corpus: the okey bound holds; the all-but-one
    identity holds (cut windows = duplicated-hash occurrences minus one
    keeper per hash); every cut stays inside its document."""
    docs = load_table(spark, sf_dir, "documents")
    wins = _span_windows(docs)
    max_pos = wins.agg(F.max("pos")).collect()[0][0]
    assert max_pos < _ESS_POS_BOUND

    dup = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .agg(
            F.sum("n").alias("occ"),
            F.count(F.lit(1)).alias("groups"),
        )
        .collect()[0]
    )
    expected_cut_windows = (dup["occ"] or 0) - (dup["groups"] or 0)

    report = exact_substr_cut_plan(spark, sf_dir).collect()
    # islands only ever merge ADJACENT windows, so each cut range covers
    # at least k tokens and total cut tokens are bounded by windows*k
    assert sum(r["tokens_cut"] for r in report) <= expected_cut_windows * SPAN_K
    for r in report:
        assert 0 <= r["tokens_cut"] <= r["n_tokens"]
        if r["n_cut_ranges"]:
            assert r["tokens_cut"] >= SPAN_K
    # and the corpus actually exercises the cut path at this SF
    assert any(r["tokens_cut"] > 0 for r in report)
