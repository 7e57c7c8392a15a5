"""Edge-case pins for the decontamination / entropy / mixture operators
(the oracle-parity gate covers the full-corpus answers; these pin the
boundary semantics the SQL comparison can't isolate)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators import decontam as DC
from m4i_flink_tasks_spark.operators.text import word_entropy


def _one_col(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")


def test_word_ngrams_shorter_than_n_is_empty(spark):
    df = _one_col(spark, ["a b", "a", ""]).select(
        DC.word_ngrams(F.col("text"), 3).alias("g")
    )
    assert [r["g"] for r in df.collect()] == [[], [], []]


def test_word_ngrams_exact_length_and_overlap(spark):
    df = _one_col(spark, ["a b c", "a b c d"]).select(
        DC.word_ngrams(F.col("text"), 3).alias("g")
    )
    got = [r["g"] for r in df.collect()]
    assert got == [["a b c"], ["a b c", "b c d"]]


def test_contamination_counts_distinct_hits_only(spark):
    # "x y z" occurs twice in doc 0 — must count ONCE (distinct n-grams).
    train = _one_col(spark, ["x y z q x y z", "clean words only here"])
    bench = _one_col(spark, ["x y z"])
    grams = DC.benchmark_ngram_set(bench, "text", 3)
    out = DC.contamination_counts(train, grams, "id", "text", 3).collect()
    assert len(out) == 1
    row = out[0]
    assert row["id"] == 0 and row["n_overlap"] == 1 and row["n_ngrams"] == 5


def test_word_entropy_uniform_and_constant(spark):
    df = _one_col(spark, ["a b c d", "a a a a"]).select(
        word_entropy(F.col("text")).alias("h")
    )
    got = [r["h"] for r in df.collect()]
    assert math.isclose(got[0], 2.0, abs_tol=1e-12)  # 4 uniform tokens
    assert got[1] == 0.0  # constant doc
