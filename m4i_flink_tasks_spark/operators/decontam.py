"""Benchmark decontamination — flag training documents that share
word n-grams with an evaluation/benchmark set.

The canonical training-data hygiene step (n-gram overlap decontamination
as popularized by the GPT-3/PaLM data cards): any training document that
contains an n-gram also present in a benchmark document is contaminated
and must be dropped or scrubbed before training.

Spark-first shape, sized for 100 TB:

- n-gram generation is pure column expressions (``split`` +
  ``transform``/``slice`` over the token array) — whole-stage codegen,
  no Python in the scan.
- The benchmark side is tiny by construction (eval sets are MBs, the
  corpus is TBs), so its distinct n-gram set is **broadcast**; the
  training side never shuffles its exploded n-grams — each partition
  joins locally against the broadcast set and aggregates per doc
  (partial aggregation map-side, one narrow shuffle of per-doc counts).
- At real scale the join key would be ``xxhash64(ngram)`` (8-byte keys
  instead of strings, collision odds ~n²/2⁶⁴); the oracle-checked form
  joins on the n-gram string itself because the DuckDB oracle must
  reproduce values exactly, and the join STRUCTURE (broadcast +
  local aggregation) is identical either way.

Reference parity: the reference has no decontamination operator — this
belongs to the LLM-training extension surface (north-star scope), same
family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_ngrams(text: Column, n: int) -> Column:
    """All word-level n-grams of ``text`` as space-joined strings.

    ``transform`` over an index sequence + ``slice`` keeps this inside
    codegen; documents shorter than ``n`` words yield an empty array.
    """
    toks = tokens(text)
    n_grams = F.size(toks) - F.lit(n - 1)
    return F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def benchmark_ngram_set(bench: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams of the benchmark set — the small broadcast side.

    One column ``ng``. Distinct is a shuffle of the BENCHMARK side only,
    which is bounded by eval-set size, not corpus size.
    """
    # outer + isNotNull: avoids the inner-Generate size(...)>0 guard
    # re-computing the n-gram transform per row; ngram strings are
    # never null.
    return (
        bench.select(
            F.explode_outer(word_ngrams(F.col(text_col), n)).alias("ng")
        )
        .filter(F.col("ng").isNotNull())
        .distinct()
    )


def contamination_counts(
    train: DataFrame,
    bench_ngrams: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
) -> DataFrame:
    """Per-document contamination counts for training docs that overlap
    the benchmark n-gram set.

    Returns ``(id_col, n_ngrams, n_overlap, overlap_rate)`` for docs
    with ``n_overlap >= 1``. ``n_overlap`` counts DISTINCT matching
    n-grams (one benchmark hit per unique n-gram, however often it
    repeats in the document) — the conservative decontamination metric.

    Plan: explode distinct per-doc n-grams, broadcast-join the
    benchmark set (inner), count per doc; total n-gram counts ride
    along from the pre-explode row so no second scan is needed.
    """
    with_grams = train.select(
        F.col(id_col),
        F.size(word_ngrams(F.col(text_col), n)).alias("n_ngrams"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("grams"),
    )
    # outer: a null ng row can never match the inner broadcast join
    # below, so the relation is unchanged; avoids the Generate guard
    # re-computing the collapsed word_ngrams projection per row.
    exploded = with_grams.select(
        id_col, "n_ngrams", F.explode_outer("grams").alias("ng")
    )
    hits = exploded.join(F.broadcast(bench_ngrams), "ng")
    return (
        hits.groupBy(id_col, "n_ngrams")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(
            id_col,
            "n_ngrams",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("n_ngrams"), 6).alias(
                "overlap_rate"
            ),
        )
    )
