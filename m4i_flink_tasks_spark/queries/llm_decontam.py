"""Training-corpus hygiene queries: benchmark decontamination,
entropy-based quality scoring, and data-mixture weighting.

North-star LLM-pipeline scope (no reference analogue — the reference
ends at metadata sync; these are the curation steps a 100 TB corpus
needs before training). All three are expression-native single-scan
plans; the only broadcast is the benchmark n-gram set, which is small
by construction (eval sets are MBs against a TB-scale corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import decontam as DC
from ..operators import text as T
from ..sources import load_table

# Benchmark membership: deterministic slice of the corpus standing in
# for a held-out eval set. Real pipelines use 8-13-gram overlap; this
# synthetic corpus draws ~30 vocabulary words, so 3-grams give the
# realistic hit DISTRIBUTION (some docs clean, some with 1-4 hits)
# that 8-grams give on natural text. The operator takes n as a
# parameter; nothing below depends on n=3.
_BENCH_MOD = 97
_NGRAM_N = 3


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing any word 3-gram with the benchmark
    slice (doc_id % 97 == 0) — the GPT-3-style n-gram overlap
    decontamination step. Benchmark n-grams broadcast; the corpus side
    aggregates locally, so the plan is one corpus scan + one narrow
    per-doc-count shuffle regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    train = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    grams = DC.benchmark_ngram_set(bench, "text", _NGRAM_N)
    return DC.contamination_counts(
        train, grams, "doc_id", "text", _NGRAM_N
    ).orderBy("doc_id")


DECONTAMINATION_SQL = f"""
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), bench AS (
    SELECT DISTINCT array_to_string(w[i:i+{_NGRAM_N - 1}], ' ') AS ng
    FROM words, unnest(range(1, len(w) - {_NGRAM_N - 1} + 1)) AS t(i)
    WHERE doc_id % {_BENCH_MOD} = 0
), train AS (
    SELECT doc_id,
           len(w) - {_NGRAM_N - 1} AS n_ngrams,
           unnest(list_distinct(list_transform(
               range(1, len(w) - {_NGRAM_N - 1} + 1),
               i -> array_to_string(w[i:i+{_NGRAM_N - 1}], ' ')))) AS ng
    FROM words
    WHERE doc_id % {_BENCH_MOD} != 0
)
SELECT doc_id,
       n_ngrams,
       count(*) AS n_overlap,
       round(count(*)::DOUBLE / n_ngrams, 6) AS overlap_rate
FROM train JOIN bench USING (ng)
GROUP BY doc_id, n_ngrams
ORDER BY doc_id
"""


def word_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc lexical statistics + Shannon entropy of the word
    distribution — the perplexity-proxy quality filter. Entirely inside
    codegen (no explode): one scan scores the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.lower(F.col("text")))
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.round(n_distinct / n, 6).alias("ttr"),
        F.round(T.word_entropy(F.col("text")), 6).alias("entropy_bits"),
    ).orderBy("doc_id")


# The DuckDB fold mirrors operators/text.py::word_entropy term-for-term:
# probabilities over the SORTED distinct-token list, sequential
# list_reduce sum, so the float accumulation order is identical.
WORD_ENTROPY_SQL = """
WITH words AS (
    SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
), stats AS (
    SELECT doc_id, w,
           len(w) AS n_tokens,
           len(list_distinct(w)) AS n_distinct,
           list_sort(list_distinct(w)) AS d
    FROM words
)
SELECT doc_id,
       n_tokens,
       n_distinct,
       round(n_distinct::DOUBLE / n_tokens, 6) AS ttr,
       round(-list_reduce(
           list_prepend(0.0::DOUBLE,
               list_transform(d,
                   x -> (len(list_filter(w, t -> t = x))::DOUBLE / n_tokens)
                        * log2(len(list_filter(w, t -> t = x))::DOUBLE / n_tokens))),
           (acc, v) -> acc + v), 6) AS entropy_bits
FROM stats
ORDER BY doc_id
"""

# Mixture temperature: weight ~ tokens^alpha, the standard temperature-
# sampled data-mixing rule (alpha=1 reproduces natural proportions,
# alpha->0 uniform; 0.5 is the common multilingual compromise).
_MIX_ALPHA = 0.5


def domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token totals and temperature-scaled sampling weights —
    the data-mixing table a training run consumes. The normalizer is a
    one-row aggregate of the per-source table (#sources rows, not the
    corpus) broadcast back as a scalar, so no single-partition window
    sits in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    scaled = F.pow(F.col("total_tokens").cast("double"), F.lit(_MIX_ALPHA))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text"))).alias("total_tokens"),
    ).withColumn("_scaled", scaled)
    norm = per_src.agg(F.sum("_scaled").alias("_norm"))
    return (
        per_src.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.col("_scaled") / F.col("_norm"), 6).alias(
                "mixture_weight"
            ),
        )
        .orderBy("source")
    )


MIXTURE_WEIGHTS_SQL = f"""
WITH s AS (
    SELECT source,
           count(*) AS n_docs,
           sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
    FROM documents
    GROUP BY source
)
SELECT source,
       n_docs,
       total_tokens,
       round(pow(total_tokens::DOUBLE, {_MIX_ALPHA})
             / sum(pow(total_tokens::DOUBLE, {_MIX_ALPHA})) OVER (), 6)
           AS mixture_weight
FROM s
ORDER BY source
"""


QUERIES = {
    "benchmark_decontamination": benchmark_decontamination,
    "word_entropy_quality": word_entropy_quality,
    "domain_mixture_weights": domain_mixture_weights,
}

ORACLES = {
    "benchmark_decontamination": DECONTAMINATION_SQL,
    "word_entropy_quality": WORD_ENTROPY_SQL,
    "domain_mixture_weights": MIXTURE_WEIGHTS_SQL,
}


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-source lexical overlap matrix: Jaccard of the distinct
    token vocabularies for every source pair — the corpus-analysis
    view behind mixture design and cross-split contamination checks
    (two 'different' sources with near-identical vocabularies are one
    domain, and a train/eval source pair overlapping heavily is a
    leak).

    Scale shape: one explode → distinct (source, token) relation
    (vocabulary-sized, Heaps-sublinear), ONE shuffle on token for the
    intersection self-join (token posting lists are |sources|-bounded,
    so the join fans out at most |sources|² per token), per-source
    vocab sizes broadcast back; |union| is computed as |a|+|b|−|∩|
    rather than a second join. Output is |sources|²/2 rows — a report,
    not a corpus."""
    from ..operators.spread import spread_for_compute

    # Bigram explode is CPU-dense per row BEFORE its first shuffle;
    # guard against a compact scan's split count (r5 sf1 rehearsal:
    # 4.1x at 10x data on a 2-split documents file).
    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents").select("source", "text")
    )
    # BIGRAM vocabularies: the unigram vocabulary of this synthetic
    # corpus is one shared pool (all Jaccards ~1.0 — a degenerate
    # demo), while bigram sets are combinatorial and source-specific,
    # giving the report the spread a real corpus shows.
    toks = docs.select(
        "source", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 2)
    vocab = (
        toks.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(t[i-1], ' ', t[i]))"
                )
            ).alias("w"),
        )
        .distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vsize"))
    l = vocab.select(F.col("source").alias("source_a"), "w")
    r = vocab.select(F.col("source").alias("source_b"), "w")
    common = (
        l.join(r, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")
                        .withColumnRenamed("vsize", "vocab_a")),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("source", "source_b")
                        .withColumnRenamed("vsize", "vocab_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_OVERLAP_SQL = r"""
WITH toks AS (
    SELECT source, string_split_regex(trim(lower(text)), '\s+') AS t
    FROM documents
), vocab2 AS (
    SELECT DISTINCT source,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS w
    FROM toks WHERE len(t) >= 2
), sizes AS (
    SELECT source, count(*) AS vsize FROM vocab2 GROUP BY source
), common AS (
    SELECT l.source AS source_a, r.source AS source_b, count(*) AS n_common
    FROM vocab2 l JOIN vocab2 r ON l.w = r.w AND l.source < r.source
    GROUP BY 1, 2
)
SELECT c.source_a, c.source_b,
       sa.vsize AS vocab_a, sb.vsize AS vocab_b,
       c.n_common,
       round(c.n_common / (sa.vsize + sb.vsize - c.n_common), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.source = c.source_a
JOIN sizes sb ON sb.source = c.source_b
ORDER BY c.source_a, c.source_b
"""


QUERIES["source_vocab_overlap"] = source_vocab_overlap
ORACLES["source_vocab_overlap"] = SOURCE_OVERLAP_SQL
