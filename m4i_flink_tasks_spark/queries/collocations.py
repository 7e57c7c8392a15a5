"""Collocation mining: corpus-level PMI over adjacent token pairs.

Complements the per-document repetition metrics and the TF-IDF/BM25
ranking with the corpus-statistics pass that finds MULTI-WORD units
(PMI is the standard association score for collocation extraction —
e.g. Church & Hanks 1990). Everything is two scan-speed explodes and
three hash aggregates:

    tokens → unigram counts (vocabulary-sized)
    adjacent pairs → bigram counts (vocabulary²-bounded, sparse)
    PMI = ln( (c_ab / N_bi) / ((c_a / N_uni) · (c_b / N_uni)) )

Scale notes (100 TB posture):
- bigram enumeration is a map-side array transform (no shuffle until
  the count aggregates, which combine partially — a document repeating
  one bigram 10⁶ times ships one partial row per task);
- unigram counts and the corpus totals are vocabulary-sized /
  single-row and broadcast back onto the bigram relation; the bigram
  stream is shuffled exactly once (its own count);
- the min-count floor prunes the long tail BEFORE the join, and PMI is
  rounded before ranking so cross-engine ln() ulps cannot reorder the
  top-k (ties break on the pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

_MIN_PAIR_COUNT = 30
_TOP_PAIRS = 20


def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-pair collocations by PMI (min support 30)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    )
    unigrams = toks.select(
        F.explode("toks").alias("w")
    ).filter(F.col("w") != "")
    uni_counts = unigrams.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    n_uni = unigrams.agg(F.count(F.lit(1)).alias("n_uni"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, "
                "element_at(toks, i + 1) AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2").filter(
        (F.col("w1") != "") & (F.col("w2") != "")
    )
    n_bi = bigrams.agg(F.count(F.lit(1)).alias("n_bi"))
    bi_counts = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _MIN_PAIR_COUNT)
    )
    c1 = uni_counts.select(
        F.col("w").alias("w1"), F.col("c_w").alias("c_a")
    )
    c2 = uni_counts.select(
        F.col("w").alias("w2"), F.col("c_w").alias("c_b")
    )
    return (
        bi_counts.join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_bi"))
                    / (
                        (F.col("c_a") / F.col("n_uni"))
                        * (F.col("c_b") / F.col("n_uni"))
                    )
                ),
                6,
            ),
        )
        .select("w1", "w2", "c_ab", "c_a", "c_b", "pmi")
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_TOP_PAIRS)
    )


PMI_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           string_split_regex(trim(lower(text)), '\s+') AS t
    FROM documents
),
unigrams AS (
    SELECT unnest(t) AS w FROM toks
),
uni AS (
    SELECT w, count(*) AS c_w FROM unigrams WHERE w <> '' GROUP BY w
),
n_uni AS (
    SELECT count(*) AS n_uni FROM unigrams WHERE w <> ''
),
bigrams AS (
    SELECT unnest(list_transform(range(1, len(t)),
                                 i -> struct_pack(w1 := t[i],
                                                  w2 := t[i + 1]))) AS b
    FROM toks
),
bi AS (
    SELECT b.w1 AS w1, b.w2 AS w2 FROM bigrams
    WHERE b.w1 <> '' AND b.w2 <> ''
),
n_bi AS (
    SELECT count(*) AS n_bi FROM bi
),
bi_counts AS (
    SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY w1, w2
    HAVING count(*) >= {_MIN_PAIR_COUNT}
)
SELECT w1, w2, c_ab, c1.c_w AS c_a, c2.c_w AS c_b,
       round(ln((c_ab::DOUBLE / n_bi.n_bi)
                / ((c1.c_w::DOUBLE / n_uni.n_uni)
                   * (c2.c_w::DOUBLE / n_uni.n_uni))), 6) AS pmi
FROM bi_counts
JOIN uni c1 ON c1.w = w1
JOIN uni c2 ON c2.w = w2
CROSS JOIN n_uni
CROSS JOIN n_bi
ORDER BY pmi DESC, w1, w2
LIMIT {_TOP_PAIRS}
"""


QUERIES = {
    "pmi_collocations": pmi_collocations,
}

ORACLES = {
    "pmi_collocations": PMI_SQL,
}
