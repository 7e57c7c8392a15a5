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
        F.explode_outer("toks").alias("w")
    ).filter(F.col("w") != "")
    uni_counts = unigrams.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_w")
    )
    n_uni = unigrams.agg(F.count(F.lit(1)).alias("n_uni"))
    # outer explode: null structs (empty arrays) fail the != ''
    # filters; avoids the Generate guard re-computing the transform.
    bigrams = toks.select(
        F.explode_outer(
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


_MIN_CO = 3
_TOP_RULES = 20


def supplier_cooccurrence_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets — the
    relational sibling of the PMI collocations: supplier pairs that
    co-occur in the same order, scored with support, directional
    confidence, and lift, top-20 by lift. The association-mining
    classic (Agrawal & Srikant 1994) as one Spark dataflow.

    Scale shape: baskets are distinct (order, supplier) rows; the pair
    join shuffles on the order key and each order holds a handful of
    suppliers, so pair fan-out is bounded per order (never |items|^2
    global); item and pair counts are map-side-combinable aggregates,
    and the final scoring joins are dimension-sized (suppliers and
    surviving pairs)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    baskets = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    ).distinct()
    n_orders = baskets.select("ok").distinct().count()
    supp = baskets.groupBy("s").agg(F.count(F.lit(1)).alias("n_s"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, "ok")
        .filter(F.col("a.s") < F.col("b.s"))
        .groupBy(
            F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b")
        )
        .agg(F.count(F.lit(1)).alias("co_orders"))
        .filter(F.col("co_orders") >= _MIN_CO)
    )
    na = supp.select(F.col("s").alias("s_a"), F.col("n_s").alias("n_a"))
    nb = supp.select(F.col("s").alias("s_b"), F.col("n_s").alias("n_b"))
    scored = (
        pairs.join(F.broadcast(na), "s_a")
        .join(F.broadcast(nb), "s_b")
        .select(
            "s_a",
            "s_b",
            "co_orders",
            F.round(F.col("co_orders") / F.lit(n_orders), 6).alias(
                "support"
            ),
            F.round(F.col("co_orders") / F.col("n_a"), 6).alias(
                "conf_a_to_b"
            ),
            F.round(F.col("co_orders") / F.col("n_b"), 6).alias(
                "conf_b_to_a"
            ),
            F.round(
                F.col("co_orders")
                * F.lit(n_orders)
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "s_a", "s_b").limit(_TOP_RULES)


COOCCURRENCE_SQL = f"""
WITH baskets AS (
    SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s FROM lineitem
),
n_orders AS (SELECT count(DISTINCT ok) AS n FROM baskets),
supp AS (SELECT s, count(*) AS n_s FROM baskets GROUP BY s),
pairs AS (
    SELECT a.s AS s_a, b.s AS s_b, count(*) AS co_orders
    FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.s < b.s
    GROUP BY a.s, b.s
    HAVING count(*) >= {_MIN_CO}
)
SELECT s_a, s_b, co_orders,
       round(co_orders::DOUBLE / n.n, 6) AS support,
       round(co_orders::DOUBLE / na.n_s, 6) AS conf_a_to_b,
       round(co_orders::DOUBLE / nb.n_s, 6) AS conf_b_to_a,
       round(co_orders::DOUBLE * n.n / (na.n_s * nb.n_s), 6) AS lift
FROM pairs, n_orders n
JOIN supp na ON na.s = pairs.s_a
JOIN supp nb ON nb.s = pairs.s_b
ORDER BY lift DESC, s_a, s_b
LIMIT {_TOP_RULES}
"""

QUERIES["supplier_cooccurrence_rules"] = supplier_cooccurrence_rules
ORACLES["supplier_cooccurrence_rules"] = COOCCURRENCE_SQL
