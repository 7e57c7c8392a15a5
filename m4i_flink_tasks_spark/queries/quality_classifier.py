"""Hashed linear quality classifier — the fastText-shaped model quality
filter of a pretraining pipeline (Joulin et al., "Bag of Tricks for
Efficient Text Classification", 2016; the filter family used by
DCLM/phi-style data curation): score = sigmoid(mean of hashed n-gram
feature weights), keep documents above a threshold.

The model here is a STAND-IN with deterministic weights derived from
the cross-engine hash (a real deployment loads trained weights as a
broadcast table — same plan, different literals): each unigram and
bigram hashes into a 2^16 bucket space, and the bucket weight is a
fixed pseudo-random value in [-1, 1). What the query proves is the
SERVING shape at scale:

- featurize = explode tokens/bigrams → hash to bucket — scan-stage
  expressions, no vocabulary lookup at all (the hashing trick: the
  model table is an ARRAY indexable by bucket, not a string-keyed
  join);
- score = one groupBy(doc) mean — a single map-side-combinable
  aggregation over the feature stream;
- the 2^16-float weight table broadcasts everywhere (256 KB); at any
  corpus size the classifier costs one scan + one aggregation.

Weights are materialized as a relation (bucket → weight) and joined by
bucket rather than inlined as a 65k-branch CASE: the join is
broadcast-hash on an integer key, which is exactly how a real weight
table ships. Scores round to 6 before the keep decision so both
engines agree on boundary documents.

No reference analogue (SURVEY §2.6); north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..sources import load_table

N_BUCKETS = 1 << 16
_KEEP_THRESHOLD = 0.5


def _weights_df(spark: SparkSession) -> DataFrame:
    """(bucket, weight): deterministic pseudo-random weights in [-1, 1),
    computed FROM the bucket id with the scrambled hash so both engines
    derive identical values without shipping 65k literals."""
    return spark.range(N_BUCKETS).select(
        F.col("id").alias("bucket"),
        F.round(
            (
                T.scrambled_hash(F.concat(F.lit("qw:"), F.col("id").cast("string")))
                / F.lit(float(T.HASH_MOD))
            )
            * 2
            - 1,
            9,
        ).alias("weight"),
    )


# combining base for bigram features (same constant as the span hash)
_B2 = 1_000_003


def _features(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket): hashed unigram + bigram features, derived from
    PER-TOKEN polynomial hashes — each character is hashed once and
    bigram features are two integer ops, not a re-hash of the joined
    text (the interpreted-HOF lesson from the span-dedup sf1 rehearsal:
    character folds dominate; intermediate products stay < 2^63)."""
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= 1)
    hashed = toks.select(
        "doc_id",
        F.transform(F.col("t"), lambda w: T.poly_hash(w)).alias("th"),
    )
    feats = F.expr(
        f"concat("
        f"transform(th, x -> (x * {T.MIX_MULT}) % {T.HASH_MOD}), "
        f"CASE WHEN size(th) >= 2 THEN "
        f"transform(sequence(1, size(th) - 1), "
        f"i -> (((th[i-1] * {_B2} + th[i]) % {T.HASH_MOD}) "
        f"* {T.MIX_MULT}) % {T.HASH_MOD}) "
        f"ELSE array() END)"
    )
    return hashed.select("doc_id", F.explode(feats).alias("f")).select(
        "doc_id", (F.col("f") % N_BUCKETS).alias("bucket")
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document classifier score + keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    feats = _features(docs)
    scored = (
        feats.join(F.broadcast(_weights_df(spark)), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.avg("weight"))), 6
            ).alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "n_features",
        "score",
        (F.col("score") >= _KEEP_THRESHOLD).alias("keep"),
    ).orderBy("doc_id")


def _classifier_sql() -> str:
    from .sketches import _poly_hash_sql, _scrambled_hash_sql

    # weight derived from the bucket id, identically to _weights_df
    wh = _scrambled_hash_sql("'qw:' || bucket::VARCHAR")
    return rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
    FROM documents
), hashed AS (
    SELECT doc_id, list_transform(t, w -> {_poly_hash_sql("w")}) AS th
    FROM toks WHERE len(t) >= 1
), feats AS (
    SELECT doc_id, unnest(
        list_concat(
            list_transform(th, x -> (x * {T.MIX_MULT}) % {T.HASH_MOD}),
            CASE WHEN len(th) >= 2 THEN
                list_transform(range(1, len(th)),
                    i -> (((th[i] * {_B2} + th[i + 1]) % {T.HASH_MOD})
                          * {T.MIX_MULT}) % {T.HASH_MOD})
            ELSE [] END
        )
    ) % {N_BUCKETS} AS bucket
    FROM hashed
), weights AS (
    SELECT range AS bucket,
           round(({wh.replace("bucket", "range")}) / 1000000007::DOUBLE * 2 - 1, 9)
               AS weight
    FROM range({N_BUCKETS})
), scored AS (
    SELECT doc_id, count(*) AS n_features,
           round(1.0 / (1.0 + exp(-avg(weight))), 6) AS score
    FROM feats JOIN weights USING (bucket)
    GROUP BY doc_id
)
SELECT doc_id, n_features, score, score >= {_KEEP_THRESHOLD} AS keep
FROM scored
ORDER BY doc_id
"""


QUERIES = {
    "quality_classifier_scores": quality_classifier_scores,
}

ORACLES = {
    "quality_classifier_scores": _classifier_sql(),
}
