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

from ..operators.materialize import materialize

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


def _features(docs: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """(doc_id, bucket): hashed unigram + bigram features, derived from
    PER-TOKEN polynomial hashes — each character is hashed once and
    bigram features are two integer ops, not a re-hash of the joined
    text (the interpreted-HOF lesson from the span-dedup sf1 rehearsal:
    character folds dominate; intermediate products stay < 2^63).
    The scan is spread-guarded — the per-token hash fold is CPU-dense
    pre-shuffle (r5 thirteenth-wave cliff: classifier 4.34 s -> 1.33 s
    at sf1)."""
    from ..operators.spread import spread_for_compute

    toks = spread_for_compute(docs.select("doc_id", "text")).select(
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
    # explode_outer + isNotNull: an inner Generate gets a Catalyst
    # size(...)>0 guard that re-evaluates the whole unigram+bigram hash
    # expression per row in a separate operator (the csl explode
    # measured ~7x slower that way). Feature hashes are never null and
    # docs with empty feature arrays produce one null row that the
    # filter drops — identical relation.
    return (
        hashed.select("doc_id", F.explode_outer(feats).alias("f"))
        .filter(F.col("f").isNotNull())
        .select("doc_id", (F.col("f") % n_buckets).alias("bucket"))
    )


def classifier_scores_from(docs: DataFrame) -> DataFrame:
    """Per-document score + keep decision over any (doc_id, text)
    relation — shared by the batch query below and the conformal
    monitor pair (batch + streaming), which score each document with
    exactly these expressions."""
    feats = _features(docs)
    scored = (
        feats.join(F.broadcast(_weights_df(docs.sparkSession)), "bucket")
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
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document classifier score + keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    return classifier_scores_from(docs).orderBy("doc_id")


def _features_sql(n_buckets: int) -> str:
    """toks/hashed/feats CTE bodies shared by the classifier and DSIR
    oracles — must mirror ``_features`` expression for expression."""
    from .sketches import _poly_hash_sql

    return rf"""toks AS (
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
    ) % {n_buckets} AS bucket
    FROM hashed
)"""


def _classifier_sql() -> str:
    from .sketches import _scrambled_hash_sql

    # weight derived from the bucket id, identically to _weights_df
    wh = _scrambled_hash_sql("'qw:' || bucket::VARCHAR")
    return rf"""
WITH {_features_sql(N_BUCKETS)}, weights AS (
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


# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023): the other canonical pretraining-data selection method next to
# the classifier above. Fit two bag-of-hashed-ngrams models — the TARGET
# distribution p (a small in-domain corpus; stood in by the src0/src1
# slice) and the SOURCE distribution q (the whole corpus) — and weight
# every document by its log likelihood ratio sum(count_f * (ln p_f -
# ln q_f)); resample the top of that ranking.
# --------------------------------------------------------------------------

N_DSIR_BUCKETS = 1 << 12  # the paper's hashed feature space (10^4-ish)
_DSIR_TARGET = ("src0", "src1")
_DSIR_K = 100


def dsir_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight + top-k selection flag.

    Scale shape: featurization is the classifier's scan-stage hashing
    (no vocabulary join); both distributions are single map-side-
    combinable aggregates with 2^12-row outputs; the log-ratio table
    broadcasts everywhere; scoring is one groupBy(doc) sum. The
    selection comes in BOTH forms the paper discusses: ``selected`` is
    the deterministic top-k of the ROUNDED weight (doc_id tiebreak,
    repo round-before-rank rule), and ``gumbel_selected`` is the
    paper's Gumbel-top-k resampling — log_w + Gumbel(0,1) noise derived
    from the cross-engine hash (u in (0,1) from the scrambled doc_id
    hash; g = -ln(-ln u)), which draws WITHOUT replacement from the
    softmax of the weights. Smoothing is add-one over the bucket space,
    so buckets unseen in the target get a finite negative lambda.
    """
    docs = load_table(spark, sf_dir, "documents")
    # The hashed feature stream feeds THREE consumers (source counts,
    # target counts, per-doc scoring) and Catalyst has no cross-branch
    # subtree reuse, so without materialization the tokenize + per-token
    # hash + explode pipeline executes once per consumer (the r10
    # before-plan shows the duplicated subtrees). materialize()
    # computes the (doc_id, bucket) relation — two ints per feature,
    # far narrower than the text — once per invocation, eager, inside
    # the timed region (recomputed every run; no cross-run cache). The
    # strategy is config-gated (spark.m4i.materialize.strategy):
    # localCheckpoint locally, persist/reliable checkpoint on clusters
    # where non-replicated checkpoint blocks are a liability.
    feats = _features(docs, N_DSIR_BUCKETS).transform(materialize)
    # Target features = the featurize output restricted to target docs
    # (featurization is row-local, so filtering after equals featurizing
    # the filtered corpus — the oracle's cp CTE states it this way too).
    tgt_ids = (
        docs.filter(F.col("source").isin(*_DSIR_TARGET)).select("doc_id")
    )
    # ONE aggregation produces BOTH distributions: a broadcast left
    # join marks target-doc features, count(_t) counts only them.
    # The previous two-relation form (cq, cp, then nq/np as aggregates
    # OVER them feeding lam via broadcast crossJoins) executed each
    # count subtree twice — once inside the nq/np broadcast builds and
    # once in the lam join (measured: the mid-query checkpoint phase at
    # 1.2-1.4 s warm, half of it duplicate aggregation). cp=0 rows here
    # are exactly the buckets the old left join left NULL —
    # coalesce(cp,0)+1 == cp+1, identical doubles into the identical
    # log/division expression.
    grouped = (
        feats.join(
            F.broadcast(tgt_ids.withColumn("_t", F.lit(1))), "doc_id", "left"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cq"),
            F.count("_t").alias("cp"),
        )
        # <= 2^12 rows by construction; materialize so the scalar-total
        # readout and the lam projection reuse one tiny relation.
        .transform(materialize)
    )
    # Scalar totals as literals (bounded 1-row readout, the admitted
    # collect class): exact integer sums < 2^53, so float() is exact
    # and (nq + b) / (np + b) are the same IEEE doubles the broadcast
    # crossJoin form computed.
    totals = grouped.agg(
        F.sum("cq").alias("nq"), F.sum("cp").alias("np")
    ).first()
    nq_lit = float(totals["nq"])
    np_lit = float(totals["np"])

    b = float(N_DSIR_BUCKETS)
    lam = grouped.select(
        "bucket",
        (
            F.log((F.col("cp") + 1) / F.lit(np_lit + b))
            - F.log((F.col("cq") + 1) / F.lit(nq_lit + b))
        ).alias("lam"),
    )

    scored = (
        feats.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.round(F.sum("lam"), 4).alias("log_w"),
        )
    )
    u = (
        T.scrambled_hash(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string")))
        + 1
    ) / F.lit(float(T.HASH_MOD) + 1)
    out = (
        docs.select("doc_id", "source")
        .join(scored, "doc_id")
        .withColumn("log_w_noisy", F.round(F.col("log_w") - F.log(-F.log(u)), 4))
        # Three consumers (top-k, Gumbel top-k, final projection) —
        # materialize the corpus-cardinality scored relation once
        # instead of recomputing the join + aggregation per consumer.
        .transform(materialize)
    )
    topk = (
        out.orderBy(F.desc("log_w"), "doc_id")
        .limit(_DSIR_K)
        .select("doc_id", F.lit(True).alias("sel"))
    )
    gumbel_topk = (
        out.orderBy(F.desc("log_w_noisy"), "doc_id")
        .limit(_DSIR_K)
        .select("doc_id", F.lit(True).alias("gsel"))
    )
    return (
        out.join(F.broadcast(topk), "doc_id", "left")
        .join(F.broadcast(gumbel_topk), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_features",
            "log_w",
            F.coalesce(F.col("sel"), F.lit(False)).alias("selected"),
            "log_w_noisy",
            F.coalesce(F.col("gsel"), F.lit(False)).alias("gumbel_selected"),
        )
        .orderBy("doc_id")
    )


def _dsir_sql() -> str:
    from .sketches import _scrambled_hash_sql

    tgt = ", ".join(f"'{s}'" for s in _DSIR_TARGET)
    b = N_DSIR_BUCKETS
    gh = _scrambled_hash_sql("'dsir:' || doc_id::VARCHAR")
    return rf"""
WITH {_features_sql(N_DSIR_BUCKETS)}, tgt_ids AS (
    SELECT doc_id FROM documents WHERE source IN ({tgt})
), cq AS (
    SELECT bucket, count(*) AS cq FROM feats GROUP BY bucket
), cp AS (
    SELECT f.bucket, count(*) AS cp
    FROM feats f JOIN tgt_ids USING (doc_id)
    GROUP BY f.bucket
), lam AS (
    SELECT cq.bucket,
           ln((coalesce(cp.cp, 0) + 1) /
              ((SELECT sum(cp)::DOUBLE FROM cp) + {b}))
         - ln((cq.cq + 1) /
              ((SELECT sum(cq)::DOUBLE FROM cq) + {b})) AS lam
    FROM cq LEFT JOIN cp USING (bucket)
), scored AS (
    SELECT doc_id, count(*) AS n_features, round(sum(lam), 4) AS log_w
    FROM feats JOIN lam USING (bucket)
    GROUP BY doc_id
), out AS (
    SELECT d.doc_id, d.source, s.n_features, s.log_w,
           round(s.log_w - ln(-ln((({gh}) + 1) / {float(T.HASH_MOD) + 1})), 4)
               AS log_w_noisy
    FROM documents d JOIN scored s USING (doc_id)
), topk AS (
    SELECT doc_id FROM out ORDER BY log_w DESC, doc_id LIMIT {_DSIR_K}
), gtopk AS (
    SELECT doc_id FROM out ORDER BY log_w_noisy DESC, doc_id LIMIT {_DSIR_K}
)
SELECT o.doc_id, o.source, o.n_features, o.log_w,
       o.doc_id IN (SELECT doc_id FROM topk) AS selected,
       o.log_w_noisy,
       o.doc_id IN (SELECT doc_id FROM gtopk) AS gumbel_selected
FROM out o
ORDER BY o.doc_id
"""


QUERIES["dsir_importance_resampling"] = dsir_importance_resampling
ORACLES["dsir_importance_resampling"] = _dsir_sql()


# --------------------------------------------------------------------------
# Classifier calibration vs the rule-based gates (reliability diagram)
# --------------------------------------------------------------------------
# The eval loop for the learned keep-model: bucket classifier scores
# into fixed-width bins and compare each bin's mean score against the
# RULE-based audit's keep rate (corpus_filter_audit), plus the Brier
# score per bin — a well-calibrated classifier's mean score tracks the
# observed keep rate. Fixed-width bins (not quantiles) keep the report
# deterministic and rank-free; everything after the two per-doc scans
# is a 10-row aggregate.


def classifier_calibration_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(score_bin, n_docs, mean_score, rule_keep_rate, brier) per
    fixed-width score decile, rule labels = corpus_filter_audit.kept."""
    from .llm_text import corpus_filter_audit

    scores = quality_classifier_scores(spark, sf_dir).select(
        "doc_id", "score"
    )
    labels = corpus_filter_audit(spark, sf_dir).select(
        "doc_id", F.col("kept").cast("long").alias("y")
    )
    joined = scores.join(labels, "doc_id").select(
        F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9)).alias(
            "score_bin"
        ),
        "score",
        "y",
    )
    return (
        joined.groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg(F.col("y").cast("double")), 6).alias(
                "rule_keep_rate"
            ),
            F.round(
                F.avg(
                    (F.col("score") - F.col("y"))
                    * (F.col("score") - F.col("y"))
                ),
                6,
            ).alias("brier"),
        )
        .orderBy("score_bin")
    )


def _calibration_sql() -> str:
    from .llm_text import ORACLES as TEXT_ORACLES

    audit = TEXT_ORACLES["corpus_filter_audit"].replace(
        "ORDER BY doc_id", ""
    )
    clf = ORACLES["quality_classifier_scores"].replace(
        "ORDER BY doc_id", ""
    )
    return f"""
WITH clf_out AS ({clf}),
audit_out AS ({audit}),
joined AS (
    SELECT least(floor(c.score * 10)::INT, 9) AS score_bin,
           c.score,
           CASE WHEN a.kept THEN 1 ELSE 0 END AS y
    FROM clf_out c JOIN audit_out a ON a.doc_id = c.doc_id
)
SELECT score_bin,
       count(*)::BIGINT AS n_docs,
       round(avg(score), 6) AS mean_score,
       round(avg(y::DOUBLE), 6) AS rule_keep_rate,
       round(avg((score - y) * (score - y)), 6) AS brier
FROM joined
GROUP BY score_bin
ORDER BY score_bin
"""


QUERIES["classifier_calibration_report"] = classifier_calibration_report
ORACLES["classifier_calibration_report"] = _calibration_sql()


# --------------------------------------------------------------------------
# Classifier AUC report — the ranking-quality companion to the
# calibration report: AUC computed EXACTLY via the Mann-Whitney U
# rank-sum identity with midrank tie correction,
#     AUC = (sum of positive midranks - n_pos(n_pos+1)/2)
#           / (n_pos * n_neg),
# labels = the rule-based gate decisions (corpus_filter_audit.kept),
# i.e. "how well does the learned score rank what the rules keep".
#
# Scale shape: scores are rounded to 6 decimals, so ranking reduces to
# the SCORE-DISTINCT relation (value-domain bounded at <= 1e6 rows
# regardless of corpus size — the exact_median_twopass argument): one
# per-score aggregate over the corpus, then cumsum + rank-sum over the
# bounded relation. No per-row global sort ever materializes.
# --------------------------------------------------------------------------


def classifier_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from .llm_text import corpus_filter_audit

    scores = quality_classifier_scores(spark, sf_dir).select(
        "doc_id", "score"
    )
    labels = corpus_filter_audit(spark, sf_dir).select(
        "doc_id", F.col("kept").cast("long").alias("y")
    )
    per_score = (
        scores.join(labels, "doc_id")
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("y").alias("n_pos_s"),
        )
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    ranked = per_score.select(
        "score",
        "cnt",
        "n_pos_s",
        (F.coalesce(F.sum("cnt").over(w), F.lit(0)) + 1).alias("min_rank"),
    ).select(
        "n_pos_s",
        # midrank of every member of this score group
        (F.col("min_rank") + (F.col("cnt") - 1) / 2.0).alias("midrank"),
    )
    totals = ranked.agg(
        F.sum("n_pos_s").alias("n_pos"),
        F.sum(F.col("n_pos_s") * F.col("midrank")).alias("rank_sum"),
    ).crossJoin(
        F.broadcast(
            scores.join(labels, "doc_id").agg(
                F.count(F.lit(1)).alias("n_all")
            )
        )
    )
    auc = (
        F.col("rank_sum") - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
    ) / (F.col("n_pos") * (F.col("n_all") - F.col("n_pos")))
    return totals.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        (F.col("n_all") - F.col("n_pos")).cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(2.0 * auc - 1.0, 6).alias("gini"),
    )


def _auc_sql() -> str:
    from .llm_text import _corpus_filter_audit_sql

    audit_sql = _corpus_filter_audit_sql().replace(';', '')
    return f"""
WITH audit AS ({audit_sql}
), joined AS (
    SELECT s.score, a.kept::BIGINT AS y
    FROM ({_classifier_sql().replace(';', '')}) s
    JOIN audit a USING (doc_id)
), per_score AS (
    SELECT score, count(*) AS cnt, sum(y) AS n_pos_s
    FROM joined GROUP BY score
), ranked AS (
    SELECT n_pos_s,
           coalesce(sum(cnt) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + 1 + (cnt - 1) / 2.0 AS midrank
    FROM per_score
), t AS (
    SELECT sum(n_pos_s) AS n_pos,
           sum(n_pos_s * midrank) AS rank_sum,
           (SELECT count(*) FROM joined) AS n_all
    FROM ranked
)
SELECT n_pos::BIGINT AS n_pos,
       (n_all - n_pos)::BIGINT AS n_neg,
       round((rank_sum - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * (n_all - n_pos)), 6) AS auc,
       round(2.0 * (rank_sum - n_pos * (n_pos + 1) / 2.0)
             / (n_pos * (n_all - n_pos)) - 1.0, 6) AS gini
FROM t
"""


QUERIES["classifier_auc_report"] = classifier_auc_report
ORACLES["classifier_auc_report"] = _auc_sql()


# --------------------------------------------------------------------------
# Split-conformal calibration of the keep gate (Vovk, Gammerman &
# Shafer, "Algorithmic Learning in a Random World", 2005; Angelopoulos
# & Bates, "A Gentle Introduction to Conformal Prediction", 2023) —
# the distribution-free companion to the calibration/AUC reports:
# instead of trusting the sigmoid's 0.5 cutoff, pick the score
# threshold so that a FRESH gate-kept document (labels = the
# per-document Gopher word-level gate) passes with
# probability >= 1 - alpha, guaranteed by exchangeability alone.
# Nonconformity of a calibration positive = 1 - score; q_hat = the
# ceil((n+1)(1-alpha))-th smallest; gate = score >= 1 - q_hat.
#
# Engine exactness: scores are already rounded to 6 dp, the quantile
# RANK is pure integer arithmetic ((9(n+1)+9) div 10 — no float ceil
# of 0.9(n+1), whose binary representation could straddle an integer),
# and the k-th smallest is selected on the SCORE-DISTINCT relation
# (<= 1e6 + 1 rows at any corpus size — the classifier_auc_report
# argument), never by a corpus-sized global sort.
# --------------------------------------------------------------------------

_CONF_ALPHA = 0.1


def conformal_scored_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, score, y, split) over any (doc_id, text, ...) document
    relation — the per-document projection both the batch gate and the
    streaming monitor score each document with exactly once. Labels =
    the published Gopher word-level gate (``gopher_report.kept``) —
    chosen over ``corpus_filter_audit`` because it is PER-DOCUMENT
    (the audit's near-dup flag needs cross-document LSH state, which
    would make the label batch-dependent in the streaming twin)."""
    from .llm_text import gopher_report

    scores = classifier_scores_from(docs).select("doc_id", "score")
    labels = gopher_report(docs.select("doc_id", "text")).select(
        "doc_id", F.col("kept").cast("long").alias("y")
    )
    return scores.join(labels, "doc_id").select(
        "doc_id",
        "score",
        "y",
        (
            T.scrambled_hash(
                F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))
            )
            % 2
        ).alias("split"),
    )


def conformal_report_from(
    cal_counts: DataFrame, test_counts: DataFrame
) -> DataFrame:
    """The one-row conformal report from the two SUFFICIENT-STATISTIC
    count relations — shared by the batch gate below and the streaming
    maintained-state twin (``stream_conformal_gate``), whose additive
    keyed counts equal the batch counts for any batch split:

    - ``cal_counts``: (nc, c) — calibration positives per distinct
      6-dp nonconformity value (<= 1e6 + 1 rows at any corpus size);
    - ``test_counts``: (score, y, c) — held-out documents per distinct
      (score, label) cell (<= 2(1e6 + 1) rows)."""
    from pyspark.sql.window import Window

    n_k = cal_counts.agg(F.sum("c").alias("n_cal")).select(
        "n_cal",
        F.least(
            F.floor((F.lit(9) * (F.col("n_cal") + 1) + 9) / 10).cast(
                "long"
            ),
            F.col("n_cal"),
        ).alias("k_rank"),
    )
    w = Window.orderBy("nc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cal_counts.select(
        "nc", F.sum("c").over(w).alias("cum")
    ).crossJoin(F.broadcast(n_k))
    q = cum.filter(F.col("cum") >= F.col("k_rank")).agg(
        F.coalesce(F.min("nc"), F.lit(1.0)).alias("qhat"),
        F.max("n_cal").alias("n_cal"),
        F.max("k_rank").alias("k_rank"),
    )
    thr = q.select(
        "n_cal",
        "k_rank",
        "qhat",
        F.round(1 - F.col("qhat"), 6).alias("thr"),
    )
    test = test_counts.crossJoin(F.broadcast(thr))
    pos = F.when(F.col("y") == 1, F.col("c")).otherwise(0)
    neg = F.when(F.col("y") == 0, F.col("c")).otherwise(0)
    return test.agg(
        F.lit(_CONF_ALPHA).alias("alpha"),
        F.max("n_cal").alias("n_cal_pos"),
        F.max("k_rank").alias("k_rank"),
        F.round(F.max("qhat"), 6).alias("qhat"),
        F.round(F.max("thr"), 6).alias("score_threshold"),
        F.round(
            F.sum(
                F.when(F.col("score") >= F.col("thr"), pos).otherwise(0)
            )
            / F.greatest(F.sum(pos), F.lit(1)).cast("double"),
            6,
        ).alias("test_coverage"),
        F.round(
            F.sum(
                F.when(F.col("score") >= F.col("thr"), neg).otherwise(0)
            )
            / F.greatest(F.sum(neg), F.lit(1)).cast("double"),
            6,
        ).alias("test_false_keep_rate"),
        F.sum(pos).alias("n_test_pos"),
        F.sum(neg).alias("n_test_neg"),
    )


def conformal_keep_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row report: the conformal score threshold calibrated on the
    hash-split calibration half's Gopher-kept documents, plus held-out
    test coverage (fraction of test positives passing — guaranteed
    >= 1 - alpha in expectation) and the false-keep rate it buys."""
    base = conformal_scored_docs(load_table(spark, sf_dir, "documents"))
    cal_counts = (
        base.filter((F.col("split") == 0) & (F.col("y") == 1))
        .groupBy(F.round(1 - F.col("score"), 6).alias("nc"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    test_counts = (
        base.filter(F.col("split") == 1)
        .groupBy("score", "y")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return conformal_report_from(cal_counts, test_counts)


def _conformal_sql() -> str:
    from .llm_text import ORACLES as TEXT_ORACLES
    from .sketches import _scrambled_hash_sql

    gate = TEXT_ORACLES["gopher_quality_rules"].replace(
        "ORDER BY doc_id", ""
    )
    clf = ORACLES["quality_classifier_scores"].replace(
        "ORDER BY doc_id", ""
    )
    split = _scrambled_hash_sql("'conf:' || c.doc_id::VARCHAR")
    return f"""
WITH clf_out AS ({clf}),
audit_out AS ({gate}),
base AS (
    SELECT c.doc_id, c.score,
           CASE WHEN a.kept THEN 1 ELSE 0 END AS y,
           ({split}) % 2 AS split
    FROM clf_out c JOIN audit_out a ON a.doc_id = c.doc_id
), cal_pos AS (
    SELECT round(1 - score, 6) AS nc FROM base
    WHERE split = 0 AND y = 1
), n_k AS (
    SELECT count(*) AS n_cal,
           least((9 * (count(*) + 1) + 9) // 10, count(*)) AS k_rank
    FROM cal_pos
), dist AS (
    SELECT nc, count(*) AS c FROM cal_pos GROUP BY nc
), cum AS (
    SELECT nc, sum(c) OVER (ORDER BY nc) AS cum FROM dist
), q AS (
    SELECT coalesce(min(nc), 1.0) AS qhat,
           max(n_cal) AS n_cal, max(k_rank) AS k_rank
    FROM cum, n_k WHERE cum >= k_rank
), thr AS (
    SELECT n_cal, k_rank, qhat, round(1 - qhat, 6) AS thr FROM q
), test AS (
    SELECT score, y FROM base WHERE split = 1
)
SELECT {_CONF_ALPHA} AS alpha,
       max(thr.n_cal)::BIGINT AS n_cal_pos,
       max(thr.k_rank)::BIGINT AS k_rank,
       round(max(thr.qhat), 6) AS qhat,
       round(max(thr.thr), 6) AS score_threshold,
       round(sum(CASE WHEN y = 1 AND score >= thr.thr THEN 1 ELSE 0 END)
             / greatest(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END), 1)::DOUBLE,
             6) AS test_coverage,
       round(sum(CASE WHEN y = 0 AND score >= thr.thr THEN 1 ELSE 0 END)
             / greatest(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END), 1)::DOUBLE,
             6) AS test_false_keep_rate,
       sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)::BIGINT AS n_test_pos,
       sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)::BIGINT AS n_test_neg
FROM test, thr
"""


QUERIES["conformal_keep_gate"] = conformal_keep_gate
ORACLES["conformal_keep_gate"] = _conformal_sql()
