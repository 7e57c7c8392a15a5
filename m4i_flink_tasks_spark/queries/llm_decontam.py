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

from ..operators.materialize import materialize

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
            # Deliberately INNER explode: unlike the r10 sweep sites,
            # the plan dump (plans/r11/source_vocab_overlap_before.txt)
            # shows Catalyst does NOT insert a size()>0 guard filter for
            # this Generate shape, so the outer+null-filter rewrite buys
            # nothing here (verified by before/after dumps).
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


# --------------------------------------------------------------------------
# Cross-split near-duplicate leakage (decontamination by near-dup)
# --------------------------------------------------------------------------
# benchmark_decontamination catches EXACT n-gram overlap with an eval
# set; this is its near-duplicate complement — the Dolma/Pile-style
# audit for train documents that are ~the same text as a val/test
# document (train/eval leakage inflates benchmark scores without any
# verbatim n-gram hit). Pairs are found with the same AllPairs/PPJoin
# prefix-filter THEOREM as ppjoin_exact_jaccard (queries/llm_dedup.py),
# applied bipartite: the canonical token order (global df asc, token)
# is computed over the UNION of both sides, so the prefix argument
# holds for each side independently and the candidate join is
# train-prefix x eval-prefix — never all-pairs, no false negatives.
# The leakage threshold is deliberately LOWER than the dedup threshold
# (3/5 vs 4/5): an audit wants the gray zone, and the verify predicate
# stays pure integer cross-multiplication (8c >= 3(n_a + n_b)).

_LEAK_T_NUM, _LEAK_T_DEN = 3, 5


def cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 3/5 pairs between train docs and val/test docs
    of the sampled corpus (split assignment = corpus_sampling_splits'
    deterministic hash gates). Oracle runs the brute-force bipartite
    definition, so a hash match proves the prefix filter's
    completeness on this corpus."""
    from pyspark.sql import Window

    from ..operators import dedup as D
    from .llm_corpus import sampling_split_exprs

    # Split assignment is a pure function of (doc_id, lang) — compute
    # it INLINE on the corpus scan instead of joining
    # corpus_sampling_splits back by doc_id. The join form cost a
    # corpus exchange and, worse, placed the shingle projection in a
    # different codegen stage from the explode-inferred
    # size(shingles)>0 filter, so the whole shingle transform ran
    # TWICE per row (measured: toks pass 5.9 s join form vs 2.6 s
    # fused, sf0.1). Guide §2.4 (remove shuffles outright).
    _, sample_bucket, rate, split = sampling_split_exprs()
    # The compact testdata plans the documents scan as ONE split, so
    # the CPU-dense shingle transform would serialize on a single core
    # (measured: toks pass 3.8-5.2 s on 1 of 32 tasks). Spread the RAW
    # text rows (post-filter, pre-shingle — only doc_id/lang/text cross
    # the narrow exchange) so the shingle+explode stage fans out;
    # no-op on a well-laid-out table (guide §2.5 input skew).
    from ..operators.spread import spread_for_compute

    docs = spread_for_compute(
        load_table(spark, sf_dir, "documents")
        .filter(sample_bucket < rate)
        .select("doc_id", "lang", "text")
    ).select(
        "doc_id",
        split.alias("split"),
        D.shingles(F.col("text")).alias("sh"),
    )
    toks = (
        # explode_outer + isNotNull instead of inner explode: Catalyst
        # guards an inner Generate with a size(sh)>0 filter that
        # re-evaluates the WHOLE shingle HOF per row in a separate
        # operator (measured 2.4-4.2 s vs 0.4-0.6 s for the outer form
        # at sf0.1 — identical 186,755 output rows; the null-filter on
        # the generated column replaces the empty-array drop exactly:
        # shingle strings are never null).
        docs.select("doc_id", "split", F.explode_outer("sh").alias("tok"))
        .filter(F.col("tok").isNotNull())
        # The exploded token relation feeds FIVE consumers keyed three
        # different ways (doc_id for sizes/prefix, tok for df/cand,
        # (id, tok) twice for the overlap count) — Catalyst has no
        # cross-branch subtree reuse, so without materialization the
        # scan + shingle explode executes five times (measured: 5
        # duplicate subtrees in the r10 before-plan). materialize()
        # computes it ONCE per invocation — eager, inside the
        # timed region, recomputed on every run (no cross-run cache;
        # guide §5 "cheaper way to cut lineage"). The strategy is
        # config-gated (spark.m4i.materialize.strategy): localCheckpoint
        # locally, persist/reliable checkpoint on clusters where
        # non-replicated checkpoint blocks are a liability.
        .transform(materialize)
    )
    sizes = toks.groupBy("doc_id").agg(
        F.first("split").alias("split"), F.count(F.lit(1)).alias("n")
    ).transform(materialize)
    # Global canonical order over BOTH sides: shingle df is
    # near-linear in corpus size — aggregated, never broadcast.
    df_rel = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    prefix = (
        toks.join(df_rel, "tok")
        .join(sizes.select("doc_id", "n"), "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.col("n")
            - F.expr(
                f"({_LEAK_T_NUM} * n + {_LEAK_T_DEN} - 1) "
                f"DIV {_LEAK_T_DEN}"
            )
            + 1
        )
        .select("doc_id", "split", "tok", "n")
        # Two consumers (the train and eval sides of the candidate
        # join) — materialize so the df-join + window run once.
        .transform(materialize)
    )
    pa = prefix.filter(F.col("split") == "train").alias("pa")
    pb = prefix.filter(F.col("split") != "train").alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.tok") == F.col("pb.tok"))
            # AllPairs length filter: t*|A| <= |B| <= |A|/t, integer form
            & (
                _LEAK_T_DEN * F.col("pb.n")
                >= _LEAK_T_NUM * F.col("pa.n")
            )
            & (
                _LEAK_T_DEN * F.col("pa.n")
                >= _LEAK_T_NUM * F.col("pb.n")
            ),
        )
        .select(
            F.col("pa.doc_id").alias("id_train"),
            F.col("pb.doc_id").alias("id_eval"),
        )
        .distinct()
    )
    # Overlap only for candidates, compound (id_eval, tok) join key —
    # the same no-fan-out discipline as ppjoin_exact_jaccard.
    co = (
        cand.join(
            toks.select(F.col("doc_id").alias("id_train"), "tok"),
            "id_train",
        )
        .join(
            toks.select(F.col("doc_id").alias("id_eval"), "tok"),
            ["id_eval", "tok"],
        )
        .groupBy("id_train", "id_eval")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(
        F.col("doc_id").alias("id_train"), F.col("n").alias("n_train")
    )
    nb = sizes.select(
        F.col("doc_id").alias("id_eval"),
        F.col("split").alias("eval_split"),
        F.col("n").alias("n_eval"),
    )
    return (
        co.join(na, "id_train")
        .join(nb, "id_eval")
        .filter(
            (_LEAK_T_NUM + _LEAK_T_DEN) * F.col("n_shared")
            >= _LEAK_T_NUM * (F.col("n_train") + F.col("n_eval"))
        )
        .select(
            "id_train",
            "id_eval",
            "eval_split",
            "n_shared",
            "n_train",
            "n_eval",
            F.round(
                F.col("n_shared")
                / (F.col("n_train") + F.col("n_eval") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("id_train", "id_eval")
    )


def _cross_split_leakage_sql() -> str:
    # Shingle CTEs sliced from the ppjoin oracle so the 3-gram
    # definition cannot drift between the two audits; split CTE from
    # the sampling-splits oracle for the same reason.
    from .llm_corpus import _sampling_splits_sql
    from .llm_dedup import PPJOIN_SQL

    shingle_ctes = PPJOIN_SQL.split("sizes AS")[0].strip().rstrip(",")
    splits = _sampling_splits_sql().replace("ORDER BY doc_id", "")
    return f"""
{shingle_ctes},
split_out AS ({splits}),
stoks AS (
    SELECT t.doc_id, s.split, t.tok
    FROM toks t JOIN split_out s ON s.doc_id = t.doc_id
),
sizes AS (
    SELECT doc_id, any_value(split) AS split, count(*) AS n
    FROM stoks GROUP BY doc_id
),
co AS (
    SELECT a.doc_id AS id_train, b.doc_id AS id_eval,
           count(*) AS n_shared
    FROM stoks a JOIN stoks b
      ON a.tok = b.tok AND a.split = 'train' AND b.split <> 'train'
    GROUP BY 1, 2
)
SELECT co.id_train, co.id_eval,
       sb.split AS eval_split,
       co.n_shared,
       sa.n AS n_train, sb.n AS n_eval,
       round(co.n_shared::DOUBLE / (sa.n + sb.n - co.n_shared), 6)
           AS jaccard
FROM co
JOIN sizes sa ON sa.doc_id = co.id_train
JOIN sizes sb ON sb.doc_id = co.id_eval
WHERE ({_LEAK_T_NUM + _LEAK_T_DEN}) * co.n_shared
      >= {_LEAK_T_NUM} * (sa.n + sb.n)
ORDER BY co.id_train, co.id_eval
"""


QUERIES["cross_split_leakage"] = cross_split_leakage
ORACLES["cross_split_leakage"] = _cross_split_leakage_sql()


# --------------------------------------------------------------------------
# Epoch budgeting under data constraints (Muennighoff et al., "Scaling
# Data-Constrained Language Models", NeurIPS 2023): when the token
# budget exceeds the deduplicated corpus, domains are REPEATED — and
# repeated tokens decay in value. The fitted law: with R repeat epochs
# beyond the first over U unique tokens, the effective data seen is
#     D' = U + U * R_STAR * (1 - exp(-R / R_STAR)),   R_STAR ~= 15,
# i.e. fresh-equivalent up to ~4 epochs, asymptoting at ~16 epochs of
# value. This query turns the mixture table into the per-domain epoch
# PLAN a data-constrained run ships: budget allocation, epochs,
# repeat regime, effective tokens, and budget utilization.
# Everything runs on the #sources-sized aggregate — the corpus is
# touched once for token totals.
# --------------------------------------------------------------------------

_BUDGET_MULT = 3.0  # train-token budget as a multiple of corpus tokens
_R_STAR = 15.0  # fitted repeat half-value constant (Muennighoff et al.)


def epoch_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    mix = domain_mixture_weights(spark, sf_dir)
    budget = mix.agg(
        (F.sum("total_tokens") * F.lit(_BUDGET_MULT)).alias("_budget")
    )
    planned = mix.crossJoin(F.broadcast(budget)).withColumn(
        "target_tokens",
        F.round(F.col("_budget") * F.col("mixture_weight")).cast("long"),
    )
    epochs = F.col("target_tokens") / F.col("total_tokens")
    repeats = F.greatest(epochs - 1.0, F.lit(0.0))
    effective = F.col("total_tokens") * (
        1.0
        + F.lit(_R_STAR)
        * (1.0 - F.exp(-repeats / F.lit(_R_STAR)))
    )
    return planned.select(
        "source",
        "n_docs",
        "total_tokens",
        "mixture_weight",
        "target_tokens",
        F.round(epochs, 6).alias("epochs"),
        F.when(epochs <= 1.0, "fresh")
        .when(epochs <= 4.0, "cheap_repeat")
        .otherwise("diminishing")
        .alias("repeat_regime"),
        F.round(effective, 2).alias("effective_tokens"),
        F.round(
            effective / F.col("target_tokens"), 6
        ).alias("utilization"),
    ).orderBy("source")


EPOCH_BUDGET_SQL = f"""
WITH s AS (
    SELECT source,
           count(*) AS n_docs,
           sum(len(string_split(text, ' ')))::BIGINT AS total_tokens
    FROM documents
    GROUP BY source
), mix AS (
    SELECT source, n_docs, total_tokens,
           round(pow(total_tokens::DOUBLE, {_MIX_ALPHA})
                 / sum(pow(total_tokens::DOUBLE, {_MIX_ALPHA})) OVER (), 6)
               AS mixture_weight,
           sum(total_tokens) OVER () * {_BUDGET_MULT} AS budget
    FROM s
), planned AS (
    SELECT *, round(budget * mixture_weight)::BIGINT AS target_tokens
    FROM mix
)
SELECT source, n_docs, total_tokens, mixture_weight, target_tokens,
       round(target_tokens::DOUBLE / total_tokens, 6) AS epochs,
       CASE WHEN target_tokens::DOUBLE / total_tokens <= 1.0 THEN 'fresh'
            WHEN target_tokens::DOUBLE / total_tokens <= 4.0
                THEN 'cheap_repeat'
            ELSE 'diminishing' END AS repeat_regime,
       round(total_tokens * (1.0 + {_R_STAR} * (1.0 - exp(
           -greatest(target_tokens::DOUBLE / total_tokens - 1.0, 0.0)
           / {_R_STAR}))), 2) AS effective_tokens,
       round(total_tokens * (1.0 + {_R_STAR} * (1.0 - exp(
           -greatest(target_tokens::DOUBLE / total_tokens - 1.0, 0.0)
           / {_R_STAR}))) / target_tokens, 6) AS utilization
FROM planned
ORDER BY source
"""

QUERIES["epoch_budget_plan"] = epoch_budget_plan
ORACLES["epoch_budget_plan"] = EPOCH_BUDGET_SQL
