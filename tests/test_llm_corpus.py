"""Edge-case pins for the corpus-curation family (queries/llm_corpus.py).

The oracle-parity gate proves the whole-corpus hash at every SF; these
tests pin the per-row semantics on crafted inputs the generated corpus
doesn't contain (empty text, single token, fully-repeated text, exact
budget boundaries) so a future refactor can't drift on the edges while
staying hash-equal on the happy path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.operators import text as T
from m4i_flink_tasks_spark.queries.llm_corpus import (
    _PACK_BUDGET,
    _SAMPLE_RATES,
    _EMAIL_RE,
    _PHONE_RE,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


# --------------------------------------------------------------------------
# repetition metrics
# --------------------------------------------------------------------------


def _repetition_over(spark, rows):
    """Run the repetition dataflow over crafted docs (same expressions
    as the query, which is bound to load_table)."""
    docs = _docs(spark, rows)
    toks = docs.select("doc_id", T.tokens(F.lower(F.col("text"))).alias("t"))
    base = toks.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.round(
            1 - F.size(F.array_distinct("t")) / F.greatest(F.size("t"), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1),"
                " i -> concat_ws(' ', t[i-1], t[i])) ELSE array() END"
            )
        ).alias("bigram"),
    )
    bg = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_c"),
            F.sum("c").alias("total_bg"),
        )
    )
    out = base.join(bg, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "dup_token_frac",
        F.round(
            F.coalesce(F.col("top_c") / F.col("total_bg"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_repetition_fully_repeated_doc(spark):
    got = _repetition_over(
        spark,
        [
            (1, "spam spam spam spam", "en", "s"),
            (2, "a b c d", "en", "s"),
        ],
    )
    # 4 tokens, 1 distinct -> dup fraction 0.75; every bigram identical.
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["top_bigram_frac"] == 1.0
    # all-distinct doc: no duplication, 3 distinct bigrams of count 1.
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)


def test_repetition_degenerate_docs_do_not_vanish(spark):
    # one-token and empty docs have no bigrams: the left join must keep
    # them with zeroed fractions rather than dropping the rows.
    got = _repetition_over(
        spark, [(1, "lonely", "en", "s"), (2, "", "en", "s")]
    )
    assert got[1]["n_tokens"] == 1
    assert got[1]["top_bigram_frac"] == 0.0
    assert set(got) == {1, 2}


# --------------------------------------------------------------------------
# sequence packing
# --------------------------------------------------------------------------


def _pack(spark, sizes, budget=_PACK_BUDGET):
    """Assign crafted per-doc token counts through the same exclusive
    prefix-sum binning expression the query uses."""
    from pyspark.sql import Window

    rows = [(i, n, "src") for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, source string")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df.select(
        "doc_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget
        ).alias("seq_id"),
    )
    return [r["seq_id"] for r in out.orderBy("doc_id").collect()]


def test_packing_exact_budget_boundary(spark):
    # 256+256 fill sequence 0 exactly; the next doc starts sequence 1.
    assert _pack(spark, [256, 256, 10], budget=512) == [0, 0, 1]


def test_packing_overflow_straddles_by_at_most_one_doc(spark):
    # 500 then 300: the 300 starts inside sequence 0 (exclusive prefix
    # 500 < 512) and straddles — documented best-effort contract.
    assert _pack(spark, [500, 300, 300], budget=512) == [0, 0, 1]


def test_packing_oversized_doc_owns_its_sequences(spark):
    # a 1200-token doc at prefix 0 sits in sequence 0; the follower
    # starts at prefix 1200 -> sequence 2 (floor(1200/512)).
    assert _pack(spark, [1200, 10], budget=512) == [0, 2]


# --------------------------------------------------------------------------
# deterministic sampling / splits
# --------------------------------------------------------------------------


def test_sampling_is_partitioning_invariant(spark, sf_dir):
    from m4i_flink_tasks_spark.queries.llm_corpus import corpus_sampling_splits

    a = corpus_sampling_splits(spark, sf_dir).collect()
    # Same query against a repartitioned scan must select the exact
    # same rows with the same buckets: selection is a pure row function.
    b = corpus_sampling_splits(spark, sf_dir)
    b = b.repartition(7).orderBy("doc_id").collect()
    assert a == b
    # rates actually bite: the downsampled language keeps fewer than
    # the keep-all languages relative to corpus share.
    kept = {r["doc_id"] for r in a}
    assert kept, "sampling must keep a non-empty corpus"
    for lang, rate in _SAMPLE_RATES.items():
        assert rate < 100  # this test assumes downsampling rates


def test_weighted_sample_is_length_biased_and_stable(spark, sf_dir):
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        _WRS_K,
        weighted_corpus_sample,
    )
    from m4i_flink_tasks_spark.operators import text as T
    from m4i_flink_tasks_spark.sources import load_table
    from pyspark.sql import functions as F

    a = weighted_corpus_sample(spark, sf_dir).collect()
    assert len(a) == _WRS_K
    # Pure row function: repartitioning cannot change the drawn set.
    b = weighted_corpus_sample(spark, sf_dir)
    assert a == b.repartition(7).orderBy(
        F.desc("sample_key"), "doc_id"
    ).collect()
    # Weighting bites: the length-weighted sample overrepresents long
    # documents (margin far below the ~1.2-1.3x observed at every SF).
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .agg(F.avg(F.greatest(T.token_count(F.col("text")), F.lit(1))))
        .first()[0]
    )
    sample_mean = sum(r["n_tokens"] for r in a) / len(a)
    assert sample_mean > 1.05 * corpus_mean


def test_temperature_flattens_dominant_language(spark, sf_dir):
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        _TEMP_K,
        temperature_mixture_sample,
    )
    from m4i_flink_tasks_spark.sources import load_table

    rows = temperature_mixture_sample(spark, sf_dir).collect()
    assert len(rows) == _TEMP_K  # largest-remainder quotas sum exactly
    docs = load_table(spark, sf_dir, "documents")
    corpus = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(corpus.values())
    sampled = {}
    for r in rows:
        sampled[r["lang"]] = sampled.get(r["lang"], 0) + 1
    # every language present, and alpha=0.5 pulls the dominant
    # language's share strictly toward uniform (en is ~40% of the
    # corpus at every SF; the flattened mix sits near 30%).
    assert set(sampled) == set(corpus)
    dom = max(corpus, key=corpus.get)
    assert sampled[dom] / _TEMP_K < corpus[dom] / total
    assert sampled[dom] > _TEMP_K / len(corpus)  # but not flattened to uniform


def test_split_fractions_roughly_match_design(spark, sf_dir):
    from m4i_flink_tasks_spark.queries.llm_corpus import corpus_sampling_splits

    rows = corpus_sampling_splits(spark, sf_dir).collect()
    frac_train = sum(r["split"] == "train" for r in rows) / len(rows)
    # 80% design with generous tolerance at smoke scale
    assert 0.6 < frac_train < 0.95


# --------------------------------------------------------------------------
# PII scrub
# --------------------------------------------------------------------------


def test_pii_patterns_scrub_and_count(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_9@ex-ample.co.uk now"),
            (2, "call 555-0199 or 555-12345 x"),
            (3, "clean text only"),
        ],
        "doc_id long, dirty string",
    )
    out = df.select(
        "doc_id",
        F.size(F.regexp_extract_all("dirty", F.lit(_EMAIL_RE), 0)).alias("e"),
        F.size(F.regexp_extract_all("dirty", F.lit(_PHONE_RE), 0)).alias("p"),
        F.regexp_replace(
            F.regexp_replace("dirty", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("s"),
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["e"] == 1 and "<EMAIL>" in by_id[1]["s"]
    assert "@" not in by_id[1]["s"]
    # 555-0199 matches; 555-12345 must NOT (the \b boundary guards
    # against partial-number mangling)
    assert by_id[2]["p"] == 1
    assert "555-12345" in by_id[2]["s"] and "<PHONE>" in by_id[2]["s"]
    assert by_id[3]["e"] == 0 and by_id[3]["p"] == 0
    assert by_id[3]["s"] == "clean text only"


# --------------------------------------------------------------------------
# property tests (hypothesis): packing + repetition laws
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_PROP_SETTINGS
@given(
    sizes=st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=24),
    budget=st.integers(min_value=1, max_value=600),
)
def test_packing_laws(spark, sizes, budget):
    """For any doc-size list and budget: every doc lands in exactly one
    sequence, sequence ids are monotone in doc order, and a sequence's
    token total minus its LAST doc never exceeds the budget (the
    overflow-by-at-most-one-straddler contract). Cross-checked against
    a driver-side reference fold."""
    bins = _pack(spark, sizes, budget=budget)
    assert len(bins) == len(sizes)
    assert bins == sorted(bins)
    # reference: exclusive prefix sum // budget
    prefix, expect = 0, []
    for n in sizes:
        expect.append(prefix // budget)
        prefix += n
    assert bins == expect
    # per-sequence totals: removing the straddler (last doc of the
    # sequence) must leave <= budget tokens
    from collections import defaultdict

    per_seq = defaultdict(list)
    for n, b in zip(sizes, bins):
        per_seq[b].append(n)
    for b, docs in per_seq.items():
        assert sum(docs[:-1]) <= budget


@_PROP_SETTINGS
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=0,
        max_size=12,
    )
)
def test_repetition_matches_reference_fold(spark, words):
    """dup_token_frac and top_bigram_frac agree with a plain-Python
    reference on arbitrary word sequences (incl. empty and 1-token)."""
    text = " ".join(words)
    got = _repetition_over(spark, [(1, text, "en", "s")])[1]
    toks = text.strip().lower().split() if text.strip() else [""]
    # Spark's split('', '\\s+') yields [''] — mirror that
    assert got["n_tokens"] == len(toks)
    assert got["dup_token_frac"] == pytest.approx(
        1 - len(set(toks)) / max(len(toks), 1), abs=1e-6
    )
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if bigrams:
        from collections import Counter

        top = Counter(bigrams).most_common(1)[0][1]
        assert got["top_bigram_frac"] == pytest.approx(
            top / len(bigrams), abs=1e-6
        )
    else:
        assert got["top_bigram_frac"] == 0.0


def test_split_drift_psi_structure_and_nonnegativity(spark, sf_dir):
    """PSI contributions (p-q)*ln(p/q) are nonnegative by construction
    (both factors share a sign); the total is the sum of the rounded
    contributions; the bucket spine is complete for both held-out
    splits."""
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        _PSI_BUCKETS,
        split_drift_psi,
    )

    rows = split_drift_psi(spark, sf_dir).collect()
    assert len(rows) == 2 * _PSI_BUCKETS
    by_split: dict[str, list] = {}
    for r in rows:
        by_split.setdefault(r.split, []).append(r)
        assert r.psi_contrib >= 0.0, r
    assert set(by_split) == {"val", "test"}
    for split, rs in by_split.items():
        assert sorted(r.bucket for r in rs) == list(range(_PSI_BUCKETS))
        assert rs[0].psi_total == round(sum(r.psi_contrib for r in rs), 6)


def test_split_drift_psi_converges_with_corpus_size(spark):
    """A deterministic hash split is unbiased, so PSI between train and
    the held-out splits must SHRINK as the corpus grows (small-sample
    noise, not structure) — the property that makes a stable high PSI
    a real alarm."""
    from m4i_flink_tasks_spark.queries.llm_corpus import split_drift_psi

    def totals(sf):
        return {
            r.split: r.psi_total for r in split_drift_psi(spark, sf).collect()
        }

    small = totals("/root/testdata/sf0.001")
    large = totals("/root/testdata/sf0.01")
    assert sum(large.values()) < sum(small.values())
