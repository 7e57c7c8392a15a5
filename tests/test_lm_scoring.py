"""Bigram-LM perplexity: hand-computed pin + semantic properties.

The oracle parity test already hash-matches both queries against DuckDB
at the gate SF; this file pins the MATH (a corpus small enough to do
add-one smoothing by hand) and the CCNet semantics (repetitive text the
model has seen scores lower perplexity than unseen-word text).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from m4i_flink_tasks_spark.queries.lm_scoring import ngram_lm_perplexity


def _run_on(spark, rows, tmp_path):
    df = spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_hand_computed_two_doc_corpus(spark, tmp_path):
    """Corpus: 'a b a b' and 'a b'. Unigrams: a×3, b×3 → V=2.
    Bigrams: (a,b)×3, (b,a)×1.
    p(b|a) = (3+1)/(3+2) = 0.8 ;  p(a|b) = (1+1)/(3+2) = 0.4.

    doc0 bigrams: ab, ba, ab → ppl = exp(-(ln.8+ln.4+ln.8)/3)
    doc1 bigrams: ab         → ppl = exp(-ln.8) = 1.25
    """
    sf_dir = _run_on(spark, ["a b a b", "a b"], tmp_path)
    got = {r.doc_id: r for r in ngram_lm_perplexity(spark, sf_dir).collect()}
    ppl0 = math.exp(-(math.log(0.8) + math.log(0.4) + math.log(0.8)) / 3)
    assert got[0].n_bigrams == 3
    assert got[0].ppl == pytest.approx(round(ppl0, 4))
    assert got[1].n_bigrams == 1
    assert got[1].ppl == pytest.approx(1.25)
    # doc1 is entirely the corpus's dominant bigram -> lower perplexity
    assert got[1].ppl < got[0].ppl
    assert got[1].lm_bucket == "head" and got[0].lm_bucket != "head"


def test_seen_text_beats_unseen_text(spark, sf_dir):
    """CCNet's premise on the real corpus: a document whose bigrams the
    model saw often must out-score (lower ppl) one full of rare
    transitions. Proxy: head-bucket mean dup-bigram rate >= tail's."""
    out = ngram_lm_perplexity(spark, sf_dir)
    stats = (
        out.groupBy("lm_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("ppl").alias("mean_ppl"))
        .collect()
    )
    by = {r.lm_bucket: r for r in stats}
    assert set(by) == {"head", "middle", "tail"}
    assert by["head"].mean_ppl < by["middle"].mean_ppl < by["tail"].mean_ppl
    # ntile keeps the buckets balanced within 1
    sizes = [by[b].n for b in ("head", "middle", "tail")]
    assert max(sizes) - min(sizes) <= 1
