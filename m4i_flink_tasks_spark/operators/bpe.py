"""Distributed BPE (byte-pair encoding) merge training.

The tokenizer-training pass of an LLM data pipeline (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016). The key scale observation is CLASSIC BPE's own: after one
corpus pass builds the word-frequency table, training never touches
the corpus again — every merge iteration runs on the VOCABULARY, which
is sublinear in corpus size (Heaps' law). So the Spark shape is:

    corpus ──(tokenize, one shuffle)──▶ word-freq table (vocab-sized)
    repeat n_merges times on that table:
        explode adjacent symbol pairs × word frequency
        → weighted pair counts (tiny aggregate)
        → argmax pair (deterministic tie-break: count desc, pair asc)
        → rewrite symbol arrays with an expression fold (left-to-right
          greedy, the reference semantics)

At 100 TB the corpus pass dominates and is embarrassingly parallel;
each merge iteration is a vocabulary-sized job (broadcast of one merge
pair), so n_merges × small. The symbol rewrite is a pure ``aggregate``
fold — no Python on any data path. ``localCheckpoint`` flattens the
lineage every few merges exactly like the closure/PageRank fixpoints.

Determinism: ties in pair counts break lexicographically, so the merge
sequence is a pure function of the corpus — pinned by tests against an
independent pure-Python BPE implementation (same tie-break).

No reference analogue (the reference has no text surface — SURVEY
§2.6); north-star LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 4


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace words → (word, freq), symbols =
    characters plus the end-of-word marker (the classic formulation)."""
    # outer: null rows fail != '' below; avoids the Generate guard
    # re-splitting the text per row.
    words = docs.select(
        F.explode_outer(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "symbols",
            F.concat(
                F.split(F.col("word"), ""),
                F.array(F.lit("</w>")),
            ),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays."""
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(symbols) - 1), "
                "i -> struct(element_at(symbols, i) AS left, "
                "element_at(symbols, i + 1) AS right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("freq").alias("pair_count")
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Left-to-right greedy merge of (left, right) → left||right in
    every symbol array — the reference BPE semantics, as a fold."""
    merged = F.expr(
        "aggregate(symbols, cast(array() as array<string>), "
        "(acc, s) -> case when size(acc) > 0 "
        f"and element_at(acc, -1) = {_lit(left)} and s = {_lit(right)} "
        "then concat(slice(acc, 1, size(acc) - 1), "
        f"array({_lit(left + right)})) "
        "else concat(acc, array(s)) end)"
    )
    return vocab.withColumn("symbols", merged)


def _lit(s: str) -> str:
    escaped = s.replace("\\", "\\\\").replace("'", "\\'")
    return f"'{escaped}'"


def train_bpe(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merge table, final
    vocab). Merge table rows: (rank, left, right, weighted count)."""
    vocab = word_frequencies(docs, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(vocab)
            .filter(F.col("pair_count") >= min_pair_count)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((rank, row.left, row.right, row.pair_count))
        vocab = _apply_merge(vocab, row.left, row.right)
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def greedy_merge_python(symbols: list[str], left: str, right: str) -> list[str]:
    """The same left-to-right greedy merge, as the independent model
    the tests compare against."""
    out: list[str] = []
    for s in symbols:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def encode_vocab(vocab: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply a trained merge sequence (in rank order) to the vocabulary's
    symbol arrays — encoding runs on the VOCAB table, never the corpus;
    documents get their tokens by a broadcast join on the word."""
    for m in merges:
        left, right = m[1], m[2]
        vocab = _apply_merge(vocab, left, right)
    return vocab


def bpe_token_counts(
    docs: DataFrame, encoded_vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tokens per document under the trained BPE: explode words, join
    the vocabulary-sized (word -> n_subwords) map broadcast, sum. The
    corpus is touched once; no Python anywhere."""
    word_tokens = F.broadcast(
        encoded_vocab.select(
            "word", F.size("symbols").alias("n_subwords")
        )
    )
    # outer: see word_frequencies comment.
    words = docs.select(
        "doc_id",
        F.explode_outer(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.join(word_tokens, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_subwords").alias("n_bpe_tokens"))
        .orderBy("doc_id")
    )
