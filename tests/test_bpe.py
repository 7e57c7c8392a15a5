"""Distributed BPE training vs an independent pure-Python reference:
the merge SEQUENCE (the trained artifact) must match exactly, and so
must the final vocabulary's symbol arrays."""

from __future__ import annotations

from collections import Counter

from m4i_flink_tasks_spark.operators.bpe import (
    greedy_merge_python,
    train_bpe,
)
from m4i_flink_tasks_spark.sources import load_table

N_MERGES = 12


def _python_bpe(texts, n_merges, min_pair_count=2):
    freqs = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            freqs[w] += 1
    vocab = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for rank in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        eligible = {
            p: c for p, c in pair_counts.items() if c >= min_pair_count
        }
        if not eligible:
            break
        (left, right), count = min(
            eligible.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, left, right, count))
        vocab = {
            w: greedy_merge_python(s, left, right) for w, s in vocab.items()
        }
    return merges, vocab, freqs


def test_bpe_merge_sequence_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    merges, final_vocab = train_bpe(spark, docs, N_MERGES)
    texts = [r.text for r in docs.select("text").collect()]
    exp_merges, exp_vocab, exp_freqs = _python_bpe(texts, N_MERGES)
    assert merges == exp_merges
    assert len(merges) == N_MERGES, "corpus too small for the test"

    got = {
        r.word: (r.freq, list(r.symbols))
        for r in final_vocab.select("word", "freq", "symbols").collect()
    }
    assert set(got) == set(exp_vocab)
    for w, syms in exp_vocab.items():
        assert got[w] == (exp_freqs[w], syms), w
    # the merges actually compressed something
    assert any(len(s) < len(w) + 1 for w, (_, s) in got.items())


def test_bpe_encoding_matches_python_model(spark, sf_dir):
    """Applying the trained merges: per-word subword arrays and per-doc
    token counts must match the Python model applying the same merges."""
    from m4i_flink_tasks_spark.operators.bpe import (
        bpe_token_counts,
        encode_vocab,
        word_frequencies,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = train_bpe(spark, docs, N_MERGES)
    vocab = word_frequencies(docs)
    encoded = encode_vocab(vocab, merges)
    got_vocab = {
        r.word: list(r.symbols)
        for r in encoded.select("word", "symbols").collect()
    }
    texts = [r.text for r in docs.select("text").collect()]
    _, exp_vocab, _ = _python_bpe(texts, N_MERGES)
    assert got_vocab == exp_vocab

    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(docs, encoded).collect()
    }
    exp_counts: dict = {}
    for r in docs.select("doc_id", "text").collect():
        n = sum(
            len(exp_vocab[w])
            for w in r.text.strip().lower().split()
            if w
        )
        exp_counts[r.doc_id] = n
    assert counts == exp_counts
