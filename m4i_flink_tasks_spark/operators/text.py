"""Text-analysis operators for large-scale training-data pipelines.

All pure column expressions (whole-stage codegen, no Python UDFs) so they
run at scan speed over 100 TB of documents. The cross-engine-deterministic
polynomial hash is the shared primitive for fingerprinting and MinHash
(operators/dedup.py) — chosen over xxhash64/md5 because the DuckDB oracle
must reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007
HASH_BASE = 31

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small and ASCII-only so the same literal lists
# embed in the DuckDB oracle.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "de": ("der", "die", "und", "das", "ist"),
}

DEFAULT_STOPWORDS = tuple(w for ws in STOPWORDS.values() for w in ws)


def tokens(text: Column) -> Column:
    """Whitespace tokenizer (the BPE-ish variant is ``regex_tokens``)."""
    return F.split(F.trim(text), r"\s+")


def regex_tokens(text: Column) -> Column:
    """BPE-ish tokenizer: words, numbers and punctuation as separate
    tokens — ``\\w+`` runs or single non-space symbols."""
    return F.regexp_extract_all(text, F.lit(r"(\w+|[^\w\s])"), 0)


def poly_hash(s: Column) -> Column:
    """Deterministic polynomial rolling hash of a string:
    fold(chars, acc -> (acc*31 + codepoint) % 1e9+7). Matches the DuckDB
    list_reduce form token-for-token."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * HASH_BASE + F.ascii(ch)) % HASH_MOD,
    )


# Knuth's multiplicative constant (TAOCP vol. 3 §6.4): the finisher for
# scrambled_hash below.
MIX_MULT = 2_654_435_761


def scrambled_hash(s: Column) -> Column:
    """poly_hash with a multiplicative finisher, for uses that need
    DISPERSION rather than mere determinism (k-min sketches, mod-gate
    sampling). poly_hash of sequential keys is locally linear —
    ``hash('kmv:1204') == hash('kmv:1203') + 1`` for same-length ids —
    so its k smallest values cluster and an order-statistics estimator
    built on them is badly biased. Multiplying by a large odd constant
    mod the prime sends unit steps to ``MIX_MULT mod M`` steps, an
    equidistributed progression over the ring, while staying exact
    BIGINT arithmetic the DuckDB oracle reproduces token-for-token
    (max intermediate ≈ 2.7e18 < 2^63)."""
    return (poly_hash(s) * MIX_MULT) % HASH_MOD


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_score(text: Column, lang: str) -> Column:
    """Stopword-hit count for one language — the n-gram-heuristic
    building block for language ID."""
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))


def lang_id(text: Column) -> Column:
    """argmax over language stopword scores; deterministic tie-break by
    language code order, 'und' when no stopword hits at all."""
    scored = F.array(
        *[
            F.struct(
                (-lang_score(text, code)).alias("neg_score"),
                F.lit(code).alias("lang"),
            )
            for code in sorted(STOPWORDS)
        ]
    )
    best = F.array_min(scored)
    return F.when(best.neg_score < 0, best.lang).otherwise(F.lit("und"))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def distinct_token_ratio(text: Column) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length saturation +
    lexical diversity + stopword plausibility − punctuation noise."""
    len_component = F.least(token_count(text) / F.lit(50.0), F.lit(1.0))
    return (
        0.4 * len_component
        + 0.3 * distinct_token_ratio(text)
        + 0.3 * F.least(stopword_ratio(text) * 5, F.lit(1.0))
        - 0.2 * F.least(punct_ratio(text) * 10, F.lit(1.0))
    )


def word_entropy(text: Column) -> Column:
    """Shannon entropy (bits) of the document's word distribution — the
    perplexity-proxy quality signal (low entropy = repetitive/templated
    text, the shape n-gram-LM filters would down-weight).

    Expression-native on purpose: per-row ``filter``-count over the
    distinct-token array is O(tokens x distinct) INSIDE codegen, so the
    whole corpus scores in one scan with no explode/shuffle — at 100 TB
    that beats an explode + groupBy(doc, word) shuffle of every token
    by orders of magnitude for typical document lengths.
    """
    toks = tokens(F.lower(text))
    n = F.size(toks)
    dist = F.array_sort(F.array_distinct(toks))
    probs = F.transform(
        dist,
        lambda d: F.size(F.filter(toks, lambda t: t == d)) / n,
    )
    return -F.aggregate(
        probs,
        F.lit(0.0),
        lambda acc, p: acc + p * F.log2(p),
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: rolling hash over per-token polynomial
    hashes — order-sensitive, whitespace-normalized."""
    token_hashes = F.transform(tokens(text), poly_hash)
    return F.aggregate(
        token_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * HASH_BASE + h) % HASH_MOD,
    )
