

def test_chunking_invariants(spark, sf_dir):
    """Coverage + overlap invariants: chunks tile the token sequence
    with stride S, the last chunk ends exactly at n_tokens, every
    chunk is non-empty, and chunk_ids are dense."""
    from m4i_flink_tasks_spark.queries.llm_text import (
        _CHUNK_C,
        _CHUNK_S,
        document_chunking,
    )

    rows = document_chunking(spark, sf_dir).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    multi = 0
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r.chunk_id)
        ids = [r.chunk_id for r in doc_rows]
        assert ids == list(range(len(ids)))
        assert all(r.n_chunks == len(ids) for r in doc_rows)
        n_tokens = doc_rows[-1].start_token + doc_rows[-1].n_chunk_tokens
        for r in doc_rows:
            assert r.start_token == r.chunk_id * _CHUNK_S
            assert 1 <= r.n_chunk_tokens <= _CHUNK_C
            assert r.start_token + r.n_chunk_tokens <= n_tokens
        if len(ids) > 1:
            multi += 1
            # consecutive chunks overlap by C - S
            for a, b in zip(doc_rows, doc_rows[1:]):
                assert b.start_token - a.start_token == _CHUNK_S
                assert a.start_token + _CHUNK_C > b.start_token
    assert multi > 0  # corpus has docs long enough to need chunking


def test_length_batching_invariants(spark, sf_dir):
    """Each batch holds <= B docs, waste is in [0, 1), only the last
    batch of a bucket may be short, and total docs reconcile."""
    from m4i_flink_tasks_spark.queries.llm_corpus import (
        _BATCH_B,
        length_bucketed_batching,
    )
    from m4i_flink_tasks_spark.sources import load_table

    rows = length_bucketed_batching(spark, sf_dir).collect()
    assert rows
    total = 0
    by_bucket: dict = {}
    for r in rows:
        assert 1 <= r.n_docs <= _BATCH_B
        assert 0 <= r.waste_ratio < 1
        assert r.sum_tokens <= r.n_docs * r.max_tokens
        total += r.n_docs
        by_bucket.setdefault(r.bucket, []).append(r)
    for batches in by_bucket.values():
        batches.sort(key=lambda r: r.batch_id)
        assert [r.batch_id for r in batches] == list(range(len(batches)))
        for r in batches[:-1]:  # only the tail batch may be partial
            assert r.n_docs == _BATCH_B
        # batch maxima are non-decreasing (docs sorted by length)
        maxima = [r.max_tokens for r in batches]
        assert maxima == sorted(maxima)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs


def test_corpus_diff_reconciles(spark, sf_dir):
    """Status masses reconcile with the v2 derivation rules: removed =
    %17==0 docs, added = %17==11 docs, changed = %17==5 docs, and
    unchanged + changed + removed = corpus size."""
    from m4i_flink_tasks_spark.queries.llm_corpus import corpus_version_diff
    from m4i_flink_tasks_spark.sources import load_table

    rows = corpus_version_diff(spark, sf_dir).collect()
    by_status: dict = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + r.n_docs
        if r.status == "added":
            assert r.n_tokens_v1 == 0
        if r.status == "removed":
            assert r.n_tokens_v2 == 0
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    n_removed = docs.filter("doc_id % 17 = 0").count()
    n_added = docs.filter("doc_id % 17 = 11").count()
    n_changed = docs.filter("doc_id % 17 = 5").count()
    assert by_status.get("removed", 0) == n_removed
    assert by_status.get("added", 0) == n_added
    assert by_status.get("changed", 0) == n_changed
    assert (
        by_status.get("unchanged", 0)
        + by_status.get("changed", 0)
        + by_status.get("removed", 0)
        == n
    )


def test_embedding_health_sanity(spark, sf_dir):
    """Norm ordering, variance positivity, and count reconciliation."""
    from m4i_flink_tasks_spark.queries.llm_similarity import (
        embedding_health_report,
    )
    from m4i_flink_tasks_spark.sources import load_table

    rows = embedding_health_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.min_norm <= r.mean_norm <= r.max_norm
        assert r.avg_dim_variance > 0  # vectors are not collapsed
    total = sum(r.n_vectors for r in rows)
    assert total == load_table(spark, sf_dir, "embeddings").count()


def test_markup_extraction_round_trip(spark, sf_dir):
    """The real tag-strip must recover exactly the title + original
    token stream, and link density is the anchor share."""
    from m4i_flink_tasks_spark.queries.llm_text import (
        markup_text_extraction,
    )
    from m4i_flink_tasks_spark.sources import load_table

    out = {r.doc_id: r for r in markup_text_extraction(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for row in docs.limit(20).collect():
        toks = row.text.strip().split()
        expected = "doc " + " ".join(toks)
        r = out[row.doc_id]
        assert r.n_extracted_chars == len(expected)
        assert 0 < r.link_density < 1
        assert r.n_paragraphs == (len(toks) + 9) // 10 - 1


def test_cross_doc_span_scrub_semantics(spark, sf_dir):
    """Corpus-wide first-keeper rule: every span value survives in
    EXACTLY one document position across the whole corpus; per doc,
    kept <= original; the position bound backing the integer winner
    key holds; and the scrub subsumes intra-doc dedup (kept spans
    within a doc are unique)."""
    from pyspark.sql import functions as F

    from m4i_flink_tasks_spark.queries.llm_text import (
        _SCRUB_POS_BOUND,
        cross_doc_span_scrub,
    )
    from m4i_flink_tasks_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = docs.select(
        "doc_id",
        F.posexplode(F.split("text", r"\. ")).alias("pos", "span"),
    )
    max_pos = spans.agg(F.max("pos")).collect()[0][0]
    assert max_pos < _SCRUB_POS_BOUND

    report = cross_doc_span_scrub(spark, sf_dir).collect()
    n_span_values = spans.select("span").distinct().count()
    assert sum(r["n_kept"] for r in report) == n_span_values
    for r in report:
        assert 0 <= r["n_kept"] <= r["n_spans"]
        assert 0.0 <= r["scrub_ratio"] <= 1.0
    # duplicated corpora scrub more than intra-doc alone: total kept
    # must be <= the intra-doc unique-span total
    intra_unique = (
        spans.select("doc_id", "span").distinct().count()
    )
    assert n_span_values <= intra_unique
