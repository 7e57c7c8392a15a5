

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
