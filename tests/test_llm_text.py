

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
