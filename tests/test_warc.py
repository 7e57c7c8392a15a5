"""WARC record-walk coverage: gzip-member splitting, named-field parse,
Content-Length-exact slicing, HTTP envelope strip, malformed rejection."""

from __future__ import annotations

import gzip

import pytest

from m4i_flink_tasks_spark.operators.warc import (
    _gzip_member,
    _warc_record,
    parse_warc,
    synth_warc,
)


def test_round_trip_closed_forms():
    for d in (0, 1, 2, 17, 100, 999):
        rows = parse_warc(synth_warc(d))
        assert len(rows) == 1 + d % 3
        for i, r in enumerate(rows):
            n = 5 + (d + 3 * i) % 20
            assert r["rec_index"] == i
            assert r["url"] == f"http://synth.example/{d}/{i}"
            assert r["n_body_tokens"] == n
            body = " ".join(f"w{d}x{i}n{j}" for j in range(n))
            assert r["content_length"] == 45 + len(body)


def test_non_response_records_are_filtered():
    """The warcinfo member must contribute no row — and a request
    record in the middle must not shift response indices."""
    archive = (
        _gzip_member(_warc_record("warcinfo", None, b"software: x"))
        + _gzip_member(
            _warc_record("request", "http://a/0", b"GET / HTTP/1.1\r\n\r\n")
        )
        + _gzip_member(
            _warc_record(
                "response", "http://a/0", b"HTTP/1.1 200 OK\r\n\r\nhello there"
            )
        )
    )
    rows = parse_warc(archive)
    assert len(rows) == 1
    assert rows[0]["rec_index"] == 0
    assert rows[0]["n_body_tokens"] == 2


def test_content_length_is_honored_exactly():
    """Trailing record-separator CRLFs after the payload must never
    leak into the body token count."""
    payload = b"HTTP/1.1 200 OK\r\n\r\none two three"
    rows = parse_warc(_gzip_member(_warc_record("response", "http://x", payload)))
    assert rows[0]["n_body_tokens"] == 3
    assert rows[0]["content_length"] == len(payload)


def test_malformed_archives_raise_value_error():
    good = synth_warc(7)
    with pytest.raises(ValueError):
        parse_warc(good[:-15])  # truncated final gzip member
    with pytest.raises(ValueError):
        parse_warc(_gzip_member(b"NOT A WARC RECORD\r\n\r\n"))
    with pytest.raises(ValueError):  # missing Content-Length
        parse_warc(_gzip_member(b"WARC/1.0\r\nWARC-Type: response\r\n\r\nx"))
    with pytest.raises(ValueError):  # payload shorter than declared
        parse_warc(
            _gzip_member(
                b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99\r\n\r\nshort"
            )
        )
    with pytest.raises(ValueError):  # response without HTTP envelope
        parse_warc(
            _gzip_member(
                _warc_record("response", "http://x", b"no envelope here")
            )
        )


def test_plain_gzip_concat_semantics():
    """The member splitter must consume exactly one gzip member per
    iteration — gzip.decompress would silently concatenate all members
    into one stream and lose record boundaries."""
    two = _gzip_member(
        _warc_record("response", "u1", b"HTTP/1.1 200 OK\r\n\r\na b")
    ) + _gzip_member(
        _warc_record("response", "u2", b"HTTP/1.1 200 OK\r\n\r\nc")
    )
    # stdlib gzip.decompress flattens: both records in one buffer
    assert gzip.decompress(two).count(b"WARC/1.0") == 2
    rows = parse_warc(two)
    assert [r["url"] for r in rows] == ["u1", "u2"]
    assert [r["n_body_tokens"] for r in rows] == [2, 1]


def test_html_variant_round_trip():
    """HTML-body archives: the record walk returns the RAW markup, and
    its shape matches the closed forms the warc_text_pipeline oracle
    states (title + anchor block + <p> blocks of 10 tokens)."""
    from m4i_flink_tasks_spark.operators.warc import (
        iter_response_bodies,
        synth_warc_html,
    )

    for d in (0, 1, 7, 23, 100, 999):
        bodies = list(iter_response_bodies(synth_warc_html(d)))
        assert len(bodies) == 1 + d % 3
        for i, (url, body) in enumerate(bodies):
            n = 5 + (d + 3 * i) % 20
            html = body.decode("ascii")
            assert url == f"http://synth.example/{d}/{i}"
            assert html.startswith(
                "<html><head><title>doc</title></head><body>"
            )
            assert html.endswith("</body></html>")
            toks = [f"w{d}x{i}n{j}" for j in range(n)]
            # anchor holds the first 10 tokens, <p> blocks the rest
            anchor = " ".join(toks[:10])
            assert f'<a href="#">{anchor}</a>' in html
            assert html.count("<p>") == max(0, (n + 9) // 10 - 1)
            # tag strip recovers exactly "doc" + the body tokens
            import re

            stripped = re.sub(r"\s+", " ", re.sub("<[^>]+>", " ", html)).strip()
            assert stripped == "doc " + " ".join(toks)


def test_quarantine_truncated_archives():
    """A truncated archive must raise from the raw walk, and the
    quarantine walk must classify it without leaking rows."""
    b = synth_warc(3)
    with pytest.raises(ValueError):
        parse_warc(b[:-5])
    # healthy archives parse fully — no false quarantine
    assert parse_warc(b)
