"""WARC (Web ARChive, ISO 28500) record extraction — the ingest format
of CommonCrawl-scale web corpora.

A ``.warc.gz`` file is a CONCATENATION of independent gzip members, one
per WARC record — that layout is what lets a 100 TB crawl shard split
by member boundaries. This module implements the real mechanics in
stdlib only:

- ``synth_warc`` builds a deterministic multi-record archive per
  doc_id: a ``warcinfo`` record plus 1-3 ``response`` records (each an
  HTTP/1.1 envelope around closed-form body text), each record its own
  gzip member, concatenated.
- ``parse_warc`` splits members with ``zlib.decompressobj`` (the
  ``unused_data`` loop), parses each record's WARC named fields,
  honors ``Content-Length`` exactly, strips the HTTP envelope of
  response records, and emits per-record facts. Non-response records
  are counted but emit no row (the selection a text pipeline makes).

Reference scope: the reference has no binary/web-archive surface
(SURVEY §2.6); this is north-star plumbing for crawl-corpus curation,
where text extraction begins at exactly this record walk.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gzip_member(data: bytes) -> bytes:
    # mtime pinned so synthesis is byte-deterministic
    return gzip.compress(data, compresslevel=6, mtime=0)


def _warc_record(rtype: str, uri: str | None, payload: bytes) -> bytes:
    headers = [f"WARC/1.0", f"WARC-Type: {rtype}"]
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Length: {len(payload)}")
    head = ("\r\n".join(headers) + "\r\n\r\n").encode("ascii")
    return head + payload + b"\r\n\r\n"


def synth_warc(doc_id: int) -> bytes:
    """Deterministic .warc.gz: a warcinfo member + ``1 + doc_id % 3``
    response members whose body word counts are closed forms of
    (doc_id, rec_index) so the oracle can state every fact in SQL."""
    members = [
        _gzip_member(
            _warc_record("warcinfo", None, b"software: m4i-synth-crawler")
        )
    ]
    n_responses = 1 + doc_id % 3
    for i in range(n_responses):
        n_words = 5 + (doc_id + 3 * i) % 20
        body = " ".join(f"w{doc_id}x{i}n{j}" for j in range(n_words))
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + body.encode("ascii")
        )
        uri = f"http://synth.example/{doc_id}/{i}"
        members.append(_gzip_member(_warc_record("response", uri, http)))
    return b"".join(members)


_HTML_BLOCK = 10  # tokens per markup block (mirrors queries/llm_text.py)


def synth_warc_html(doc_id: int) -> bytes:
    """Deterministic .warc.gz whose response bodies are HTML pages —
    the same markup shape as ``queries/llm_text.markup_text_extraction``
    (title + leading anchor block + ``<p>`` blocks of 10 tokens) — so
    the WARC→WET pipeline runs a REAL tag strip over real archive
    payloads and the oracle can restate the extracted text in closed
    form of (doc_id, rec_index)."""
    members = [
        _gzip_member(
            _warc_record("warcinfo", None, b"software: m4i-synth-crawler")
        )
    ]
    n_responses = 1 + doc_id % 3
    for i in range(n_responses):
        n_words = 5 + (doc_id + 3 * i) % 20
        toks = [f"w{doc_id}x{i}n{j}" for j in range(n_words)]
        blocks = [
            toks[k : k + _HTML_BLOCK]
            for k in range(0, n_words, _HTML_BLOCK)
        ]
        parts = [f'<a href="#">{" ".join(blocks[0])}</a>'] + [
            f"<p>{' '.join(blk)}</p>" for blk in blocks[1:]
        ]
        html = (
            "<html><head><title>doc</title></head><body>"
            + "".join(parts)
            + "</body></html>"
        )
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + html.encode("ascii")
        )
        uri = f"http://synth.example/{doc_id}/{i}"
        members.append(_gzip_member(_warc_record("response", uri, http)))
    return b"".join(members)


def _split_members(b: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members, yielding each
    member's payload — the split a crawl shard reader performs.
    Zero-copy over a memoryview (a per-member tail copy would make the
    walk quadratic in archive size), and ALL corruption — truncation,
    bad headers, failed checksums — surfaces as ValueError per the
    dead-letter contract (zlib.error is not a ValueError subclass)."""
    mv = memoryview(b)
    pos = 0
    while pos < len(b):
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(mv[pos:])
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at offset {pos}: {e}") from e
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield out
        consumed = len(b) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def iter_warc_records(b: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Walk a .warc.gz payload, yielding (named-fields, record-payload)
    per record. Raises ValueError on malformed members/records so a
    crawl shard full of garbage dead-letters instead of killing the
    task."""
    for member in _split_members(b):
        sep = member.find(b"\r\n\r\n")
        if sep < 0 or not member.startswith(b"WARC/"):
            raise ValueError("missing WARC header block")
        fields: dict[str, str] = {}
        for line in member[:sep].decode("ascii").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("bad/missing Content-Length") from e
        payload = member[sep + 4 : sep + 4 + length]
        if len(payload) != length:
            raise ValueError("payload shorter than Content-Length")
        yield fields, payload


def iter_response_bodies(b: bytes) -> Iterator[tuple[str | None, bytes]]:
    """(url, HTTP body) per response record — the selection a text
    pipeline makes; non-response records are skipped."""
    for fields, payload in iter_warc_records(b):
        if fields.get("warc-type") != "response":
            continue
        hsep = payload.find(b"\r\n\r\n")
        if hsep < 0 or not payload.startswith(b"HTTP/"):
            raise ValueError("response record without HTTP envelope")
        yield fields.get("warc-target-uri"), payload[hsep + 4 :]


def parse_warc(b: bytes) -> list[dict]:
    """Per-response-record facts from a .warc.gz payload."""
    rows: list[dict] = []
    rec_index = 0
    for fields, payload in iter_warc_records(b):
        if fields.get("warc-type") != "response":
            continue
        hsep = payload.find(b"\r\n\r\n")
        if hsep < 0 or not payload.startswith(b"HTTP/"):
            raise ValueError("response record without HTTP envelope")
        body = payload[hsep + 4 :]
        rows.append(
            {
                "rec_index": rec_index,
                "url": fields.get("warc-target-uri"),
                "content_length": int(fields["content-length"]),
                "n_body_tokens": len(body.split()),
            }
        )
        rec_index += 1
    return rows


WARC_SCHEMA = (
    "doc_id bigint, rec_index int, url string, content_length bigint, "
    "n_body_tokens int"
)


def attach_warc_payload(docs: DataFrame) -> DataFrame:
    """.warc.gz payload column (one archive per doc) for the crawl
    extraction query."""
    from .multimodal import spread_for_python

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return pd.Series([synth_warc(int(d)) for d in doc_id], dtype=object)

    return spread_for_python(docs.select("doc_id")).select(
        "doc_id", _payload(F.col("doc_id")).alias("payload")
    )


def attach_corrupted_warc_payload(
    docs: DataFrame, every: int = 17, offset: int = 3
) -> DataFrame:
    """.warc.gz payload column where archives of ``doc_id % every ==
    offset`` are TRUNCATED mid-member (the last 5 bytes cut — inside
    the final gzip trailer, so decompression hits EOF early). The
    deterministic-corruption fixture for the quarantine path: real
    crawls always contain truncated shards, and the oracle can state
    exactly which ids are poisoned."""
    from .multimodal import spread_for_python

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            b = synth_warc(int(d))
            out.append(b[:-5] if int(d) % every == offset else b)
        return pd.Series(out, dtype=object)

    return spread_for_python(docs.select("doc_id")).select(
        "doc_id", _payload(F.col("doc_id")).alias("payload")
    )


WARC_QUARANTINE_SCHEMA = (
    "doc_id bigint, status string, n_records int, n_body_tokens_total bigint"
)


def extract_warc_with_quarantine(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched record walk with the dead-letter contract CLOSED:
    a malformed archive (ValueError from the member walk) yields one
    quarantine row instead of failing the task — at 100 TB a single
    poisoned shard must never kill a stage retry loop. Well-formed
    archives aggregate to one per-archive ingest-status row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    rows = parse_warc(payload)
                except ValueError:
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "status": "dead_letter",
                            "n_records": 0,
                            "n_body_tokens_total": 0,
                        }
                    )
                    continue
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "status": "ok",
                        "n_records": len(rows),
                        "n_body_tokens_total": sum(
                            r["n_body_tokens"] for r in rows
                        ),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "status",
                    "n_records",
                    "n_body_tokens_total",
                ],
            )

    return with_payload.mapInPandas(run, schema=WARC_QUARANTINE_SCHEMA)


WARC_HTML_SCHEMA = "doc_id bigint, rec_index int, url string, html string"


def attach_warc_html_payload(docs: DataFrame) -> DataFrame:
    """.warc.gz payload column with HTML response bodies (one archive
    per doc) for the end-to-end crawl→corpus pipeline."""
    from .multimodal import spread_for_python

    @F.pandas_udf("binary")
    def _payload(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [synth_warc_html(int(d)) for d in doc_id], dtype=object
        )

    return spread_for_python(docs.select("doc_id")).select(
        "doc_id", _payload(F.col("doc_id")).alias("payload")
    )


def extract_warc_html(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched WARC record walk that stops at the HTTP-body
    boundary: one row per response record carrying the RAW page markup.
    Tag stripping and quality gating stay OUTSIDE Python, as JVM
    regex/string expressions over the returned column — the Python
    surface is only the member/envelope mechanics bytes demand."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, (url, body) in enumerate(
                    iter_response_bodies(payload)
                ):
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "rec_index": idx,
                            "url": url,
                            "html": body.decode("utf-8", "replace"),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "rec_index", "url", "html"]
            )

    return with_payload.mapInPandas(run, schema=WARC_HTML_SCHEMA)


def extract_warc_records(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched WARC record walk over the binary column — one row
    per response record."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for row in parse_warc(payload):
                    out.append({"doc_id": int(doc_id), **row})
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "rec_index",
                    "url",
                    "content_length",
                    "n_body_tokens",
                ],
            )

    return with_payload.mapInPandas(run, schema=WARC_SCHEMA)
