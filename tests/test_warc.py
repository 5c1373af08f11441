"""WARC ingest: record walk, HTTP payload strip, gzip members,
chunked bodies, and the composed road into parse_raw_bytes."""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.warc import (
    explode_warc,
    gunzip_members,
    make_fixture_warc,
    parse_warc_records,
    warc_to_documents,
)

RECS = [
    ("https://a.example/page.html", "text/html",
     b"<html><body><p>hello page body</p></body></html>"),
    ("https://b.example/data.csv", "text/csv", b"k,v\n1,2\n3,4"),
    ("https://c.example/plain.txt", "text/plain",
     b"plain paragraph one\n\nparagraph two"),
]


def test_warc_roundtrip_all_layouts():
    for gz in (False, True):
        for ch in (False, True):
            got = parse_warc_records(
                make_fixture_warc(RECS, gzip_members=gz, chunked=ch)
            )
            assert [(u, b) for u, _, b in got] == [
                (u, b) for u, _, b in RECS
            ], (gz, ch)
    # warcinfo records are skipped; truncation keeps the decoded head
    w = make_fixture_warc(RECS)
    assert len(parse_warc_records(w[: len(w) // 2])) >= 1
    assert gunzip_members(b"plain passthrough") == b"plain passthrough"


def test_warc_content_encoding_gzip():
    """Content-Encoding: gzip bodies inflate transparently."""
    import zlib

    c = zlib.compressobj(6, zlib.DEFLATED, 15 + 16)
    gz_body = c.compress(b"compressed body text") + c.flush()
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + gz_body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/z.txt\r\n"
        b"Content-Length: %d\r\n\r\n" % len(http) + http + b"\r\n\r\n"
    )
    got = parse_warc_records(rec)
    assert got == [
        ("https://x.example/z.txt", "text/plain", b"compressed body text")
    ]


def test_warc_to_documents_spark(spark):
    """WARC file → response records → sniff/decode spans, with the URI
    extension as the dispatch hint (csv stays a table span)."""
    w = make_fixture_warc(RECS, gzip_members=True)
    bad = b"WARC/1.0\r\nContent-Length: notanint\r\n\r\nggg"
    df = spark.createDataFrame(
        [("w1", w), ("broken", bad)], "doc_id string, raw binary"
    )
    recs = {r["doc_id"]: r for r in explode_warc(df).collect()}
    assert set(recs) == {u for u, _, _ in RECS}
    assert recs["https://b.example/data.csv"]["warc_file"] == "w1"

    docs = {r["doc_id"]: r for r in warc_to_documents(df).collect()}
    assert docs["https://a.example/page.html"]["format"] == "html"
    assert docs["https://a.example/page.html"]["spans"][0]["kind"] == "html"
    assert docs["https://b.example/data.csv"]["format"] == "csv"
    assert docs["https://b.example/data.csv"]["spans"][0]["kind"] == "table"
    txt = docs["https://c.example/plain.txt"]
    assert [s["text"] for s in txt["spans"]] == [
        "plain paragraph one", "paragraph two",
    ]


def test_warc_member_at_a_time_iteration(monkeypatch):
    """iter_warc_records pulls gzip members lazily: taking the first
    response record must not inflate the whole archive (warcinfo +
    leading members only), and a corrupted tail member still yields
    every record before it."""
    import zlib

    from extractthinker_spark.operators import warc as warc_mod
    from extractthinker_spark.operators.warc import (
        iter_gunzip_members,
        iter_warc_records,
        make_fixture_warc,
    )

    records = [
        (f"https://x.example/p{i}", "text/plain",
         f"body number {i}".encode())
        for i in range(5)
    ]
    blob = make_fixture_warc(records, gzip_members=True)

    pulled = []
    real = iter_gunzip_members

    def spy(b):
        for m in real(b):
            pulled.append(len(m))
            yield m

    monkeypatch.setattr(warc_mod, "iter_gunzip_members", spy)
    it = iter_warc_records(blob)
    first = next(it)
    assert first[0] == "https://x.example/p0"
    # warcinfo member + at most the first two record members pulled
    assert len(pulled) <= 3, pulled
    rest = list(it)
    assert [u for u, _, _ in rest] == [u for u, _, _ in records[1:]]

    # truncated tail: chop the final gzip member mid-stream
    members = []
    rest_blob = blob
    while rest_blob:
        d = zlib.decompressobj(15 + 32)
        d.decompress(rest_blob)
        used = len(rest_blob) - len(d.unused_data)
        members.append(rest_blob[:used])
        rest_blob = d.unused_data
    truncated = b"".join(members[:-1]) + members[-1][: len(members[-1]) // 2]
    got = [u for u, _, _ in iter_warc_records(truncated)]
    assert got == [u for u, _, _ in records[:4]]
