"""WARC ingest — the Common Crawl road into the span pipeline.

Web-scale training corpora arrive as WARC files (ISO 28500: crawl
archives of `response` records wrapping HTTP responses). The reference
has no crawl-archive source (its nearest entry is per-URL fetch,
document_loader.py:263-301); at 10^12-document scale the input is
WARC, so this source is first-class here:

    warc files (binary, optionally per-record gzip members)
      → explode_warc:  one row per response record
           (doc_id = target URI, raw = HTTP payload bytes)
      → operators.rawbytes.parse_raw_bytes: sniff + decode to spans
      → the rest of the pipeline unchanged.

Everything is dependency-free: WARC header blocks are CRLF key:value
lines with an exact Content-Length, `.warc.gz` files are standard
multi-member gzip streams (one member per record — the layout Common
Crawl ships), and HTTP response payloads strip their status+header
block, un-chunking Transfer-Encoding: chunked bodies.

Scale shape: explode_warc is one Arrow mapInPandas over the file
bytes — embarrassingly parallel per WARC file, no shuffle; a WARC is
~1 GB so rows stay executor-sized. Pair with
``spark.read.format('binaryFile')`` partitioning for the scan.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F  # noqa: F401  (parity with sibling modules)
from pyspark.sql import DataFrame


def iter_gunzip_members(b: bytes) -> Iterator[bytes]:
    """Generator over concatenated gzip members (RFC 1952 multi-member
    — the .warc.gz layout: each record its own member), one inflated
    member at a time so peak memory is ONE record's plaintext, not the
    whole archive's (a 1 GB CC archive inflates ~4-5x). Plain input
    yields itself; a truncated trailing member yields what decoded."""
    if b[:2] != b"\x1f\x8b":
        yield b
        return
    while b:
        d = zlib.decompressobj(15 + 32)
        try:
            chunk = d.decompress(b)
        except zlib.error:
            return
        yield chunk + d.flush()
        if not d.unused_data:
            return
        b = d.unused_data
        if b[:2] != b"\x1f\x8b":
            return


def gunzip_members(b: bytes) -> bytes:
    """Joined form of :func:`iter_gunzip_members` — only for callers
    that genuinely need the whole plaintext at once; the record walk
    streams members instead."""
    return b"".join(iter_gunzip_members(b))


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def _dechunk(body: bytes) -> bytes:
    """Transfer-Encoding: chunked → raw bytes (RFC 9112 §7.1)."""
    out, i = [], 0
    while i < len(body):
        nl = body.find(b"\r\n", i)
        if nl < 0:
            break
        try:
            size = int(body[i:nl].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[nl + 2 : nl + 2 + size])
        i = nl + 2 + size + 2  # chunk + its trailing CRLF
    return b"".join(out)


def _http_payload(payload: bytes) -> tuple[str, bytes]:
    """(content-type, body) from an HTTP response payload: status line
    + headers stripped, chunked bodies un-chunked, gzip
    Content-Encoding transparently inflated. Non-HTTP payloads (e.g.
    resource records) pass through untouched."""
    if not payload.startswith(b"HTTP/"):
        return "", payload
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return "", payload
    headers = _parse_headers(payload[:sep])
    body = payload[sep + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    if headers.get("content-encoding", "").lower() in ("gzip", "x-gzip"):
        try:
            body = zlib.decompress(body, 15 + 32)
        except zlib.error:
            pass  # mislabeled encoding: keep raw bytes
    return headers.get("content-type", ""), body


def iter_warc_records(
    b: bytes, keep_types: tuple[str, ...] = ("response",)
) -> Iterator[tuple[str, str, bytes]]:
    """Generator of (target_uri, content_type, body_bytes) from one
    WARC file (ISO 28500 §4: ``WARC/1.x`` version line, CRLF header
    block, Content-Length payload, CRLF CRLF separator). Gzip members
    are inflated INCREMENTALLY and records parsed from a rolling
    buffer whose consumed prefix is dropped after every record — peak
    memory is one record (plus one compressed input), never the
    inflated archive. Records whose WARC-Type is not in ``keep_types``
    (request, metadata, warcinfo, ...) are skipped; a malformed
    Content-Length ends the walk; a truncated tail yields its clamped
    record then stops (best-effort — one bad tail must not discard
    the file)."""
    members = iter_gunzip_members(b)
    buf = bytearray()
    exhausted = False

    def fill() -> bool:
        nonlocal exhausted
        if exhausted:
            return False
        nxt = next(members, None)
        if nxt is None:
            exhausted = True
            return False
        buf.extend(nxt)
        return True

    while True:
        # align the buffer on a record start, pulling members as needed
        while True:
            if buf.startswith(b"WARC/"):
                sep = buf.find(b"\r\n\r\n")
                if sep >= 0:
                    break
                if not fill():
                    return
                continue
            idx = buf.find(b"WARC/")
            if idx >= 0:
                del buf[:idx]
                continue
            if len(buf) > 4:  # keep a tail: 'WARC/' may straddle fills
                del buf[:-4]
            if not fill():
                return
        headers = _parse_headers(bytes(buf[:sep]))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        end = sep + 4 + length
        while len(buf) < end + 4 and fill():
            pass
        payload = bytes(buf[sep + 4 : end])
        del buf[: end + 4]
        if headers.get("warc-type", "") in keep_types:
            uri = headers.get("warc-target-uri", "").strip("<>")
            ctype, body = _http_payload(payload)
            yield uri, ctype, body


def parse_warc_records(
    b: bytes, keep_types: tuple[str, ...] = ("response",)
) -> list[tuple[str, str, bytes]]:
    """Materialized :func:`iter_warc_records` (unit-test convenience;
    the Arrow stage iterates the generator directly)."""
    return list(iter_warc_records(b, keep_types))


def explode_warc(
    df: DataFrame,
    raw_col: str = "raw",
    key: str = "doc_id",
    keep_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """warc_files(key, raw) → one row per response record:
    (warc_file = the source key, record_no, doc_id = target URI,
    content_type, raw = body bytes). Pipe into
    ``parse_raw_bytes(out, uri_col='doc_id')`` for spans — the URI's
    extension doubles as the dispatch hint. Corrupt files degrade to
    zero records (guarded per row)."""
    schema = (
        "warc_file string, record_no int, doc_id string, "
        "content_type string, raw binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for k, b in zip(pdf[key].astype(str), pdf[raw_col]):
                if b is None:
                    continue
                try:
                    for j, (uri, ctype, body) in enumerate(
                        iter_warc_records(bytes(b), keep_types)
                    ):
                        rows.append((k, j, uri, ctype, body))
                except Exception:  # noqa: BLE001 — poison-pill guard
                    pass
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "record_no", "doc_id",
                    "content_type", "raw",
                ],
            )

    return df.mapInPandas(batches, schema=schema)


def warc_to_documents(
    df: DataFrame, raw_col: str = "raw", key: str = "doc_id"
) -> DataFrame:
    """WARC files → documents(doc_id, spans): explode response records,
    then the standard sniff+decode road (URI extension as hint). The
    Common Crawl entry point."""
    from extractthinker_spark.operators.rawbytes import parse_raw_bytes

    recs = explode_warc(df, raw_col=raw_col, key=key)
    return parse_raw_bytes(
        recs.select(
            F.col("doc_id"), F.col("doc_id").alias("source_uri"), "raw"
        ),
        uri_col="source_uri",
    ).select("doc_id", "format", "spans")


def make_fixture_warc(
    records: list[tuple[str, str, bytes]],
    gzip_members: bool = False,
    chunked: bool = False,
) -> bytes:
    """Deterministic WARC/1.0 fixture: one response record per
    (uri, content_type, body); ``gzip_members`` wraps each record in
    its own gzip member (the Common Crawl layout), ``chunked`` encodes
    bodies with Transfer-Encoding: chunked."""
    out = []
    for uri, ctype, body in records:
        if chunked:
            http_body = (
                b"%x\r\n" % len(body) + body + b"\r\n0\r\n\r\n"
            )
            te = b"Transfer-Encoding: chunked\r\n"
        else:
            http_body = body
            te = b""
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + ctype.encode("latin-1")
            + b"\r\n" + te + b"\r\n" + http_body
        )
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + uri.encode("latin-1") + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:fixture>\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: %d\r\n\r\n" % len(http)
            + http + b"\r\n\r\n"
        )
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 15 + 16)
            rec = c.compress(rec) + c.flush()
        out.append(rec)
    warcinfo = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )
    if gzip_members:
        c = zlib.compressobj(6, zlib.DEFLATED, 15 + 16)
        warcinfo = c.compress(warcinfo) + c.flush()
    return warcinfo + b"".join(out)
