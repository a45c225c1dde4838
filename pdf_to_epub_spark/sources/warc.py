"""WARC (Web ARChive, ISO 28500) source: the container format Common
Crawl actually ships.

Parser + writer for the subset a text pipeline needs: ``response`` /
``resource`` records, WARC/1.0 and 1.1, plain or per-record-gzip-member
files (the CC layout — each record its own gzip member, members
concatenated; ``zlib`` decompresses them in sequence).

Scale shape: parsing is a :meth:`mapInArrow` pass over ``(content:
binary)`` rows — one row per WARC file (or file split).  Nothing
shuffles; the output is the page-table rows the rest of the engine
consumes (input_hint schema).  For multi-GB archives, feed paths instead
of contents via :func:`read_warc_paths` — each task streams its file in
constant memory rather than holding the whole archive as one row.

The writer exists so tests and the driver query can round-trip
deterministically without external data: ``build_warc_bytes`` emits a
valid WARC file from (url, date, payload) triples.

Reference parity note: no analog in the reference (it reads exported
page-JSON shards; SURVEY §2 S6-S7) — this is the web-scale source the
north-star input table is loaded from.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = (
    "url string, warc_date string, record_type string, html binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def build_warc_bytes(
    records: Iterable[tuple[str, str, bytes]],
    gzip_members: bool = False,
    with_http_headers: bool = True,
) -> bytes:
    """Serialize (url, iso_date, payload) triples as a WARC file.

    ``with_http_headers`` wraps each payload in a minimal HTTP/1.1
    response block (the CC ``response`` record shape); otherwise records
    are ``resource`` records carrying the raw payload."""
    out = io.BytesIO()
    for url, date, payload in records:
        if with_http_headers:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
                + payload
            )
            rtype = b"response"
            ctype = b"application/http; msgtype=response"
        else:
            http = payload
            rtype = b"resource"
            ctype = b"text/html"
        rec_id = hashlib.md5((url + date).encode()).hexdigest()
        block = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:" + rec_id.encode() + b">\r\n"
            b"WARC-Target-URI: " + url.encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n"
            b"\r\n" + http + b"\r\n\r\n"
        )
        out.write(gzip.compress(block) if gzip_members else block)
    return out.getvalue()


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members (the CC per-record layout)."""
    import zlib

    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(data[pos:])
        except zlib.error:  # corrupt member (truncated fetch): stop
            break
        yield member
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # corrupt trailer: stop rather than spin
            break
        pos += consumed


def iter_warc_records(
    data: bytes,
) -> Iterator[tuple[str, str, str, bytes]]:
    """Yield (url, warc_date, record_type, payload) from one WARC file's
    bytes; ``response`` records have their HTTP header block stripped so
    the payload is the raw html.  Malformed trailing bytes end iteration
    (a truncated fetch should not kill the task)."""
    if data[:2] == _GZIP_MAGIC:
        chunks: Iterable[bytes] = _split_gzip_members(data)
    else:
        chunks = [data]
    for chunk in chunks:
        pos = 0
        while True:
            start = chunk.find(b"WARC/", pos)
            if start == -1:
                break
            hdr_end = chunk.find(b"\r\n\r\n", start)
            if hdr_end == -1:
                break
            headers: dict[str, str] = {}
            for line in chunk[start:hdr_end].split(b"\r\n")[1:]:
                k, _, v = line.partition(b":")
                headers[k.strip().lower().decode()] = v.strip().decode(
                    "utf-8", "replace"
                )
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                break
            body = chunk[hdr_end + 4 : hdr_end + 4 + length]
            pos = hdr_end + 4 + length
            rtype = headers.get("warc-type", "")
            url = headers.get("warc-target-uri", "")
            date = headers.get("warc-date", "")
            if rtype == "response" and body[:5] in (b"HTTP/",):
                http_end = body.find(b"\r\n\r\n")
                if http_end != -1:
                    body = body[http_end + 4 :]
            if rtype in ("response", "resource") and url:
                yield url, date, rtype, body


def parse_warc_contents(
    df: DataFrame, content_col: str = "content"
) -> DataFrame:
    """One page row per record from ``(content: binary)`` WARC-file rows —
    an Arrow-batched narrow pass, no shuffle."""
    import pyarrow as pa

    def batches(it):
        for b in it:
            urls, dates, types, bodies = [], [], [], []
            for content in b.column(0).to_pylist():
                if content is None:
                    continue
                for url, date, rtype, body in iter_warc_records(content):
                    urls.append(url)
                    dates.append(date)
                    types.append(rtype)
                    bodies.append(body)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(dates, pa.string()),
                    pa.array(types, pa.string()),
                    pa.array(bodies, pa.binary()),
                ],
                names=["url", "warc_date", "record_type", "html"],
            )

    return df.select(F.col(content_col)).mapInArrow(batches, RECORD_SCHEMA)


def read_warc_paths(
    spark: SparkSession, paths_df: DataFrame, path_col: str = "path"
) -> DataFrame:
    """The multi-GB-archive form: each task opens and parses its own file
    (constant memory per batch) instead of shipping file bytes as rows."""
    import pyarrow as pa

    def batches(it):
        for b in it:
            for path in b.column(0).to_pylist():
                with open(path, "rb") as f:
                    data = f.read()
                urls, dates, types, bodies = [], [], [], []
                for url, date, rtype, body in iter_warc_records(data):
                    urls.append(url)
                    dates.append(date)
                    types.append(rtype)
                    bodies.append(body)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(urls, pa.string()),
                        pa.array(dates, pa.string()),
                        pa.array(types, pa.string()),
                        pa.array(bodies, pa.binary()),
                    ],
                    names=["url", "warc_date", "record_type", "html"],
                )

    return paths_df.select(F.col(path_col)).mapInArrow(batches, RECORD_SCHEMA)


def read_warc(spark: SparkSession, glob: str) -> DataFrame:
    """Convenience: binaryFile scan -> parse.  Fine for shard-sized
    archives; use :func:`read_warc_paths` when single files exceed what a
    row should hold."""
    files = spark.read.format("binaryFile").load(glob)
    return parse_warc_contents(files, "content")
