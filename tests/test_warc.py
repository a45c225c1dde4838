"""WARC source (sources/warc.py): writer/parser round-trips, the
binaryFile and streaming-paths read forms, and malformed-input tolerance."""

from __future__ import annotations

import gzip

from pdf_to_epub_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    parse_warc_contents,
    read_warc,
    read_warc_paths,
)

RECS = [
    (f"http://w.example/p/{i}", f"2024-02-0{1 + i % 9}T00:00:0{i % 10}Z",
     f"<html><body>page {i} tvåß</body></html>".encode())
    for i in range(12)
]


def test_pure_roundtrip_all_layouts():
    for gz in (False, True):
        for http in (False, True):
            got = list(iter_warc_records(build_warc_bytes(RECS, gz, http)))
            assert [(u, d, b) for u, d, _, b in got] == RECS
            expected_type = "response" if http else "resource"
            assert all(t == expected_type for _, _, t, _ in got)


def test_non_page_records_and_truncation_skipped():
    data = build_warc_bytes(RECS[:3])
    # a warcinfo record (no Target-URI) must be ignored
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nblah\r\n\r\n")
    # truncated record at the tail must end iteration, not raise
    trunc = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/\r\n"
    got = list(iter_warc_records(info + data + trunc))
    assert [u for u, _, _, _ in got] == [u for u, _, _ in RECS[:3]]


def test_corrupt_gzip_tail_stops_cleanly():
    data = build_warc_bytes(RECS[:2], gzip_members=True)
    got = list(iter_warc_records(data + b"\x1f\x8bgarbage"))
    assert len(got) == 2


def test_read_warc_binaryfile_and_paths(spark, tmp_path):
    p1 = tmp_path / "a.warc.gz"
    p2 = tmp_path / "b.warc"
    p1.write_bytes(build_warc_bytes(RECS[:7], gzip_members=True))
    p2.write_bytes(build_warc_bytes(RECS[7:]))

    via_files = read_warc(spark, str(tmp_path / "*")).collect()
    assert {r["url"] for r in via_files} == {u for u, _, _ in RECS}
    by_url = {r["url"]: r for r in via_files}
    for u, d, payload in RECS:
        assert by_url[u]["warc_date"] == d
        assert bytes(by_url[u]["html"]) == payload

    paths = spark.createDataFrame([(str(p1),), (str(p2),)], "path string")
    via_paths = read_warc_paths(spark, paths).collect()
    assert {r["url"] for r in via_paths} == {u for u, _, _ in RECS}


def test_parse_contents_dataframe(spark):
    rows = [(build_warc_bytes(RECS[:5], gzip_members=True),),
            (build_warc_bytes(RECS[5:]),), (None,)]
    df = spark.createDataFrame(rows, "content binary")
    got = parse_warc_contents(df).collect()
    assert len(got) == len(RECS)
    assert {r["record_type"] for r in got} == {"response"}


def test_stream_matches_inmemory_parser_all_layouts():
    import io

    from pdf_to_epub_spark.sources.warc import stream_warc_records

    big = [(f"http://s.example/{i}", "2024-03-01T00:00:00Z",
            (f"<html>{'x' * (i * 37 % 900)}</html>").encode())
           for i in range(40)]
    for gz in (False, True):
        for http in (False, True):
            data = build_warc_bytes(big, gz, http)
            ref = list(iter_warc_records(data))
            # tiny chunks force every straddle/compaction path
            for chunk in (7, 64, 1 << 20):
                got = list(stream_warc_records(io.BytesIO(data), chunk))
                assert got == ref, (gz, http, chunk, len(got), len(ref))


def test_stream_tolerates_corrupt_and_truncated_tails():
    import io

    from pdf_to_epub_spark.sources.warc import stream_warc_records

    data = build_warc_bytes(RECS[:3], gzip_members=True)
    assert len(list(stream_warc_records(io.BytesIO(data + b"\x1f\x8bbad"), 16))) == 3
    plain = build_warc_bytes(RECS[:3])
    cut = plain[: len(plain) - 40]  # truncate inside the last record
    got = list(stream_warc_records(io.BytesIO(cut), 16))
    assert [u for u, _, _, _ in got] == [u for u, _, _ in RECS[:2]]


def test_stream_resyncs_past_malformed_content_length():
    """A garbled Content-Length mid-file must cost at most that record:
    the streaming parser rescans from the next record marker instead of
    dropping the whole remaining file."""
    import io

    from pdf_to_epub_spark.sources.warc import stream_warc_records

    good = build_warc_bytes(RECS[:4], with_http_headers=False)
    # corrupt record 1's WARC Content-Length value in place
    rec1 = good.find(b"WARC/1.0", 1)
    cl = good.index(b"Content-Length:", rec1)
    eol = good.index(b"\r\n", cl)
    bad = good[:cl] + b"Content-Length: NaN" + good[eol:]
    for chunk in (16, 1 << 20):
        got = [u for u, _, _, _ in stream_warc_records(io.BytesIO(bad), chunk)]
        assert got == [RECS[0][0], RECS[2][0], RECS[3][0]], got


def test_wet_conversion_records_parse():
    """A WET file is a WARC of 'conversion' records with plain-text
    payloads — same container, parsed by the same reader."""
    import io

    from pdf_to_epub_spark.sources.warc import stream_warc_records

    wet = b"".join(
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI: " + u.encode() + b"\r\n"
        b"WARC-Date: 2024-04-01T00:00:00Z\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: " + str(len(t)).encode() + b"\r\n\r\n"
        + t + b"\r\n\r\n"
        for u, t in [("http://w/1", b"extracted text one"),
                     ("http://w/2", "tvåß text".encode())]
    )
    got = list(iter_warc_records(wet))
    assert [(u, t, b) for u, _, t, b in got] == [
        ("http://w/1", "conversion", b"extracted text one"),
        ("http://w/2", "conversion", "tvåß text".encode()),
    ]
    assert list(stream_warc_records(io.BytesIO(wet), 16)) == got


def test_write_warc_distributed_roundtrip(spark, tmp_path):
    """write_warc ∘ read_warc_paths is the identity on (url, payload):
    each partition lands one CC-layout archive; empty partitions write
    nothing; text payloads encode as UTF-8."""
    import datetime

    from pdf_to_epub_spark.sources.warc import read_warc_paths, write_warc

    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(f"http://w.example/{i}", ts if i % 2 else None,
             f"<html>page {i} tvåß</html>".encode()) for i in range(20)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(4)
    out = tmp_path / "warcs"
    write_warc(df, str(out))
    files = sorted(out.glob("part-*.warc.gz"))
    assert 1 <= len(files) <= 4
    assert not list(out.glob("*.inprogress"))
    paths = spark.createDataFrame([(str(p),) for p in files], "path string")
    got = {
        (r["url"], bytes(r["html"]))
        for r in read_warc_paths(spark, paths).collect()
    }
    assert got == {(u, p) for u, _, p in rows}
    dates = {
        r["url"]: r["warc_date"]
        for r in read_warc_paths(spark, paths).collect()
    }
    assert dates["http://w.example/1"] == "2024-03-01T12:00:00Z"
    assert dates["http://w.example/0"] == "1970-01-01T00:00:00Z"


def test_write_warc_fs_commit_path_matches_posix(spark, tmp_path):
    """The Hadoop FileSystem-API sink (stage as parquet through Spark's
    committer, driver-promote via FileSystem.create + rename) must
    produce archives BYTE-IDENTICAL to the posix sink's, with the same
    CDX siblings, no staging dir, and no .inprogress temp left behind.
    Exercised through LocalFileSystem — the same FS-abstraction calls
    route to HDFS/S3A on a cluster (VERDICT r4 #7)."""
    import datetime

    from pdf_to_epub_spark.sources.warc import write_warc, write_warc_fs

    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(f"http://w.example/{i}", ts if i % 2 else None,
             f"<html>page {i} tvåß</html>".encode()) for i in range(20)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(4, "url")
    posix_out, fs_out = tmp_path / "posix", tmp_path / "hfs"
    write_warc(df, str(posix_out), cdx=True)
    write_warc_fs(df, str(fs_out), cdx=True)

    posix_files = sorted(p.name for p in posix_out.iterdir())
    fs_files = sorted(p.name for p in fs_out.iterdir() if p.name != "_staging")
    assert not (fs_out / "_staging").exists()
    assert not [n for n in fs_files if n.endswith(".inprogress")]
    # Hadoop LocalFileSystem writes .crc sidecars; archives + cdx match
    fs_payload = [n for n in fs_files if not n.startswith(".")]
    assert fs_payload == posix_files
    for name in posix_files:
        assert (fs_out / name).read_bytes() == (
            posix_out / name
        ).read_bytes(), name


def test_write_warc_cdx_index(spark, tmp_path):
    """cdx=True writes a CDXJ sibling per archive: lines sorted by SURT
    key, each (offset, length) extracting exactly one gzip member whose
    record matches the indexed url and sha1-b32 digest; archive bytes
    are unchanged vs cdx=False and deterministic across runs; load_cdx
    reads the index back as a DataFrame."""
    import base64
    import datetime
    import hashlib
    import json

    from pdf_to_epub_spark.sources.warc import (
        iter_warc_records,
        load_cdx,
        surt_key,
        write_warc,
    )

    assert surt_key("https://WWW.Example.COM/A/b?q=1") == "com,example)/A/b?q=1"
    assert surt_key("http://u:p@sub.example.org:8080/") == "org,example,sub)/"

    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(f"http://w{i % 3}.example/p{i}", ts,
             f"<html>page {i}</html>".encode()) for i in range(20)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(3)
    out1, out2, out3 = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    write_warc(df, str(out1), cdx=True)
    write_warc(df, str(out2), cdx=True)
    write_warc(df, str(out3), cdx=False)

    payloads = {u: p for u, _, p in rows}
    n_lines = 0
    for cdxfile in sorted(out1.glob("part-*.cdx")):
        arc = cdxfile.with_name(cdxfile.name.replace(".cdx", ".warc.gz"))
        data = arc.read_bytes()
        # byte-determinism across runs, and cdx building didn't change
        # the archive bytes
        assert data == (out2 / arc.name).read_bytes()
        assert data == (out3 / arc.name).read_bytes()
        lines = cdxfile.read_text().splitlines()
        n_lines += len(lines)
        assert [ln.split(" ", 1)[0] for ln in lines] == sorted(
            ln.split(" ", 1)[0] for ln in lines
        )
        for ln in lines:
            key, ts14, js = ln.split(" ", 2)
            meta = json.loads(js)
            assert ts14 == "20240301120000" and meta["filename"] == arc.name
            member = data[meta["offset"]: meta["offset"] + meta["length"]]
            (rec,) = iter_warc_records(member)
            assert rec[0] == meta["url"] and key == surt_key(meta["url"])
            digest = base64.b32encode(
                hashlib.sha1(payloads[meta["url"]]).digest()
            ).decode("ascii")
            assert meta["digest"] == "sha1:" + digest
    assert n_lines == 20

    idx = load_cdx(spark, str(out1))
    assert idx.count() == 20
    assert {r["url"] for r in idx.collect()} == set(payloads)
    assert idx.schema.simpleString() == (
        "struct<surt:string,ts:string,url:string,filename:string,"
        "offset:bigint,length:bigint,digest:string>"
    )


def test_write_warc_wet_mode(spark, tmp_path):
    """wet=True writes WET archives: part-*.warc.wet.gz files of
    WARC-Type: conversion / text/plain records carrying the raw text
    bytes (no HTTP wrapping), readable back by the same scanner; cdx
    indexing composes with wet mode."""
    import datetime
    import gzip as _gzip

    from pdf_to_epub_spark.sources.warc import read_warc_paths, write_warc

    ts = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (f"http://w.example/{i}", ts, f"extracted text {i} tvåß")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    ).repartition(3)
    out = tmp_path / "wet"
    write_warc(df, str(out), payload_col="text", wet=True, cdx=True)
    files = sorted(out.glob("part-*.warc.wet.gz"))
    assert files and not list(out.glob("part-*.warc.gz"))
    raw = _gzip.decompress(files[0].read_bytes()[:])  # first member only
    head = raw.split(b"\r\n\r\n", 1)[0]
    assert b"WARC-Type: conversion" in head
    assert b"Content-Type: text/plain" in head
    assert b"HTTP/1.1" not in raw
    # cdx sibling exists per archive
    assert len(list(out.glob("part-*.cdx"))) == len(files)
    paths = spark.createDataFrame([(str(p),) for p in files], "path string")
    got = {
        (r["url"], bytes(r["html"]).decode("utf-8"), r["record_type"])
        for r in read_warc_paths(spark, paths).collect()
    }
    assert got == {(u, t, "conversion") for u, _, t in rows}


def test_warc_python_datasource_roundtrip(spark, tmp_path):
    """spark.read.format('warc') (the PySpark-4 Python DataSource) must
    return exactly what read_warc_paths parses from the same archives,
    with one input partition per file (the CC planning contract)."""
    import pathlib

    from pyspark.sql import functions as F

    from pdf_to_epub_spark.sources.warc import (
        read_warc_paths,
        register_warc_source,
        write_warc,
    )

    docs = spark.createDataFrame(
        [(f"http://ex.com/{i}", f"<html>doc {i} body</html>".encode())
         for i in range(60)],
        "url string, html binary",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    out = str(tmp_path / "warc")
    write_warc(docs.repartition(3), out)
    files = sorted(str(p) for p in pathlib.Path(out).glob("part-*.warc.gz"))
    assert len(files) == 3

    register_warc_source(spark)
    ds = spark.read.format("warc").load(out + "/part-*.warc.gz")
    assert ds.rdd.getNumPartitions() == 3  # one partition per archive
    got = sorted(
        (r.url, r.record_type, bytes(r.html)) for r in ds.collect()
    )
    paths_df = spark.createDataFrame([(f,) for f in files], "path string")
    want = sorted(
        (r.url, r.record_type, bytes(r.html))
        for r in read_warc_paths(spark, paths_df).collect()
    )
    assert got == want and len(got) == 60
    # small Arrow batches must not change results
    ds2 = (
        spark.read.format("warc")
        .option("records_per_batch", "7")
        .load(out + "/part-*.warc.gz")
    )
    assert ds2.count() == 60


def test_warc_datasource_no_match_errors(spark, tmp_path):
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    from pdf_to_epub_spark.sources.warc import register_warc_source

    register_warc_source(spark)
    df = spark.read.format("warc").load(str(tmp_path / "nope-*.warc.gz"))
    with pytest.raises(Exception, match="no files match"):
        df.collect()


def test_warc_datasource_rejects_remote_uri_schemes():
    """Planning globs driver-side and reading opens executor-side, so
    URI schemes (hdfs://, s3a://) must fail LOUDLY at planning time —
    not task-side with a confusing FileNotFoundError."""
    import pytest

    from pdf_to_epub_spark.sources.warc import _WarcReader

    with pytest.raises(ValueError, match="posix filesystem"):
        _WarcReader({"path": "s3a://bucket/crawl/*.warc.gz"})
    with pytest.raises(ValueError, match="posix filesystem"):
        _WarcReader({"path": "hdfs://nn:8020/crawl/*.warc.gz"})
    # file:// is local: accepted, scheme stripped for glob/open
    r = _WarcReader({"path": "file:///tmp/x-*.warc.gz"})
    assert r._path == "/tmp/x-*.warc.gz"
