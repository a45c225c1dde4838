"""Page-shard JSON operators (S6/S7/S8/S9): parse, span-slice, merge, trim."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from pdf_to_epub_spark.sources.shards import (
    PAGE_BREAK_SENTINEL,
    make_shards_from_documents,
    merge_shards,
    parse_shard_json,
    shard_text_plain,
    shard_text_with_pagebreaks,
    trim_leading_blank_lines,
)


def test_roundtrip_plain_merge(spark):
    docs = spark.createDataFrame(
        [("u1", "hello world, this is a longer document text"),
         ("u2", "short"),
         ("u3", "abcdefghij" * 50)],
        "url string, text string",
    )
    shards = make_shards_from_documents(docs, n_shards=4)
    parsed = parse_shard_json(shards).withColumn(
        "shard_text", shard_text_plain(F.col("shard"))
    )
    merged = merge_shards(parsed)
    rows = {r["url"]: r["text"] for r in merged.collect()}
    orig = {r["url"]: r["text"] for r in docs.collect()}
    assert rows == orig


def test_span_slicing_with_pagebreaks(spark):
    """Matches the reference jq semantics (batch_ocr_with_page_breaks.py:176-193)."""
    shard_two_pages = json.dumps(
        {
            "text": "PAGEONEPAGETWO",
            "pages": [
                {"layout": {"textAnchor": {"textSegments": [{"startIndex": 0, "endIndex": 7}]}}},
                {"layout": {"textAnchor": {"textSegments": [{"startIndex": 7, "endIndex": 14}]}}},
            ],
        }
    )
    shard_text_only = json.dumps({"text": "JUSTTEXT"})
    shard_empty = json.dumps({})
    # missing startIndex defaults to 0 (jq `.startIndex // 0`)
    shard_default_start = json.dumps(
        {
            "text": "XYZ",
            "pages": [{"layout": {"textAnchor": {"textSegments": [{"endIndex": 2}]}}}],
        }
    )
    df = spark.createDataFrame(
        [("a", 0, shard_two_pages), ("b", 0, shard_text_only),
         ("c", 0, shard_empty), ("d", 0, shard_default_start)],
        "url string, shard_id int, shard_json string",
    )
    got = {
        r["url"]: r["t"]
        for r in parse_shard_json(df)
        .select("url", shard_text_with_pagebreaks(F.col("shard")).alias("t"))
        .collect()
    }
    assert got["a"] == "PAGEONE" + PAGE_BREAK_SENTINEL + "PAGETWO" + PAGE_BREAK_SENTINEL
    assert got["b"] == "JUSTTEXT" + PAGE_BREAK_SENTINEL
    assert got["c"] == ""
    assert got["d"] == "XY" + PAGE_BREAK_SENTINEL


def test_trim_leading_blank_lines(spark):
    df = spark.createDataFrame(
        [("a", "\n  \n\t\nreal text\nmore"),
         ("b", "no leading blanks"),
         ("c", "\n\n \n"),  # all-blank → unchanged (reference quirk)
         ("d", "  \nX")],
        "url string, text string",
    )
    got = {
        r["url"]: r["t"]
        for r in df.select("url", trim_leading_blank_lines(F.col("text")).alias("t")).collect()
    }
    assert got["a"] == "real text\nmore"
    assert got["b"] == "no leading blanks"
    assert got["c"] == "\n\n \n"
    assert got["d"] == "X"


def test_shard_merge_order_independence(spark):
    """Merge must restore reading order regardless of row order (the
    lexical-sort determinism of merge_one_book.py:62)."""
    rows = [("u", i, f"[{i}]") for i in range(10)]
    rows.reverse()
    df = spark.createDataFrame(rows, "url string, shard_id int, shard_text string")
    merged = merge_shards(df.repartition(7)).collect()[0]["text"]
    assert merged == "".join(f"[{i}]" for i in range(10))
