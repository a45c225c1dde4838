"""End-to-end Spark pipeline: documents table → extract → blocks → assembly.

The correctness oracle is the (reference-parity-tested) pure-Python
transform: per url, the Spark-assembled text must equal ``transform_text``
of the raw input byte-for-byte — the `north_rule` invariant, distributed.
"""

from __future__ import annotations

import pytest

from pdf_to_epub_spark.extractlib import transform_text
from pdf_to_epub_spark.operators import (
    assemble_documents,
    blocks_table,
    corpus_counters,
    decode_binary_pages,
    extract_documents,
    partition_metrics,
    pending_documents,
    status_summary,
    with_doc_hash,
)
from pdf_to_epub_spark.sources.synth import make_documents

N_DOCS = 40


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(make_documents(N_DOCS, seed=99)).cache()


@pytest.fixture(scope="module")
def extracted(docs_df):
    return extract_documents(docs_df, salt_partitions=8).cache()


def test_extract_statuses(extracted):
    rows = {r["status"]: r["docs"] for r in status_summary(extracted).collect()}
    assert rows == {"ok": N_DOCS}


def test_extract_matches_pure_python(docs_df, extracted):
    raw = {r["url"]: r["text"] for r in docs_df.select("url", "text").collect()}
    got = {r["url"]: r["text"] for r in extracted.select("url", "text").collect()}
    assert set(got) == set(raw)
    for url, raw_text in raw.items():
        expected, _ = transform_text(raw_text)
        assert got[url] == expected, f"stage-3 mismatch for {url}"


def test_blocks_and_assembly_roundtrip(docs_df, extracted):
    blocks = blocks_table(extracted)
    assembled = assemble_documents(blocks)
    raw = {r["url"]: r["text"] for r in docs_df.select("url", "text").collect()}
    rows = assembled.collect()
    assert len(rows) == N_DOCS
    for r in rows:
        expected, _ = transform_text(raw[r["url"]])
        assert r["assembled_text"] == expected
        assert all(t.startswith("CHAPTER ") for t in r["toc"])
        assert r["n_chapters"] == len(r["toc"])
        ids = [b["block_id"] for b in r["blocks"]]
        assert ids == sorted(ids) == list(range(len(ids)))


def test_block_spans_monotone(extracted):
    from pyspark.sql import functions as F

    blocks = blocks_table(extracted)
    bad = blocks.where(
        (F.col("span_start") >= F.col("span_end"))
        | (F.col("span_start") < 0)
    ).count()
    assert bad == 0


def test_binary_decode_path(spark, docs_df):
    decoded = decode_binary_pages(docs_df.drop("text"))
    pairs = (
        decoded.select("url", "text")
        .join(docs_df.select("url", docs_df["text"].alias("orig")), "url")
        .collect()
    )
    assert len(pairs) == N_DOCS
    for r in pairs:
        assert r["text"] == r["orig"]


def test_resume_anti_join(spark, docs_df):
    hashed = with_doc_hash(docs_df)
    done = hashed.limit(15).select("doc_hash")
    pending = pending_documents(hashed, done)
    assert pending.count() == N_DOCS - 15
    # resuming with everything done → empty
    assert pending_documents(hashed, hashed.select("doc_hash")).count() == 0


def test_metrics_tables(extracted):
    m = partition_metrics(extracted, run_id="t", stage="extract")
    rows = m.collect()
    assert sum(r["url_count"] for r in rows) == N_DOCS
    assert all(r["run_id"] == "t" and r["stage"] == "extract" for r in rows)
    roll = {r["counter"]: r["total"] for r in corpus_counters(extracted).collect()}
    assert roll.get("blocks_emitted", 0) > 0
    assert "step2.reflow.single_newlines_joined" in roll


def test_quarantine_on_error(spark):
    import datetime

    rows = [
        {"url": "u://bad", "warc_ts": datetime.datetime(2025, 1, 1), "lang": "en",
         "html": b"x", "text": None},
        {"url": "u://ok", "warc_ts": datetime.datetime(2025, 1, 1), "lang": "en",
         "html": b"y", "text": "CHAPTER I\n\nFINE TEXT here.\n"},
    ]
    df = spark.createDataFrame(rows, schema="url string, warc_ts timestamp, lang string, html binary, text string")
    out = extract_documents(df)
    by_status = {r["url"]: r["status"] for r in out.collect()}
    assert by_status == {"u://bad": "error", "u://ok": "ok"}


def test_bucketed_layout_extraction_is_shuffle_free(spark, tmp_path):
    """The deployment path (Iceberg bucket(N, url) input layout, emulated
    by `write_parquet(bucket_by_url=True)`) must run extraction with NO
    shuffle exchange: scan partitions flow straight into the Arrow stage.
    The salted fallback (`salt_partitions=N`) is the one that pays a
    repartition — pinned here so the bench's two entries keep meaning."""
    from pdf_to_epub_spark.operators.bucketing import plan_has_exchange
    from pdf_to_epub_spark.sources.synth import write_parquet

    path = tmp_path / "bucketed_corpus"
    write_parquet(str(path), 40, seed=17, n_files=4, bucket_by_url=True)
    docs = spark.read.parquet(str(path))

    assert not plan_has_exchange(extract_documents(docs, salt_partitions=None))
    assert plan_has_exchange(extract_documents(docs, salt_partitions=8))
