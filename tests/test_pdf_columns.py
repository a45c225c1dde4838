"""Two-column PDF layout + column-aware reading order (sources/pdf.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_to_epub_spark.sources.pdf import (
    blocks_in_column_order,
    blocks_in_reading_order,
    documents_as_two_column_pdfs,
    parse_pdf_payloads,
)

WORDS_120 = " ".join(f"w{i:03d}" for i in range(120))  # 15 lines + title


def _blocks(spark, text):
    docs = spark.createDataFrame(
        [(1, text)], "doc_id long, text string"
    )
    return parse_pdf_payloads(documents_as_two_column_pdfs(docs))


def test_column_order_recovers_linear_flow(spark):
    out = sorted(
        blocks_in_column_order(_blocks(spark, WORDS_120)).collect(),
        key=lambda r: r.block_id,
    )
    # block 0 = title, then 8-word lines in original order
    assert out[0].text == "Document 1" and out[0].block_type == "heading"
    assert out[1].text.startswith("w000 ") and out[6].text.startswith("w040 ")
    # the title takes the left column's first slot, so block 6 opens the
    # RIGHT column of page 0
    assert out[5].column == 0 and out[6].column == 1
    assert [r.text.split()[0] for r in out[1:]] == [
        f"w{8 * i:03d}" for i in range(15)
    ]
    # page 1 starts at line 12
    assert out[12].page == 1 and out[12].column == 0


def test_naive_order_interleaves_but_column_order_does_not(spark):
    blocks = _blocks(spark, WORDS_120)
    naive = sorted(
        blocks_in_reading_order(blocks).collect(), key=lambda r: r.block_id
    )
    # same y in both columns → naive sort alternates columns row-by-row
    naive_first_words = [r.text.split()[0] for r in naive[:4]]
    assert naive_first_words != ["Document", "w000", "w008", "w016"]
    assert "w048" in naive_first_words  # right-column row pulled forward


def test_single_column_pages_degrade_gracefully(spark):
    # 3 lines → no right column; column-aware == plain reading order
    short = " ".join(f"s{i}" for i in range(24))
    cols = sorted(
        blocks_in_column_order(_blocks(spark, short)).collect(),
        key=lambda r: r.block_id,
    )
    assert all(r.column == 0 for r in cols)
    assert [r.text.split()[0] for r in cols] == ["Document", "s0", "s8", "s16"]


def test_empty_doc_single_title_block(spark):
    out = blocks_in_column_order(_blocks(spark, "")).collect()
    assert len(out) == 1 and out[0].text == "Document 1"
    assert out[0].column == 0 and out[0].block_id == 0
