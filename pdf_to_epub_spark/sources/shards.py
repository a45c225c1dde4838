"""Page-shard JSON operators — the OCR-shard ingestion surface.

The reference consumes per-page-range JSON shards named ``{stem}-N.json``
and rebuilds document text in lexical shard order
(`/root/reference/ocr-processing/merge_one_book.py:53-80`).  Two text
extraction modes exist:

* **plain** (S6): take the shard's top-level ``.text``
  (`merge_one_book.py:72-80`, jq ``.text // empty``)
* **span-sliced with page breaks** (S7): rebuild each page from its
  ``textAnchor.textSegments`` offsets into the shard text and join pages
  with a ``---Page-Break---`` sentinel
  (`batch_ocr_with_page_breaks.py:176-193`)

plus the reading-order merge (S8, lexical sort ≙ ascending shard_id) and
the leading-blank-line trim (S9, `merge_one_book.py:83-91`).

Everything is JVM-side: ``from_json`` + higher-order functions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAGE_BREAK_SENTINEL = "\n---Page-Break---\n"

# Schema of the Document-AI-style shard JSON the jq programs consume.
SHARD_JSON_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField(
            "pages",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "layout",
                            StructType(
                                [
                                    StructField(
                                        "textAnchor",
                                        StructType(
                                            [
                                                StructField(
                                                    "textSegments",
                                                    ArrayType(
                                                        StructType(
                                                            [
                                                                StructField("startIndex", LongType()),
                                                                StructField("endIndex", LongType()),
                                                            ]
                                                        )
                                                    ),
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        )
                    ]
                )
            ),
        ),
    ]
)


def parse_shard_json(df: DataFrame, json_col: str = "shard_json") -> DataFrame:
    """Parse the raw shard JSON string into a typed ``shard`` struct column."""
    return df.withColumn("shard", F.from_json(F.col(json_col), SHARD_JSON_SCHEMA))


def shard_text_plain(shard: Column) -> Column:
    """S6: ``jq -r '.text // empty'`` — null-safe top-level text."""
    return F.coalesce(shard["text"], F.lit(""))


def shard_text_with_pagebreaks(shard: Column) -> Column:
    """S7: per-page span slicing + page-break sentinels, matching the jq
    program at `batch_ocr_with_page_breaks.py:176-193`:

    * pages present and non-empty → per page, concat
      ``text[startIndex:endIndex]`` slices, join pages with the sentinel,
      append a trailing sentinel
    * only text present → text + sentinel
    * neither → empty string
    """
    text = shard["text"]
    pages = shard["pages"]

    def page_text(page: Column) -> Column:
        segs = F.coalesce(
            page["layout"]["textAnchor"]["textSegments"],
            F.array().cast("array<struct<startIndex:bigint,endIndex:bigint>>"),
        )
        return F.concat_ws(
            "",
            F.transform(
                segs,
                lambda s: F.substring(
                    text,
                    (F.coalesce(s["startIndex"], F.lit(0)) + 1).cast("int"),
                    (
                        F.coalesce(s["endIndex"], F.lit(0))
                        - F.coalesce(s["startIndex"], F.lit(0))
                    ).cast("int"),
                ),
            ),
        )

    joined_pages = F.concat_ws(
        PAGE_BREAK_SENTINEL, F.transform(pages, page_text)
    )
    return (
        F.when(
            pages.isNotNull() & (F.size(pages) > 0) & text.isNotNull(),
            F.concat(joined_pages, F.lit(PAGE_BREAK_SENTINEL)),
        )
        .when(text.isNotNull(), F.concat(text, F.lit(PAGE_BREAK_SENTINEL)))
        .otherwise(F.lit(""))
    )


def merge_shards(
    shards: DataFrame,
    url_col: str = "url",
    order_col: str = "shard_id",
    text_col: str = "shard_text",
    out_col: str = "text",
) -> DataFrame:
    """S8 reading-order reconstruction: ordered concat of shard texts per
    document (ascending shard_id ≙ the reference's lexical filename sort)."""
    from pdf_to_epub_spark.operators.assemble import ordered_concat

    return ordered_concat(shards, url_col, order_col, text_col, out_col=out_col)


def trim_leading_blank_lines(text: Column) -> Column:
    """S9: drop leading lines that are blank after strip()
    (`merge_one_book.py:83-91`).  Reference quirk preserved: if the document
    has NO non-blank line at all it is returned unchanged."""
    stripped = F.regexp_replace(text, r"\A(?:[^\S\n]*\n)+", "")
    return F.when(text.rlike(r"\S"), stripped).otherwise(text)


def make_shards_from_documents(
    docs: DataFrame,
    n_shards: int = 3,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Synthesize a span-addressed shard table from whole documents (for
    tests/benchmarks): split each text into ``n_shards`` contiguous chunks
    and emit reference-shaped shard JSON rows (url, shard_id, shard_json).
    Ground truth: plain-merge of the shards == the original text."""
    exploded = docs.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("_text"),
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard_id"),
    )
    chunk = F.ceil(
        (F.length("_text") + F.lit(n_shards - 1)) / F.lit(n_shards)
    ).cast("int")
    shard_text = F.substring(
        F.col("_text"), (F.col("shard_id") * chunk + 1).cast("int"), chunk
    )
    payload = F.to_json(
        F.struct(
            shard_text.alias("text"),
            F.array(
                F.struct(
                    F.struct(
                        F.struct(
                            F.array(
                                F.struct(
                                    F.lit(0).cast("long").alias("startIndex"),
                                    F.length(shard_text).cast("long").alias("endIndex"),
                                )
                            ).alias("textSegments")
                        ).alias("textAnchor")
                    ).alias("layout")
                )
            ).alias("pages"),
        )
    )
    return exploded.select("url", "shard_id", payload.alias("shard_json"))
