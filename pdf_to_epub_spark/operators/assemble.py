"""Chapter / document assembly — the blocks → structured-document aggregation.

This is the `north_star`'s required aggregation (reference analog: the
EPUB spine/TOC builder, `/root/reference/text-processing/legacy/
Step4_create_epub.py:41-55,105-143` and ordered shard concat,
`/root/reference/ocr-processing/merge_one_book.py:62-80`).

Everything here is JVM-side Catalyst expressions — ``collect_list`` +
``array_sort`` + higher-order functions — so assembly stays inside
whole-stage codegen with exactly ONE shuffle (the groupBy on url).
``array_sort`` on a struct orders by its first field, ``block_id``, which
restores reading order regardless of shuffle arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_documents(blocks: DataFrame) -> DataFrame:
    """(url, block_id, block_type, text, span_start, span_end) rows →
    one structured row per url:

    * ``blocks``          — array<struct> in reading order
    * ``assembled_text``  — exact byte reassembly of the stage-3 document
    * ``toc``             — heading texts in order (the EPUB TOC)
    * ``n_chapters`` / ``n_blocks``
    """
    ordered = F.array_sort(
        F.collect_list(
            F.struct("block_id", "block_type", "text", "span_start", "span_end")
        )
    )
    return (
        blocks.groupBy("url")
        .agg(ordered.alias("blocks"))
        .select(
            "url",
            "blocks",
            F.concat_ws(
                "", F.transform("blocks", lambda b: b["text"])
            ).alias("assembled_text"),
            F.transform(
                F.filter("blocks", lambda b: b["block_type"] == F.lit("heading")),
                # NB: Spark's trim() strips spaces only; block slices carry
                # trailing newlines/form-feeds, so strip all whitespace.
                lambda b: F.regexp_replace(b["text"], r"^\s+|\s+$", ""),
            ).alias("toc"),
            F.size(
                F.filter("blocks", lambda b: b["block_type"] == F.lit("heading"))
            ).alias("n_chapters"),
            F.size("blocks").alias("n_blocks"),
        )
    )


def ordered_concat(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "merged",
    sep: str = "",
) -> DataFrame:
    """Generic reading-order reconstruction (operator S8/A1): ordered
    concatenation of shard/segment values per key — the Spark form of the
    reference's lexical shard sort + byte concat
    (`/root/reference/ocr-processing/merge_one_book.py:62-80`)."""
    part = F.struct(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_v")
    )
    return (
        df.groupBy(key_col)
        .agg(F.array_sort(F.collect_list(part)).alias("_parts"))
        .select(
            key_col,
            F.concat_ws(sep, F.transform("_parts", lambda p: p["_v"])).alias(out_col),
        )
    )
