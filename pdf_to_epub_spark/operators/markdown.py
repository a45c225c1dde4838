"""Markdown corpus metadata: YAML front matter + fenced code blocks.

GitHub/docs corpora arrive as Markdown whose structure carries the
routing signals a training pipeline needs BEFORE tokenization: the YAML
front matter declares title/language/tags, and fenced code blocks must
be measured (and often routed separately from prose — code-vs-text
mixture is a first-class dial).  All of it is regular structure, so the
whole pass stays in codegen ``regexp_*`` algebra — no UDF, no shuffle,
scan-speed at 100 TB.

Float-free: every output is a string or an exact integer count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FM_PAT = r"(?s)^---\n(.*?)\n---\n"
FENCE_PAT = r"(?s)```.*?```"


def markdown_meta(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Markdown structure signals:

    * ``has_front_matter`` — a ``---``-delimited YAML header at the very
      start;
    * ``fm_title`` / ``fm_lang`` — the header's ``title:`` / ``lang:``
      fields ('' when absent);
    * ``n_fences`` — count of well-formed fenced code blocks;
    * ``first_fence_lang`` — the info string of the first fence ('' when
      none or bare);
    * ``code_chars`` — total characters inside fences (fence markers
      included — the bytes a code-router would divert);
    * ``prose_chars`` — characters left after removing the front matter
      and every fence (the text that flows to the prose pipeline).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    fm = F.regexp_extract(text, FM_PAT, 0)
    fm_body = F.regexp_extract(text, FM_PAT, 1)
    code_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(text, F.lit(FENCE_PAT), F.lit(0)),
            lambda x: F.length(x).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    prose = F.regexp_replace(
        F.regexp_replace(text, FM_PAT, ""), FENCE_PAT, ""
    )
    return docs.select(
        id_col,
        (fm != "").alias("has_front_matter"),
        F.regexp_extract(fm_body, r"(?m)^title:\s*(.*)$", 1).alias(
            "fm_title"
        ),
        F.regexp_extract(fm_body, r"(?m)^lang:\s*(\S+)", 1).alias("fm_lang"),
        F.regexp_count(text, F.lit(FENCE_PAT)).cast("long").alias(
            "n_fences"
        ),
        # anchor to the FIRST well-formed fence's opener: a bare first
        # fence must yield '' even when a later fence carries an info
        # string, and a stray inline ``` with no closer must not match
        F.regexp_extract(
            F.regexp_extract(text, FENCE_PAT, 0), r"^```(\w+)", 1
        ).alias("first_fence_lang"),
        code_chars.alias("code_chars"),
        F.length(prose).cast("long").alias("prose_chars"),
    )
