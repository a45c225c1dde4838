"""SRT/WebVTT subtitle source — render, parse, transcript assembly,
ENTIRELY relational (zero Python on the hot path).

Video-subtitle corpora (OpenSubtitles, YouTube CC) are a standard
training-data source; their extraction problem is the same
reading-order + assembly contract as the reference's shard merge
(SURVEY §2 S8/A1): ordered fragments with metadata must parse, order,
and concatenate into documents — here with TIME as the ordering key and
silence gaps as the paragraph structure.

Unlike the binary sources (pdf/docx), subtitle files are line-oriented
text, so BOTH directions stay in Catalyst: the renderer builds cue
blocks with ``lpad``/``concat`` string algebra + one ordered
``collect_list`` per document, and the parser is ``split`` +
``regexp_extract`` over cue blocks — whole-stage codegen, no UDF, no
Python.  At 100 TB both run at scan speed with a single per-doc shuffle
for the ordered assembly.

Formats: SRT (``HH:MM:SS,mmm``, numeric cue index line) and WebVTT
(``WEBVTT`` header, ``HH:MM:SS.mmm``, index line optional) — the parser
handles both; malformed cue blocks (no timing line) are dropped, not
task failures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CUE_TOKENS = 8     # tokens per cue
LINE_TOKENS = 4    # tokens on the first cue line (two-line cues beyond)
CUE_MS = 2500      # cue pitch
CUE_DUR = 2400     # cue duration (100 ms inter-cue gap)
LONG_GAP_EVERY = 10   # every 10th cue follows a silence …
LONG_GAP_MS = 5000    # … of 5 s (paragraph-break bait)

_TIMING_RE = (
    r"^(\d{2,}):(\d{2}):(\d{2})[,.](\d{3}) --> "
    r"(\d{2,}):(\d{2}):(\d{2})[,.](\d{3})"
)


def _fmt_ts(ms: Column, sep: str) -> Column:
    """``HH:MM:SS{sep}mmm`` from integer milliseconds, pure string algebra."""
    two = lambda c: F.lpad(c.cast("string"), 2, "0")  # noqa: E731
    # hours use format_string, not lpad: lpad TRUNCATES 3+-digit values
    # (lpad('100',2,'0') = '10'), silently jumping a >100 h transcript's
    # cues backwards ~90 h; %02d pads short values and passes long ones
    return F.concat(
        F.format_string("%02d", (ms / 3_600_000).cast("long")),
        F.lit(":"),
        two((ms / 60_000).cast("long") % 60),
        F.lit(":"),
        two((ms / 1_000).cast("long") % 60),
        F.lit(sep),
        F.lpad((ms % 1_000).cast("string"), 3, "0"),
    )


def _cue_schedule(cue: Column) -> tuple[Column, Column]:
    """Deterministic cue timing: 2.5 s pitch, plus a 5 s silence before
    every ``LONG_GAP_EVERY``-th cue (the transcript paragraph bait)."""
    start = cue * CUE_MS + (cue / LONG_GAP_EVERY).cast("long") * LONG_GAP_MS
    return start, start + CUE_DUR


def render_srt(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vtt: bool = False,
) -> DataFrame:
    """documents → ``(id, subs: string)``: tokens chunk into
    ``CUE_TOKENS``-token cues (first ``LINE_TOKENS`` on line 1, the rest
    on line 2), deterministic timing from :func:`_cue_schedule`.  With
    ``vtt=True`` emits WebVTT (header, ``.`` separator, no index lines),
    else SRT.  Tokenless documents render an empty (header-only) file.
    """
    sep = "." if vtt else ","
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda x: x != F.lit(""),
        ).alias("_toks"),
    )
    pos = toks.select("_id", F.posexplode("_toks").alias("_pos", "_term"))
    cues = (
        pos.groupBy("_id", (F.col("_pos") / CUE_TOKENS).cast("long").alias("cue"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_term"))
                    ),
                    lambda s: s["_term"],
                ),
                " ",
            ).alias("_flat")
        )
    )
    line1 = F.array_join(
        F.slice(F.split(F.col("_flat"), " "), 1, LINE_TOKENS), " "
    )
    rest = F.array_join(
        F.slice(
            F.split(F.col("_flat"), " "),
            LINE_TOKENS + 1,
            F.greatest(
                F.size(F.split(F.col("_flat"), " ")) - LINE_TOKENS, F.lit(0)
            ),
        ),
        " ",
    )
    body = F.when(rest == "", line1).otherwise(
        F.concat(line1, F.lit("\n"), rest)
    )
    start, end = _cue_schedule(F.col("cue"))
    index_line = F.lit("") if vtt else F.concat(
        (F.col("cue") + 1).cast("string"), F.lit("\n")
    )
    block = F.concat(
        index_line,
        _fmt_ts(start, sep),
        F.lit(" --> "),
        _fmt_ts(end, sep),
        F.lit("\n"),
        body,
    )
    rendered = cues.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("cue", block.alias("b")))),
                lambda s: s["b"],
            ),
            "\n\n",
        ).alias("_body")
    )
    header = "WEBVTT\n\n" if vtt else ""
    # tokenless docs fall out of the groupBy → restore with empty files
    all_ids = docs.select(F.col(id_col).alias("_id")).distinct()
    return (
        all_ids.join(rendered, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.concat(
                F.lit(header), F.coalesce(F.col("_body"), F.lit(""))
            ).alias("subs"),
        )
    )


def parse_subtitle_cues(
    df: DataFrame, subs_col: str = "subs", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, subs: string)`` → one row per cue: ``(id, cue_id, start_ms,
    end_ms, text)`` — format auto-detected per cue block (SRT index line
    or bare VTT timing), ``WEBVTT`` header and malformed blocks dropped.
    Pure split/regexp algebra; ``cue_id`` numbers parsed cues from 1 in
    file order (the SRT index is echoed by construction but NOT trusted).
    """
    blocks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.col(subs_col), r"\r?\n\r?\n")
        ).alias("_seq", "_block"),
    )
    lines = blocks.select(
        "_id", "_seq", F.split(F.col("_block"), r"\r?\n").alias("_lines")
    )
    # timing line is line 0 (VTT, no index) or line 1 (SRT);
    # try_element_at: one-line cue blocks are shorter than the probe
    l0 = F.coalesce(F.try_element_at("_lines", F.lit(1)), F.lit(""))
    l1 = F.coalesce(F.try_element_at("_lines", F.lit(2)), F.lit(""))
    t0 = F.regexp_extract(l0, _TIMING_RE, 0)
    timing_at = F.when(t0 != "", F.lit(0)).when(
        F.regexp_extract(l1, _TIMING_RE, 0) != "", F.lit(1)
    )
    timed = lines.withColumn("_tat", timing_at).where(
        F.col("_tat").isNotNull()
    )
    timing = F.try_element_at("_lines", F.col("_tat") + 1)

    def _ms(base: int) -> Column:
        g = lambda i: F.regexp_extract(timing, _TIMING_RE, base + i).cast(  # noqa: E731
            "long"
        )
        return (
            g(1) * 3_600_000 + g(2) * 60_000 + g(3) * 1_000 + g(4)
        )

    text = F.array_join(
        F.slice(
            F.col("_lines"),
            F.col("_tat") + 2,
            F.greatest(
                F.size("_lines") - F.col("_tat") - 1, F.lit(0)
            ),
        ),
        "\n",
    )
    parsed = timed.select(
        "_id",
        "_seq",
        _ms(0).alias("start_ms"),
        _ms(4).alias("end_ms"),
        text.alias("text"),
    )
    return parsed.select(
        F.col("_id").alias(id_col),
        F.row_number()
        .over(Window.partitionBy("_id").orderBy("_seq"))
        .cast("long")
        .alias("cue_id"),
        "start_ms",
        "end_ms",
        "text",
    )


def cues_to_transcript(
    cues: DataFrame, id_col: str = "doc_id", gap_ms: int = 1000
) -> DataFrame:
    """Transcript assembly: cues in time order, a silence longer than
    ``gap_ms`` between consecutive cues opens a new paragraph (the
    subtitle analogue of the reference's blank-line paragraph logic);
    cue-internal line breaks flatten to spaces.  Returns ``(id, n_cues,
    n_paras, transcript)`` with paragraphs joined by blank lines.

    Two per-doc shuffles (window + rollup), both keyed by the doc id.
    """
    by_time = Window.partitionBy("_id").orderBy("start_ms", "cue_id")
    flat = cues.select(
        F.col(id_col).alias("_id"),
        "cue_id",
        "start_ms",
        "end_ms",
        F.regexp_replace("text", r"\r?\n", " ").alias("_flat"),
    )
    para = flat.withColumn(
        "_break",
        (
            F.col("start_ms")
            - F.lag("end_ms", 1, None).over(by_time)
            > gap_ms
        ).cast("long"),
    ).withColumn(
        "_para",
        F.sum(F.coalesce(F.col("_break"), F.lit(0))).over(
            by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paras = para.groupBy("_id", "_para").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("start_ms", "cue_id", F.col("_flat").alias("t"))
                    )
                ),
                lambda s: s["t"],
            ),
            " ",
        ).alias("_ptext"),
        F.count(F.lit(1)).alias("_n"),
    )
    return paras.groupBy("_id").agg(
        F.sum("_n").alias("n_cues"),
        F.count(F.lit(1)).alias("n_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_para", F.col("_ptext").alias("t")))
                ),
                lambda s: s["t"],
            ),
            "\n\n",
        ).alias("transcript"),
    ).select(
        F.col("_id").alias(id_col), "n_cues", "n_paras", "transcript"
    )
