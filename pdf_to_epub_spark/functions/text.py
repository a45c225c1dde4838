"""Column-level text predicates and transforms (the SQL-expressible subset).

These mirror the reference's line classifiers (F1/F2,
`/root/reference/text-processing/Step1_ocr_cleanup_v11.py:86-113`) and trim
ops as pure Catalyst expressions, for use in declarative queries over
exploded line rows.  The byte-parity pipeline itself runs the Python
originals inside the extraction UDF — these exist for the relational
surface (filters, classification aggregates) where whole-stage codegen
matters more than byte parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_blank(line: Column) -> Column:
    return F.trim(line) == ""


def is_bullet_line(line: Column) -> Column:
    return line.rlike(r"^\s*[•·]\s*$")


def is_punct_only_line(line: Column) -> Column:
    return line.rlike(r'^\s*[\.,;:!?—–\-"“”„‟’\']+\s*$')


def is_numeric_only_line(line: Column) -> Column:
    """Bare page number: arabic ≤4 digits or roman numeral."""
    return line.rlike(r"^\s*(?:\d{1,4}|[IVXLCDM]+)\.?\s*$")


def is_allcaps_chapter_heading(line: Column) -> Column:
    return line.rlike(r"^\s*CHAPTER\s+(?:[IVXLCDM]+|[A-Z0-9]+)\s*$")


def is_headerish(line: Column) -> Column:
    """F1 composite: the running-head vocabulary."""
    anchor = line.rlike(r"(?i)\bvolume\b") | line.rlike(r"(?i)\bhistory\s+of\s+my\s+life\b")
    chapterish = line.rlike(r"(?i)\bchapter\b") & ~is_allcaps_chapter_heading(line)
    return (
        is_blank(line)
        | is_bullet_line(line)
        | is_punct_only_line(line)
        | is_numeric_only_line(line)
        | anchor
        | chapterish
    )


def is_body_line(line: Column) -> Column:
    """F2: real prose — heading, lowercase letters, sentence shape, or
    ≥2 word tokens."""
    two_words = line.rlike(
        r"[A-Za-zÀ-ÖØ-öø-ÿ]+[^A-Za-zÀ-ÖØ-öø-ÿ]+[A-Za-zÀ-ÖØ-öø-ÿ]+"
    )
    return (
        ~is_blank(line)
        & (
            is_allcaps_chapter_heading(line)
            | line.rlike(r"[a-zà-öø-ÿ]")
            | line.rlike(r"[A-Za-z].*[\.!?;:]\s*$")
            | two_words
        )
    )


def trim_leading_whitespace(text: Column) -> Column:
    """S9 anchored trim as an expression."""
    return F.regexp_replace(text, r"^\s+", "")


def sanitize_control_chars(text: Column) -> Column:
    """F6/T27 control-char strip (reference Step4_epub_v10.py:12-16)."""
    return F.regexp_replace(text, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
