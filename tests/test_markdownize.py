"""Stage-4 text-side functions (T27-T33 in SURVEY §2.8) — pure Python."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib.markdownize import (  # noqa: E402
    chapters_to_h2,
    extract_volume_line,
    html_escape,
    insert_pagebreak_divs,
    normalize_hr,
    reflow_paragraphs_conservatively,
    sanitize_control_chars,
    title_page,
    to_epub_markdown,
)


def test_sanitize_control_chars():
    assert sanitize_control_chars("a\x00b\x0bc\nd\te\x7ff") == "abc\nd\tef"


def test_extract_volume_line():
    text, vol = extract_volume_line("\nVOLUME IV\n\nbody starts here\n")
    assert vol == "Volume IV"
    assert text == "\nbody starts here\n".lstrip("\n") or text.startswith("body") or "body starts here" in text
    text2, vol2 = extract_volume_line("no volume here\n")
    assert vol2 is None and text2 == "no volume here\n"


def test_chapters_to_h2_and_hr():
    md = chapters_to_h2("intro\nCHAPTER IV\nbody")
    assert "## CHAPTER IV" in md
    hr = normalize_hr("para\n---\npara2")
    assert "<hr />" in hr and "\n\n\n" not in hr


def test_reflow_conservative_skips_markdown():
    md = "## CHAPTER I\n\nline one\nline two\n\n<hr />\n\n- bullet\nitem"
    out = reflow_paragraphs_conservatively(md)
    blocks = out.split("\n\n")
    assert blocks[0] == "## CHAPTER I"
    assert blocks[1] == "line one line two"
    assert blocks[2] == "<hr />"
    assert blocks[3].startswith("- bullet")  # markdown construct untouched


def test_pagebreak_divs_before_chapters_2_to_n():
    md = "## CHAPTER I\n\nbody\n\n## CHAPTER II\n\nbody\n\n## CHAPTER III\n\nend"
    out, n = insert_pagebreak_divs(md)
    assert n == 2
    assert out.count('page-break-before') == 2
    assert out.index("## CHAPTER I") < out.index("page-break-before")


def test_title_page_and_escape():
    tp = title_page("My Title", "Volume 2", "Author", "Trans")
    assert '<p class="book-title">My Title</p>' in tp
    assert '<p class="volume-label">Volume 2</p>' in tp
    assert html_escape("a<b>&c") == "a&lt;b&gt;&amp;c"


def test_to_epub_markdown_end_to_end():
    stage3 = (
        "VOLUME 3\n\n\f\nCHAPTER I\n\n\n---\nTHE START of it all.\n\n"
        "A paragraph\nwith a soft break.\n\n\f\nCHAPTER II\n\nMore body.\n"
    )
    md, vol = to_epub_markdown(stage3, title="T", author="A", translator="Tr")
    assert vol == "Volume 3"
    assert md.count("## CHAPTER") == 2
    assert "<hr />" in md
    assert "A paragraph with a soft break." in md
    assert md.startswith('<p class="book-title">T</p>')


def test_fix_single_letter_glitches_reference_parity():
    """Fixtures captured by executing the reference v8 function directly
    (Step4_epub_v8.py:38-44) during golden generation — byte parity on
    every shape: bare I/A before the hr, quoted variants, letter after the
    hr, and the two no-op guards (already-correct text, lowercase tail)."""
    from pdf_to_epub_spark.extractlib.markdownize import fix_single_letter_glitches

    cases = [
        ("prose ends I\n<hr />\nWALKED ON and more",
         "prose ends\n\n<hr />\n\nI WALKED ON and more", 1),
        ('she said "I\n<hr />\nCAME BACK later',
         'she said "\n\n<hr />\n\nI CAME BACK later', 1),
        ("<hr />\nA\nSUPPER AT THE inn",
         "\n\n<hr />\n\nA SUPPER AT THE inn", 1),
        ('<hr />\n"I\nNEVER SAW him again',
         '\n\n<hr />\n\n"I NEVER SAW him again', 1),
        ("no glitch here\n\n<hr />\n\nNORMAL OPENER text",
         "no glitch here\n\n<hr />\n\nNORMAL OPENER text", 0),
        ("A\n<hr />\nlowercase not matched",
         "A\n\n<hr />\n\nlowercase not matched", 0),
    ]
    for raw, expected, n in cases:
        got, fixes = fix_single_letter_glitches(raw)
        assert got == expected, repr(raw)
        assert fixes == n, repr(raw)
