"""Stage 4 (text side) — markdown/EPUB-shaped document finishing.

Reimplements the string-level functions of the reference's EPUB builder
(`/root/reference/text-processing/Step4_epub_v10.py`); the pandoc/zip binary
assembly itself is a local export concern, not part of the distributed
query.  Covered here:

* control-char sanitize            (reference Step4_epub_v10.py:12-16)
* leading VOLUME line extraction   (reference :78-92)
* chapter headings → markdown h2   (reference :18-20)
* ``---`` → ``<hr />`` + spacing   (reference :22-27)
* conservative paragraph reflow    (reference :29-37)
* CSS page-break divs              (reference :39-45)
* title-page front matter          (reference :47-51)
* legacy HTML escaping             (reference legacy/Step4_create_epub.py:7-8)
"""

from __future__ import annotations

import re

_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_CHAPTER_BLOCK = re.compile(r"\nCHAPTER\s+([IVXLCDM]+)\s*\n")
_HR_LINE = re.compile(r"(?m)^\s*---\s*$")
_HR_TAG = re.compile(r"\s*(<hr\s*/?>)\s*", re.IGNORECASE)
_BLANK_RUN = re.compile(r"\n{3,}")
_H2_CHAPTER = re.compile(r"^## CHAPTER [IVXLCDM]+", re.MULTILINE)
_VOLUME_LINE = re.compile(r"^\s*VOLUME\s+([0-9IVXLCDM]+)\s*$", re.IGNORECASE)
_INNER_NEWLINES = re.compile(r"\s*\n\s*")

PAGE_BREAK_DIV = '<div style="page-break-before: always"></div>'


def sanitize_control_chars(text: str) -> str:
    """Strip control chars except newline/tab (reference :12-16)."""
    return _CONTROL_CHARS.sub("", text)


def extract_volume_line(text: str) -> tuple[str, str | None]:
    """Pop a leading ``VOLUME <N>`` line; return (text, 'Volume N' | None)."""
    lines = text.splitlines()
    i = 0
    while i < len(lines) and lines[i].strip() == "":
        i += 1
    if i < len(lines):
        m = _VOLUME_LINE.match(lines[i].strip())
        if m:
            num = m.group(1)
            del lines[i]
            if i < len(lines) and lines[i].strip() == "":
                del lines[i]
            return "\n".join(lines), f"Volume {num}"
    return text, None


def chapters_to_h2(text: str) -> str:
    """``\\nCHAPTER <R>\\n`` → markdown ``## CHAPTER <R>`` (reference :18-20)."""
    return _CHAPTER_BLOCK.sub(lambda m: f"\n\n## CHAPTER {m.group(1)}\n\n", text)


def normalize_hr(text: str) -> str:
    text = _HR_LINE.sub(lambda m: "\n\n<hr />\n\n", text)
    text = _HR_TAG.sub(r"\n\n\1\n\n", text)
    return _BLANK_RUN.sub("\n\n", text)


def reflow_paragraphs_conservatively(md: str) -> str:
    """Join intra-block newlines to spaces, skipping headings/hr/markdown
    constructs (reference :29-37)."""
    blocks = md.split("\n\n")
    out = []
    for b in blocks:
        bs = b.strip("\n")
        if (
            not bs
            or bs.startswith("## CHAPTER")
            or bs == "<hr />"
            or bs.startswith(("# ", "```", "> ", "- ", "* ", "1. "))
            or "```" in bs
        ):
            out.append(bs)
            continue
        out.append(_INNER_NEWLINES.sub(" ", bs).strip())
    return "\n\n".join(out) + ("\n" if md.endswith("\n") else "")


def insert_pagebreak_divs(md: str) -> tuple[str, int]:
    """CSS page-break div before chapters 2..n (reference :39-45)."""
    heads = list(_H2_CHAPTER.finditer(md))
    if len(heads) <= 1:
        return md, 0
    for m in reversed(heads[1:]):
        md = md[: m.start()] + f"\n\n{PAGE_BREAK_DIV}\n\n" + md[m.start() :]
    return md, len(heads) - 1


def title_page(title: str, volume: str | None, author: str, translator: str) -> str:
    """Front-matter paragraphs (not headings, so they stay out of the TOC;
    reference :47-51)."""
    title_html = f'<p class="book-title">{title}</p>\n\n' if title else ""
    vol_html = f'<p class="volume-label">{volume}</p>\n\n' if volume else ""
    return f"{title_html}{vol_html}**{author}**  \\\n_{translator}_\n\n<hr />\n\n"


def html_escape(s: str) -> str:
    """Minimal &<> escaping (reference legacy/Step4_create_epub.py:7-8)."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def to_epub_markdown(
    stage3_text: str,
    title: str = "",
    author: str = "",
    translator: str = "",
    volume: str = "",
) -> tuple[str, str | None]:
    """Full Step-4 text path (reference :185-201): sanitize → pop volume →
    h2 headings → hr normalize → conservative reflow → page-break divs →
    optional title page.  Returns (markdown, volume_label)."""
    txt = sanitize_control_chars(stage3_text)
    txt, vol_found = extract_volume_line(txt)
    volume_label = volume or vol_found or ""
    md = chapters_to_h2(txt)
    md = normalize_hr(md)
    md = reflow_paragraphs_conservatively(md)
    md, _ = insert_pagebreak_divs(md)
    if title or author or translator or volume_label:
        md = title_page(title, volume_label or None, author, translator) + md
    return md, (volume_label or None)


# -- legacy v8 glitch fixer ---------------------------------------------------

_GLITCH_1 = re.compile(r"(\b[IA])\s*\n+\s*<hr\s*/>\s*\n+\s*([A-Z]{2,}\b)")
_GLITCH_2 = re.compile(r"([\"“”])\s*(\b[IA])\s*\n+\s*<hr\s*/>\s*\n+\s*([A-Z]{2,}\b)")
_GLITCH_3 = re.compile(r"<hr\s*/>\s*\n+([\"“”]?\b[IA])\s*\n+([A-Z]{2,}\b)")
_HR_RESPACE = re.compile(r"\s*(<hr\s*/>)\s*")


def fix_single_letter_glitches(md: str) -> tuple[str, int]:
    """Legacy chapter-opener glitch repair (T26 variant; reference
    `/root/reference/text-processing/legacy/Step4_epub_v8.py:38-44`): an
    OCR column break can strand the single-letter first word ("I"/"A") of
    an all-caps chapter opener on the wrong side of an ``<hr />`` page
    marker; reattach it in the reference's exact pattern order and
    renormalize hr spacing.  Returns (fixed_md, n_fixes)."""
    fixes = 0
    md, c1 = _GLITCH_1.subn(r"\n\n<hr />\n\n\1 \2", md)
    fixes += c1
    md, c2 = _GLITCH_2.subn(r"\n\n<hr />\n\n\1\2 \3", md)
    fixes += c2
    md, c3 = _GLITCH_3.subn(r"<hr />\n\n\1 \2", md)
    fixes += c3
    md = _HR_RESPACE.sub(r"\n\n\1\n\n", md)
    md = _BLANK_RUN.sub("\n\n", md)
    return md, fixes
