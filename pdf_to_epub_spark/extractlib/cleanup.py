"""Stage 1 — boilerplate (running head/footer) removal.

Byte-parity reimplementation of the reference pipeline's first stage
(`/root/reference/text-processing/Step1_ocr_cleanup_v11.py`).  The pass
order and every regex are the contract:

* header/footer block removal     (reference Step1_ocr_cleanup_v11.py:65-192)
* in-word mojibake repair         (reference Step1_ocr_cleanup_v11.py:7-27)
* protected-heading preservation  (reference Step1_ocr_cleanup_v11.py:30-54)

All functions are pure ``str -> str`` (plus a counters dict) so they can be
driven from an Arrow-batched pandas UDF on executors.  None of them touch
the filesystem or wall clock.
"""

from __future__ import annotations

import re

# --------------------------------------------------------------------------
# Pass 1a: running-head / footer block removal
# (reference Step1_ocr_cleanup_v11.py:65-192)
# --------------------------------------------------------------------------

# Anchor vocabulary: a block must contain one of these to be considered.
_ANCHOR_VOLUME = re.compile(r"(?i)\bvolume\b")
_ANCHOR_SERIES = re.compile(r"(?i)\bhistory\s+of\s+my\s+life\b")
# Single-pass disjunction of the two anchors (same boolean outcome).
_ANCHOR_EITHER = re.compile(r"(?i)\bvolume\b|\bhistory\s+of\s+my\s+life\b")
_INLINE_CHAPTER = re.compile(r"(?i)\bchapter\b")

# Header-ish line shapes.
_BULLET_LINE = re.compile(r"^\s*[•·]\s*$")
_PUNCT_LINE = re.compile(r'^\s*[\.,;:!?—–\-\"“”„‟’\']+\s*$')
_QUOTE_LINE = re.compile(r'^\s*[\"\'“”„‟’]+\s*$')
_NUMERIC_LINE = re.compile(r"^\s*(?:\d{1,4}|[IVXLCDM]+)\.?\s*$")

# A real (protected) chapter heading, in strict ALL-CAPS form.
_ALLCAPS_CHAPTER = re.compile(r"^\s*CHAPTER\s+(?:[IVXLCDM]+|[A-Z0-9]+)\s*$")

# Case-insensitive chapter heading used to locate the *first* real heading,
# tolerating trailing superscript footnote marks.
_CHAPTER_ANYCASE = re.compile(
    r"^\s*chapter\s+[ivxlcdm]+[.¹²³⁰-⁹˚]*\s*$",
    re.IGNORECASE,
)

_LOWERCASE_LETTER = re.compile(r"[a-zà-öø-ÿ]")
_SENTENCE_SHAPE = re.compile(r"[A-Za-z].*[\.!?;:]\s*$")
_WORD = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ]+")


def normalize_newlines(text: str) -> str:
    """Universal-newline normalization: every reference CLI reads its
    input in text mode (Step1_ocr_cleanup_v11.py:201 `read_text(...)`), so
    \\r\\n and lone \\r become \\n BEFORE any pass runs.  The two-replace
    idiom is equivalent to Python's universal-newline decoding for every
    \\r / \\r\\n interleaving.  Shared by `run_stage1` and the legacy
    pipeline entry so the text-mode emulation lives in exactly one place."""
    if "\r" in text:
        text = text.replace("\r\n", "\n").replace("\r", "\n")
    return text


def first_protected_heading(lines: list[str]) -> int | None:
    """Index of the first case-insensitive ``chapter <roman>`` own-line."""
    for idx, raw in enumerate(lines):
        if _CHAPTER_ANYCASE.match(raw.strip()):
            return idx
    return None


def strip_running_heads(
    text: str, counters: dict, protect_chapter_heading: bool = True
) -> str:
    """Delete header/footer blocks anchored on Volume / series-title lines.

    Region growing is strictly sequential per document (grow, absorb up to
    three dangling punct/number lines, boundary body check, protected-heading
    split, overlap merge) — which is why the whole document rides inside one
    pandas-UDF row rather than being exploded into per-line Spark rows.

    ``protect_chapter_heading=False`` reproduces the legacy v10 behavior
    byte-for-byte (reference Step1_ocr_cleanup_v10.py is exactly v11 minus
    the protected-heading logic; `diff` confirms nothing else changed) —
    the T26-adjacent variant the SURVEY scoped as legacy.
    """
    # Casefold prescreen: `(?i)\bvolume\b` / `(?i)\bhistory\s+of\s+my\s+life\b`
    # can only match where the folded text contains the contiguous literal
    # "volume" / "history".  str.casefold alone is NOT sufficient for re's
    # IGNORECASE table: sre matches `i` against dotless ı (U+0131, folds to
    # itself) and dotted İ (U+0130, folds to "i"+U+0307, breaking
    # contiguity) — so fold those two back to plain "i".  With that, an
    # exhaustive sweep over all of Unicode shows every char sre-matches
    # against an anchor letter folds to exactly that letter; false
    # positives just fall through to the regex.  Neither replacement nor
    # casefold introduces/removes line breaks, so folded_lines below stays
    # 1:1 with lines.
    folded = text.casefold().replace("ı", "i").replace("̇", "")
    if "volume" not in folded and "history" not in folded:
        counters.setdefault("header_footer_blocks_removed", 0)
        return text

    lines = text.splitlines()
    n = len(lines)
    protected = (
        first_protected_heading(lines) if protect_chapter_heading else None
    )
    folded_lines = folded.splitlines()

    def headerish(idx: int) -> bool:
        if protected is not None and idx == protected:
            return False
        s = lines[idx].strip()
        if s == "":
            return True
        if _BULLET_LINE.match(s) or _PUNCT_LINE.match(s) or _QUOTE_LINE.match(s):
            return True
        if _NUMERIC_LINE.match(s):
            return True
        if _ANCHOR_EITHER.search(s):
            return True
        if _INLINE_CHAPTER.search(s) and not _ALLCAPS_CHAPTER.match(s):
            return True
        return False

    def bodyish(idx: int) -> bool:
        s = lines[idx].strip()
        if s == "":
            return False
        if _ALLCAPS_CHAPTER.match(s):
            return True
        if _LOWERCASE_LETTER.search(s):
            return True
        if _SENTENCE_SHAPE.search(s):
            return True
        return len(_WORD.findall(s)) >= 2

    ranges: list[tuple[int, int]] = []
    claimed: set[int] = set()

    for i in range(n):
        if i in claimed:
            continue
        # Same casefold prescreen, per line (memchr-speed `in` vs a
        # char-at-a-time alternation scan); casefold is char-wise so
        # folded_lines aligns 1:1 with lines.
        low = folded_lines[i]
        if "volume" not in low and "history" not in low:
            continue
        raw = lines[i]
        if not _ANCHOR_EITHER.search(raw):
            continue

        lo = i
        while (
            lo - 1 >= 0
            and (lo - 1 != protected)
            and headerish(lo - 1)
            and not _ALLCAPS_CHAPTER.match(lines[lo - 1].strip())
        ):
            lo -= 1
        hi = i
        while (
            hi + 1 < n
            and (hi + 1 != protected)
            and headerish(hi + 1)
            and not _ALLCAPS_CHAPTER.match(lines[hi + 1].strip())
        ):
            hi += 1

        # Absorb up to three dangling punct / numeric / quote lines on
        # either side of the grown block.
        k = lo - 1
        taken = 0
        while k >= 0 and taken < 3:
            s = lines[k].strip()
            if s and (k != protected) and (
                _NUMERIC_LINE.match(s) or _PUNCT_LINE.match(s) or _QUOTE_LINE.match(s)
            ):
                lo = k
                taken += 1
                k -= 1
                continue
            break
        k = hi + 1
        taken = 0
        while k < n and taken < 3:
            s = lines[k].strip()
            if s and (k != protected) and (
                _NUMERIC_LINE.match(s) or _PUNCT_LINE.match(s) or _QUOTE_LINE.match(s)
            ):
                hi = k
                taken += 1
                k += 1
                continue
            break

        # Boundary sanity: the block must touch a document edge or abut a
        # body line on at least one side (checked before the protect-split).
        lo_ok = (lo == 0) or (lo - 1 >= 0 and bodyish(lo - 1))
        hi_ok = (hi == n - 1) or (hi + 1 < n and bodyish(hi + 1))

        if protected is not None and lo <= protected <= hi:
            if protected - lo > hi - protected:
                lo = protected + 1
            else:
                hi = protected - 1

        if lo <= hi and (lo_ok or hi_ok):
            ranges.append((lo, hi))
            for k in range(lo, hi + 1):
                claimed.add(k)

    if not ranges:
        counters.setdefault("header_footer_blocks_removed", 0)
        return text

    ranges.sort()
    merged: list[tuple[int, int]] = []
    cur_lo, cur_hi = ranges[0]
    for lo, hi in ranges[1:]:
        if lo <= cur_hi + 1:
            cur_hi = max(cur_hi, hi)
        else:
            merged.append((cur_lo, cur_hi))
            cur_lo, cur_hi = lo, hi
    merged.append((cur_lo, cur_hi))

    doomed: set[int] = set()
    samples: list[str] = []
    for lo, hi in merged:
        doomed.update(range(lo, hi + 1))
        samples.append("\n".join(lines[lo : hi + 1])[:200])

    counters["header_footer_blocks_removed"] = len(merged)
    if protected is not None:
        counters["protected_first_chapter_idx"] = protected
    if samples:
        counters["header_footer_examples"] = samples[:5]
    return "\n".join(ln for idx, ln in enumerate(lines) if idx not in doomed)


# --------------------------------------------------------------------------
# Pass 1b: in-word UTF-8→Latin-1 mojibake repair
# (reference Step1_ocr_cleanup_v11.py:7-27)
# --------------------------------------------------------------------------

# Ordered replacement pairs, applied only inside word tokens.  NB: the
# second character of every key lies outside the token charset below, so at
# stage 1 this pass is effectively inert — that quirk is part of the
# contract and must not be "fixed" (the real mojibake sweep happens in
# stage 2, reference Step2_formatting_v14.py:327-342).
_STAGE1_MOJIBAKE: tuple[tuple[str, str], ...] = (
    ("Ã©", "é"), ("Ã¨", "è"), ("Ãª", "ê"), ("Ã«", "ë"),
    ("Ã ", "à"), ("Ã¢", "â"), ("Ã¤", "ä"),
    ("Ã¹", "ù"), ("Ã»", "û"), ("Ã¼", "ü"),
    ("Ã®", "î"), ("Ã¯", "ï"),
    ("Ã´", "ô"), ("Ã¶", "ö"),
    ("Ã‡", "Ç"), ("Ã§", "ç"),
    ("Ã‰", "É"), ("Ãˆ", "È"), ("ÃŠ", "Ê"), ("Ã‹", "Ë"),
    ("Ã€", "À"), ("Ã‚", "Â"), ("Ã„", "Ä"),
    ("Ã™", "Ù"), ("Ã›", "Û"), ("Ãœ", "Ü"),
    ("ÃŽ", "Î"), ("Ã", "Ï"),
    ("Ã”", "Ô"), ("Ã–", "Ö"),
)

_WORD_TOKEN = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ'’-]{2,}")
_WORD_TOKEN_WITH_MOJIBAKE = re.compile(
    r"[A-Za-zÀ-ÖØ-öø-ÿ'’-]*Ã[A-Za-zÀ-ÖØ-öø-ÿ'’-]*"
)


def repair_word_mojibake(text: str) -> str:
    """Apply the ordered mojibake pairs inside word tokens only.

    This pass is the identity on EVERY input, provably: a match of
    ``_WORD_TOKEN_WITH_MOJIBAKE`` consists solely of token-class chars
    (``A-Za-zÀ-ÖØ-öø-ÿ'’-``), and the second character of every
    ``_STAGE1_MOJIBAKE`` key (©¨ª« ¢¤¹»¼®¯´¶‡§‰ˆŠ‹€‚„™›œŽ U+008F ”–)
    lies outside that class — so no key can ever occur inside a matched
    token and the replace loop never fires.  The reference has the same
    quirk (see the table comment above); the pass is kept as an explicit
    no-op rather than deleted so the stage layout mirrors the reference,
    and :func:`_repair_word_mojibake_regex` preserves the literal form for
    the differential test in tests/test_fuzz_parity.py.
    """
    return text


def _repair_word_mojibake_regex(text: str) -> str:
    """The literal regex form of the pass (reference semantics verbatim);
    used only by the identity-proof differential test."""
    if "Ã" not in text:
        return text

    def mend(match: re.Match) -> str:
        token = match.group(0)
        for bad, good in _STAGE1_MOJIBAKE:
            token = token.replace(bad, good)
        return token

    return _WORD_TOKEN_WITH_MOJIBAKE.sub(mend, text)


# --------------------------------------------------------------------------
# Pass 1c: preservation rule
# (reference Step1_ocr_cleanup_v11.py:30-54)
# --------------------------------------------------------------------------

_CHAPTER_LINE_MULTI = re.compile(r"(?m)^\s*CHAPTER\s+(?:[IVXLCDM]+|[A-Z0-9]+)\s*$")
_VOLUME_LINE_MULTI = re.compile(r"(?m)^\s*Volume\s+\S.*$")


def _reinsert_at_top(text: str, line: str) -> str:
    lines = text.splitlines()
    i = 0
    while i < len(lines) and lines[i].strip() == "":
        i += 1
    lines[i:i] = ["", line, ""]
    return "\n".join(lines)


def reinstate_protected_lines(text: str, original_text: str) -> str:
    """If cleanup dropped the first ALL-CAPS chapter heading or the first
    ``Volume …`` line of the *original* document, put it back at the top."""
    m = _CHAPTER_LINE_MULTI.search(original_text)
    if m:
        heading = m.group(0).strip()
        if not re.search(r"(?m)^\s*" + re.escape(heading) + r"\s*$", text):
            text = _reinsert_at_top(text, heading)

    m = _VOLUME_LINE_MULTI.search(original_text)
    if m:
        vol = m.group(0).strip()
        if not re.search(r"(?m)^\s*" + re.escape(vol) + r"\s*$", text):
            text = _reinsert_at_top(text, vol)

    return text


# --------------------------------------------------------------------------
# Stage driver
# --------------------------------------------------------------------------

def run_stage1(
    text: str,
    counters: dict | None = None,
    protect_chapter_heading: bool = True,
) -> str:
    """Full stage 1 in reference order (Step1_ocr_cleanup_v11.py:204-207).

    ``protect_chapter_heading=False`` is the legacy v10 pipeline
    byte-for-byte (same pass order; Step1_ocr_cleanup_v10.py:185-187 —
    v10 differs from v11 only by the protected-heading logic)."""
    if counters is None:
        counters = {}
    # Normalize BEFORE `original` is captured: the reference's reinstate
    # compares against the post-read (already normalized) text.  Without
    # this, a \r surviving into strip_running_heads changes which
    # anchor/absorb rules fire and the reinserted block keeps raw CRs.
    text = normalize_newlines(text)
    original = text
    text = strip_running_heads(text, counters, protect_chapter_heading)
    text = repair_word_mojibake(text)
    text = reinstate_protected_lines(text, original)
    return text
