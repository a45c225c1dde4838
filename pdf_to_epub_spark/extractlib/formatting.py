"""Stage 2 — formatting, reflow and dialogue normalization.

Byte-parity reimplementation of the reference pipeline's second stage
(`/root/reference/text-processing/Step2_formatting_v14.py`).  Twenty ordered
passes; the order is load-bearing (e.g. the bare ``â`` → ``"`` pre-pass feeds
the dialogue-quote rules).  Every function is pure ``(str, counters) -> str``.
Counter keys mirror the reference JSON logs for metric parity.
"""

from __future__ import annotations

import functools
import re
import string

# --------------------------------------------------------------------------
# Replacement tables (reference Step2_formatting_v14.py:327-344).
# Held as ordered pair tuples because ordering matters: e.g. "Ã‚"→"Â" runs
# before the bare "Â"→"" delete, so a fixed "Ã‚" is subsequently removed.
# --------------------------------------------------------------------------

MOJIBAKE_PAIRS: tuple[tuple[str, str], ...] = (
    # lowercase
    ("Ã ", "à"), ("Ã¢", "â"), ("Ã¤", "ä"), ("Ã¦", "æ"), ("Ã§", "ç"),
    ("Ã©", "é"), ("Ã¨", "è"), ("Ãª", "ê"), ("Ã«", "ë"),
    ("Ã¯", "ï"), ("Ã®", "î"), ("Ã´", "ô"), ("Ã¶", "ö"),
    ("Ã¹", "ù"), ("Ãº", "ú"), ("Ã»", "û"), ("Ã¼", "ü"), ("Å“", "œ"),
    # uppercase
    ("Ã€", "À"), ("Ã‚", "Â"), ("Ã„", "Ä"), ("Ã†", "Æ"), ("Ã‡", "Ç"),
    ("Ã‰", "É"), ("Ãˆ", "È"), ("ÃŠ", "Ê"), ("Ã‹", "Ë"),
    # NB: "Ã" + U+FFFD appears twice in the reference dict literal (values
    # "Í" then "Ï"); dict semantics keep first position / last value, so the
    # effective pair is a single "Ã�" → "Ï" at this slot.
    ("Ã�", "Ï"), ("ÃŽ", "Î"),
    ("Ã”", "Ô"), ("Ã–", "Ö"), ("Ã™", "Ù"), ("Ãš", "Ú"), ("Ã›", "Û"),
    ("Ãœ", "Ü"), ("Å’", "Œ"),
    # common stray
    ("Â«", "«"), ("Â»", "»"), ("Â·", "·"), ("Â°", "°"), ("Â", ""),
)

PROPER_NOUN_PAIRS: tuple[tuple[str, str], ...] = (
    ("d'UrfÃ©", "d'Urfé"), ("UrfÃ©", "Urfé"),
    ("SociÃ©tÃ©", "Société"), ("ASSOCIÃ‰S", "ASSOCIÉS"),
    ("ChambÃ©ry", "Chambéry"),
)

ARTIFACT_TOKENS: tuple[str, ...] = (
    "â€¢", "â€", "Â¤", "Â¸", "Â·", "Â«", "Â»", "Â",
)

QUOTE_SHAPES: tuple[tuple[str, str], ...] = (
    ("“", '"'), ("”", '"'), ("„", '"'), ("‟", '"'), ("〝", '"'), ("〞", '"'),
    ("«", '"'), ("»", '"'), ("‹", '"'), ("›", '"'), ("＂", '"'), ("❝", '"'),
    ("❞", '"'),
)

DEFAULT_MONEY_TERMS: frozenset[str] = frozenset({
    "ducat", "ducats", "louis", "louis-dor", "louis d’or", "zecchini",
    "zecchino", "zecchins", "pistole", "pistoles", "crown", "crowns",
    "guinea", "guineas", "florin", "florins", "livre", "livres", "franc",
    "francs", "dollar", "dollars", "pound", "pounds", "sequins", "sequin",
    "escudo", "escudos", "peso", "pesos", "real", "reals", "reales",
    "maravedi", "maravedis", "écu", "écus", "taler", "talers", "thaler",
    "thalers", "sou", "sous",
})


# --------------------------------------------------------------------------
# Literal-anchored fast paths.  Python's re scans character-by-character; the
# hot full-text patterns below are all anchored on a rare literal substring
# ("\n\n\n", "-\n", "  ", punctuation), so a str.find loop (memchr-speed)
# plus slice rebuilding is 5-15x faster at byte-identical output.  Each
# helper documents the exact pattern it replaces; equivalence is pinned by
# tests/test_parity.py goldens, the reference-CLI differential fuzz suite,
# and test_fastpath_differential in tests/test_fuzz_parity.py (random +
# corpus inputs compared against the original regex form).
# --------------------------------------------------------------------------

_ASCII_LETTERS = frozenset(string.ascii_letters)
_WS_PROBE = re.compile(r"\s")
# re's unicode \s class is a fixed, small set of codepoints (29 chars, all
# in the BMP: \t-\r, \x1c-\x1f, space, NEL, NBSP, plus category Zs and the
# two Z[lp] separators — an all-of-Unicode sweep confirms nothing above
# U+3000 matches).  Precompute it once (~20 ms) instead of memoizing per
# input char: an unbounded lru_cache keyed on corpus characters grows with
# every distinct codepoint a long-lived executor ever sees.
_WS_CHARS = frozenset(
    chr(cp) for cp in range(0x10000) if _WS_PROBE.match(chr(cp))
)


def _is_ws(ch: str) -> bool:
    """Exactly re's ``\\s`` membership for one char (unicode semantics)."""
    return ch in _WS_CHARS


def _collapse_blank_runs(text: str) -> str:
    """== _BLANK_RUN.sub("\\n\\n", text)  (r"\\n{3,}" -> two newlines)."""
    i = text.find("\n\n\n")
    if i == -1:
        return text
    out = []
    pos = 0
    n = len(text)
    while i != -1:
        j = i + 3
        while j < n and text[j] == "\n":
            j += 1
        out.append(text[pos:i])
        out.append("\n\n")
        pos = j
        i = text.find("\n\n\n", pos)
    out.append(text[pos:])
    return "".join(out)


def _dehyphenate_wraps(text: str) -> str:
    """== _HYPHEN_WRAP.sub(_join_hyphen_wrap, text): ASCII letter, "-",
    newline, ASCII letter; the newline always goes, the hyphen only when the
    tail letter is lowercase.  Non-overlapping left-to-right consumption is
    replicated with the ``pos`` cursor (a consumed tail letter cannot serve
    as the next match's head — "a-\\nb-\\nc" -> "ab-\\nc")."""
    i = text.find("-\n")
    if i == -1:
        return text
    out = []
    pos = 0
    n = len(text)
    while i != -1:
        h = i - 1
        if (
            h >= pos
            and text[h] in _ASCII_LETTERS
            and i + 2 < n
            and text[i + 2] in _ASCII_LETTERS
        ):
            tail = text[i + 2]
            out.append(text[pos:i])
            if tail.islower():
                out.append(tail)
            else:
                out.append("-")
                out.append(tail)
            pos = i + 3
            i = text.find("-\n", pos)
        else:
            i = text.find("-\n", i + 1)
    out.append(text[pos:])
    return "".join(out)


def _collapse_space_runs(text: str) -> str:
    """== _SPACE_RUN.sub(" ", text)  (r"[ \\t]{2,}" -> one space).  Tabs are
    rare by this point; any tab routes to the regex so mixed runs keep the
    exact class semantics."""
    if "\t" in text:
        return _SPACE_RUN.sub(" ", text)
    i = text.find("  ")
    if i == -1:
        return text
    out = []
    pos = 0
    n = len(text)
    while i != -1:
        j = i + 2
        while j < n and text[j] == " ":
            j += 1
        out.append(text[pos:i])
        out.append(" ")
        pos = j
        i = text.find("  ", pos)
    out.append(text[pos:])
    return "".join(out)


_PUNCT_AFTER_WS = (",", ".", ";", ":", "?", "!")


def _strip_space_before_punct(text: str) -> str:
    """== _SPACE_BEFORE_PUNCT.sub(r"\\1", text)  (r"\\s+([,.;:?!])" -> the
    punctuation char).  Candidate punctuation positions come from memchr
    scans; whitespace runs never contain punctuation, so match spans are
    disjoint and original-text candidates are exact."""
    hits = []
    for p in _PUNCT_AFTER_WS:
        i = text.find(p)
        while i != -1:
            if i > 0 and _is_ws(text[i - 1]):
                hits.append(i)
            i = text.find(p, i + 1)
    if not hits:
        return text
    hits.sort()
    out = []
    pos = 0
    for i in hits:
        q = i - 1
        while q > 0 and _is_ws(text[q - 1]):
            q -= 1
        out.append(text[pos:q])
        out.append(text[i])
        pos = i + 1
    out.append(text[pos:])
    return "".join(out)


_MID_G1_EXCLUDED = frozenset('.!?;:)"\n')
_MID_G2_LOWER = frozenset(
    "abcdefghijklmnopqrstuvwxyz"
    + "".join(chr(c) for c in range(0xE0, 0xF7))   # à-ö
    + "".join(chr(c) for c in range(0xF8, 0x100))  # ø-ÿ
)


def _collapse_midsentence(text: str) -> tuple[str, int]:
    """== _MID_SENTENCE_BREAK.subn(r"\\1 \\2", text) for
    r'([^\\.!\\?;:)"\\n])\\s*\\n\\n\\s*([a-zà-öø-ÿ])'.  A match is a maximal
    whitespace run containing an adjacent newline pair, where group 1 is the
    leftmost unconsumed candidate — the char before the run if it is not in
    the excluded class, else the leftmost non-newline whitespace char inside
    the run that still has an adjacent pair after it — and group 2 is the
    first non-whitespace char after the run (must be lowercase latin).
    Replacement is g1 + " " + g2; scanning resumes after g2 (the consumed
    g2 cannot head the next match).  Every branch is pinned against the
    regex by the differential test."""
    k = text.find("\n\n")
    if k == -1:
        return text, 0
    out = []
    pos = 0       # emitted-through cursor
    resume = 0    # regex scan-resume floor for group-1 candidates
    n = len(text)
    count = 0
    while k != -1:
        # maximal whitespace run [a, b) around this adjacent pair
        a = k
        while a > 0 and _is_ws(text[a - 1]):
            a -= 1
        b = k + 2
        while b < n and _is_ws(text[b]):
            b += 1
        if b >= n or text[b] not in _MID_G2_LOWER:
            k = text.find("\n\n", b + 1)
            continue
        # last adjacent pair inside the run bounds group-1 candidates
        q_last = text.rfind("\n\n", a, b)
        p = -1
        g1 = a - 1
        if g1 >= resume and g1 >= 0 and text[g1] not in _MID_G1_EXCLUDED:
            p = g1
        else:
            j = max(a, resume)
            while j < q_last:
                c = text[j]
                if c != "\n" and _is_ws(c):
                    p = j
                    break
                j += 1
        if p == -1:
            # every pair in this run yields the same (a, b, q_last) → same
            # failure; skip to the next run
            k = text.find("\n\n", b + 1)
            continue
        out.append(text[pos:p])
        out.append(text[p])
        out.append(" ")
        out.append(text[b])
        pos = b + 1
        resume = b + 1
        count += 1
        k = text.find("\n\n", b + 1)
    out.append(text[pos:])
    return "".join(out), count


# --------------------------------------------------------------------------
# Pass 2.0 — mojibake pre-pass (reference Step2_formatting_v14.py:514-517)
# --------------------------------------------------------------------------

def bare_mojibake_prepass(text: str, counters: dict) -> str:
    """Delete ``â``+U+0080+``¢`` bullet mojibake, then turn ``â``+U+0080
    into a straight double quote so the dialogue passes can see it.  Runs
    before anything else.  NB: the second char of both keys is the
    *invisible* control char U+0080 (double-mojibake), not U+20AC — the
    visible ``â€¢`` artifact is handled later by the artifact sweep."""
    text = text.replace("â¢", "")
    return text.replace("â", '"')


# --------------------------------------------------------------------------
# Pass 2.1 — mojibake maps, artifact sweep, quote normalization
# (reference Step2_formatting_v14.py:346-373)
# --------------------------------------------------------------------------

_MULTI_DQUOTE = re.compile(r'"{2,}')


def sweep_mojibake_and_artifacts(text: str, counters: dict) -> str:
    by_noun: dict[str, int] = {}
    by_pair: dict[str, int] = {}
    by_artifact: dict[str, int] = {}
    # Byte-safe prechecks: counting an absent token yields 0 and the
    # reference logs only nonzero counts, so skipping a key family whose
    # lead char is absent is the identity.  Lead-char presence is
    # recomputed between families because earlier replacements can CREATE
    # later leads (e.g. "Ã‚" → "Â", "Ã¢" → "â").
    if "Ã" in text:
        for bad, good in PROPER_NOUN_PAIRS:
            c = text.count(bad)
            if c:
                text = text.replace(bad, good)
                by_noun[bad] = c
        for bad, good in MOJIBAKE_PAIRS:
            c = text.count(bad)
            if c:
                text = text.replace(bad, good)
                by_pair[bad] = c
    elif "Â" in text or "Å" in text:
        for bad, good in MOJIBAKE_PAIRS:
            if bad[0] == "Ã":
                continue
            c = text.count(bad)
            if c:
                text = text.replace(bad, good)
                by_pair[bad] = c
    if "â" in text or "Â" in text:
        for token in ARTIFACT_TOKENS:
            c = text.count(token)
            if c:
                text = text.replace(token, "")
                by_artifact[token] = c
    shapes = 0
    if not text.isascii():
        for shape, straight in QUOTE_SHAPES:
            c = text.count(shape)
            if c:
                text = text.replace(shape, straight)
                shapes += c
    if '""' in text:  # pattern requires two adjacent double quotes
        text, collapsed = _MULTI_DQUOTE.subn('"', text)
    else:
        collapsed = 0
    counters["french_fixes"] = {"specific": by_noun, "mojibake": by_pair}
    counters["artifacts_removed"] = by_artifact
    counters["quotes_normalized"] = {
        "variants_to_double": shapes,
        "double_quotes_collapsed": collapsed,
    }
    return text


# --------------------------------------------------------------------------
# Pass 2.2 — reflow: join soft line breaks, safe dehyphenation
# (reference Step2_formatting_v14.py:375-400)
# --------------------------------------------------------------------------

_HYPHEN_WRAP = re.compile(r"([A-Za-z])-(?:\n)([A-Za-z])")
_SPACE_RUN = re.compile(r"[ \t]{2,}")
_SPACE_BEFORE_PUNCT = re.compile(r"\s+([,.;:?!])")
_MISSING_SPACE_AFTER_STOP = re.compile(r"([.!?])([A-Za-z])")
_BLANK_RUN = re.compile(r"\n{3,}")

_PARA_SENTINEL = "<<<P>>>"
_PBRK_SENTINEL = "<<<PBRK>>>"


def _join_hyphen_wrap(m: re.Match) -> str:
    head, tail = m.group(1), m.group(2)
    if tail and tail[0].isalpha() and tail[0].islower():
        return head + tail
    return head + "-" + tail


def reflow_soft_breaks(text: str, counters: dict) -> str:
    text = text.replace("\r\n", "\n")
    text = _collapse_blank_runs(text)
    text = text.replace("\n\n", _PARA_SENTINEL)
    text = _dehyphenate_wraps(text)
    text = text.replace("­\n", "")
    singles = text.count("\n")
    text = text.replace("\n", " ")
    text = text.replace(_PARA_SENTINEL, "\n\n")
    text = _collapse_space_runs(text)
    text = _strip_space_before_punct(text)
    text = _MISSING_SPACE_AFTER_STOP.sub(r"\1 \2", text)
    counters["reflow"] = {"single_newlines_joined": singles}
    return text


# --------------------------------------------------------------------------
# Pass 2.3 — dialogue paragraphing (reference Step2_formatting_v14.py:402-429)
# --------------------------------------------------------------------------

_QUOTE_THEN_QUOTE = re.compile(r'(")([^"]*?)(")\s+(")')
_STOP_THEN_QUOTE = re.compile(r'([.!?])\s+(")')
_QUOTE_THEN_NARRATION = re.compile(r'("([^"]*[.!?])")\s+([A-ZÀ-Ö])')


def break_dialogue_paragraphs(text: str, counters: dict) -> str:
    text = text.replace("\r\n", "\n")
    text = _collapse_blank_runs(text)
    text = text.replace("\n\n", _PBRK_SENTINEL)
    if '"' in text:  # all three patterns require a double quote
        text, n_pairs = _QUOTE_THEN_QUOTE.subn(r'\1\2"\n\n"', text)
        text, n_stop = _STOP_THEN_QUOTE.subn(r"\1\n\n\2", text)
        text, n_narr = _QUOTE_THEN_NARRATION.subn(r"\1\n\n\3", text)
    else:
        n_pairs = n_stop = n_narr = 0
    text = text.replace(_PBRK_SENTINEL, "\n\n")
    text = _collapse_blank_runs(text)
    counters["dialogue_paragraphing"] = {
        "between_quotes": n_pairs,
        "before_leading_quote": n_stop,
        "after_quote_to_narration": n_narr,
    }
    return text


# --------------------------------------------------------------------------
# Pass 2.4 — merge residual single newlines
# (reference Step2_formatting_v14.py:431-444)
# --------------------------------------------------------------------------

_SOFT_PARA = re.compile(r"\n\s*\n")


def merge_residual_newlines(text: str, counters: dict) -> str:
    text = text.replace("\r\n", "\n")
    text = _collapse_blank_runs(text)
    text = _SOFT_PARA.sub(_PBRK_SENTINEL, text)
    singles = text.count("\n")
    text = text.replace("\n", " ")
    text = text.replace(_PBRK_SENTINEL, "\n\n")
    text = _collapse_space_runs(text)
    text = _strip_space_before_punct(text)
    text = _MISSING_SPACE_AFTER_STOP.sub(r"\1 \2", text)
    counters["single_newlines_merge"] = {"singles_removed": singles}
    return text


# --------------------------------------------------------------------------
# Pass 2.5 — collapse mid-sentence paragraph breaks
# (reference Step2_formatting_v14.py:447-453)
# --------------------------------------------------------------------------

_MID_SENTENCE_BREAK = re.compile(r'([^\.!\?;:)"\n])\s*\n\n\s*([a-zà-öø-ÿ])')


def collapse_midsentence_breaks(text: str, counters: dict) -> str:
    text, n = _collapse_midsentence(text)
    counters["mid_sentence_breaks_collapsed"] = n
    return text


# --------------------------------------------------------------------------
# Pass 2.6 — lone quote line fixer (reference Step2_formatting_v14.py:455-478)
# --------------------------------------------------------------------------

def resolve_lone_quote_lines(text: str, counters: dict) -> str:
    lines = text.splitlines()
    removed = appended = 0
    i = 1
    while i < len(lines) - 1:
        if (
            lines[i].strip() == '"'
            and lines[i - 1].strip() == ""
            and lines[i + 1].strip() == ""
        ):
            j = i - 2
            while j >= 0 and lines[j].strip() == "":
                j -= 1
            if j >= 0:
                if lines[j].rstrip().endswith('"'):
                    del lines[i]
                    removed += 1
                    continue
                lines[j] = lines[j] + '"'
                del lines[i]
                appended += 1
                continue
            del lines[i]
            removed += 1
            continue
        i += 1
    text = "\n".join(lines)
    text = _collapse_blank_runs(text)
    counters["lone_quote_lines"] = {"removed": removed, "appended_to_above": appended}
    return text


# --------------------------------------------------------------------------
# Pass 2.7 — stray leading quote before a real opening quote
# (reference Step2_formatting_v14.py:282-321)
# --------------------------------------------------------------------------

_STRAY_THEN_OPEN = re.compile(r'^\s*"\s+([“"])(.*)$')


def close_prev_and_drop_stray_quote(text: str, counters: dict) -> str:
    lines = text.splitlines()
    fixed = 0

    def prev_nonempty(i: int) -> int:
        p = i - 1
        while p >= 0 and lines[p].strip() == "":
            p -= 1
        return p

    for i in range(len(lines)):
        m = _STRAY_THEN_OPEN.match(lines[i])
        if not m:
            continue
        p = prev_nonempty(i)
        if p >= 0:
            closing = "”" if lines[p].lstrip().startswith("“") else '"'
            if not lines[p].rstrip().endswith(("”", '"')):
                lines[p] = lines[p].rstrip() + closing
            lines[i] = m.group(1) + m.group(2)
            fixed += 1
    if fixed:
        counters["leading_quote_space_fixed"] = fixed
    return "\n".join(lines)


# --------------------------------------------------------------------------
# Pass 2.8 — stray leading quote before narration
# (reference Step2_formatting_v14.py:253-280)
# --------------------------------------------------------------------------

_STRAY_BEFORE_NARRATION = re.compile(r'^\s*(["“])\s+([A-ZÀ-ÖØ-Ý].*)$')


def hoist_stray_quote_to_prev_line(text: str, counters: dict) -> str:
    lines = text.splitlines()
    moved = 0

    def prev_nonempty(i: int) -> int:
        p = i - 1
        while p >= 0 and lines[p].strip() == "":
            p -= 1
        return p

    for i in range(len(lines)):
        m = _STRAY_BEFORE_NARRATION.match(lines[i])
        if not m:
            continue
        p = prev_nonempty(i)
        if p >= 0:
            closing = "”" if lines[p].lstrip().startswith("“") else '"'
            if not lines[p].rstrip().endswith(("”", '"')):
                lines[p] = lines[p].rstrip() + closing
            lines[i] = m.group(2)
            moved += 1
    counters["leading_stray_quote_before_narrative_moved"] = moved
    return "\n".join(lines)


# --------------------------------------------------------------------------
# Pass 2.9 — split closing-quote/opening-quote pairs to paragraphs
# (reference Step2_formatting_v14.py:226-250)
# --------------------------------------------------------------------------

_CLOSE_OPEN_PAIR = re.compile(r'(”|")(\s+)("|“)(?=[A-Za-zÀ-ÖØ-öø-ÿ“])')


def split_adjacent_quote_pairs(text: str, counters: dict) -> str:
    hits = 0

    def para_break(m: re.Match) -> str:
        nonlocal hits
        hits += 1
        return f"{m.group(1)}\n\n{m.group(3)}"

    text = _CLOSE_OPEN_PAIR.sub(para_break, text)
    counters["adjacent_quotes_split"] = hits
    return text


# --------------------------------------------------------------------------
# Pass 2.10 — collapse space-separated double quotes
# (reference Step2_formatting_v14.py:207-224)
# --------------------------------------------------------------------------

_SPACED_QUOTE_PAIR = re.compile(r'(”|")([  \t]+)("|“)')


def collapse_spaced_quote_pairs(text: str, counters: dict) -> str:
    text, n = _SPACED_QUOTE_PAIR.subn(lambda m: m.group(3), text)
    if n:
        counters["double_quotes_with_space_collapsed"] = n
    else:
        counters.setdefault("double_quotes_with_space_collapsed", 0)
    return text


# --------------------------------------------------------------------------
# Pass 2.11 — '' → "  (reference Step2_formatting_v14.py:149-152)
# --------------------------------------------------------------------------

_DOUBLED_SINGLE = re.compile(r"''")


def straighten_doubled_singles(text: str, counters: dict) -> str:
    text, n = _DOUBLED_SINGLE.subn('"', text)
    counters["double_single_to_doublequote"] = n
    return text


# --------------------------------------------------------------------------
# Pass 2.12 — superscript strip (reference Step2_formatting_v14.py:55-59)
# --------------------------------------------------------------------------

_SUPERSCRIPTS = re.compile(r"[¹²³⁰-⁹]")


def drop_superscripts(text: str, counters: dict) -> str:
    text, n = _SUPERSCRIPTS.subn("", text)
    counters["superscripts_removed"] = n
    return text


# --------------------------------------------------------------------------
# Pass 2.13 — footnote-number strip with ordinal/money guards
# (reference Step2_formatting_v14.py:61-112)
# --------------------------------------------------------------------------

_HAS_DIGIT = re.compile(r"\d")
_ORDINAL = re.compile(r"^\d{1,3}(st|nd|rd|th)$", re.IGNORECASE)
_STANDALONE_NUM = re.compile(
    r'(^|[\s,;:—\-\)\(\[\]“”"\' ])(\d{1,3})(?=($|[\s,;:—\-\)\(\]\[“”"\'\.,!?]))'
)
_AFTER_PUNCT_NUM = re.compile(r"[,:;]\s?(\d{1,3})(?=($|[^\w]))")
_GLUED_NUM = re.compile(r"(?<=[A-Za-zÀ-ÖØ-öø-ÿ]|\.)(\d{1,3})(?=($|[^\w]))")


@functools.lru_cache(maxsize=8)
def _money_next_re(money_terms: frozenset[str]) -> re.Pattern:
    # One escape/sort/join + compile per distinct money-term SET, not one
    # per document: the alternation build over the terms is the real
    # per-call cost (re.compile itself caches Patterns), so key the cache
    # on the set and do the whole build inside it.
    money_alt = "|".join(
        sorted(map(re.escape, money_terms), key=len, reverse=True)
    )
    return re.compile(rf"^\s*(?:{money_alt})\b", re.IGNORECASE)


def strip_footnote_digits(
    text: str, counters: dict, money_terms: frozenset[str] | set[str] = DEFAULT_MONEY_TERMS
) -> str:
    samples: dict[str, list[str]] = {"standalone": [], "after_punct": [], "glued_to_word": []}
    tallies = {"standalone": 0, "after_punct": 0, "glued_to_word": 0}

    money_next = _money_next_re(
        money_terms
        if isinstance(money_terms, frozenset)
        else frozenset(money_terms)
    )

    lines = text.splitlines()
    for idx, line in enumerate(lines):
        # Fast path (byte-safe): every pattern below requires a digit.
        if not _HAS_DIGIT.search(line):
            continue

        def on_standalone(m: re.Match) -> str:
            num = m.group(2)
            trail = m.group(3) or ""
            if _ORDINAL.match(num):
                return m.group(1) + num + trail
            if money_next.search(line[m.end():]):
                return m.group(1) + num + trail
            tallies["standalone"] += 1
            if len(samples["standalone"]) < 10:
                samples["standalone"].append(
                    line[max(0, m.start() - 40) : m.end() + 40].replace("\n", "⏎")
                )
            return m.group(1) + trail

        line = _STANDALONE_NUM.sub(on_standalone, line)

        def on_after_punct(m: re.Match) -> str:
            num = m.group(1)
            if money_next.search(line[m.end():]):
                return m.group(0)
            tallies["after_punct"] += 1
            if len(samples["after_punct"]) < 10:
                samples["after_punct"].append(
                    line[max(0, m.start() - 40) : m.end() + 40].replace("\n", "⏎")
                )
            return m.group(0).replace(num, "")

        line = _AFTER_PUNCT_NUM.sub(on_after_punct, line)

        def on_glued(m: re.Match) -> str:
            num = m.group(1)
            tallies["glued_to_word"] += 1
            if len(samples["glued_to_word"]) < 10:
                samples["glued_to_word"].append(
                    line[max(0, m.start() - 40) : m.end() + 40].replace("\n", "⏎")
                )
            return m.group(0).replace(num, "")

        line = _GLUED_NUM.sub(on_glued, line)
        lines[idx] = line

    counters["footnote_numbers_removed"] = tallies
    for key, vals in samples.items():
        if vals:
            counters[f"footnote_examples_{key}"] = vals
    return "\n".join(lines)


# --------------------------------------------------------------------------
# Pass 2.14 — quote/apostrophe artifact repair
# (reference Step2_formatting_v14.py:154-205)
# --------------------------------------------------------------------------

_INLINE_STOP_APOS_QUOTE = re.compile(r'([\.!\?])(?:\'|’)\s+"')
_LINE_START_QUOTE_APOS = re.compile(r'^\s*" ?(?:\'|’)')
_LINE_END_APOS_QUOTE = re.compile(r'(?:\'|’)\s*"$')
_INLINE_QUOTE_APOS = re.compile(r'" ?(?:\'|’)')
_STOP_APOS_EOL = re.compile(r"[\.!\?]\'\s*$")
_STOP_APOS_EOL_SUB = re.compile(r"([\.!\?])\'\s*$")
_LINE_START_QUOTE_APOS_WS = re.compile(r'^\s*" ?(?:\'|’)\s*')


def mend_quote_apostrophe_artifacts(text: str, counters: dict) -> str:
    lines = text.splitlines()
    moved_up = moved_down = collapsed = inline = 0

    for i, s in enumerate(lines):
        if "'" not in s and "’" not in s:  # pattern requires an apostrophe
            continue
        new_s, n = _INLINE_STOP_APOS_QUOTE.subn(r'\1"\n\n"', s)
        if n:
            lines[i] = new_s
            inline += n

    def balanced(s: str) -> bool:
        return (s.count('"') % 2) == 0

    for i, s in enumerate(lines):
        if '"' not in s:  # pattern requires a double quote
            continue
        if not _LINE_START_QUOTE_APOS.match(s):
            continue
        j = i - 1
        while j >= 0 and lines[j].strip() == "":
            j -= 1
        if j is not None and j >= 0:
            prev = lines[j]
            if prev.lstrip().startswith('"') and not balanced(prev):
                if _STOP_APOS_EOL.search(prev):
                    lines[j] = _STOP_APOS_EOL_SUB.sub(r'\1"', prev)
                else:
                    lines[j] = prev.rstrip() + '"'
                lines[i] = _LINE_START_QUOTE_APOS_WS.sub("", lines[i], count=1)
                moved_up += 1
                continue
        lines[i] = _LINE_START_QUOTE_APOS.sub('"', lines[i], count=1)
        collapsed += 1

    for i, s in enumerate(lines):
        if '"' not in s:  # pattern requires a double quote
            continue
        if not _LINE_END_APOS_QUOTE.search(s.strip()):
            continue
        j = i + 1
        while j < len(lines) and lines[j].strip() == "":
            j += 1
        if j < len(lines) and not lines[j].lstrip().startswith('"'):
            lines[i] = _LINE_END_APOS_QUOTE.sub('"', s.strip())
            lines[j] = '"' + lines[j].lstrip()
            moved_down += 1

    for i, s in enumerate(lines):
        if '"' not in s:  # pattern requires a double quote
            continue
        new_s, n = _INLINE_QUOTE_APOS.subn('"', s)
        if n:
            lines[i] = new_s
            collapsed += n

    counters["quote_artifacts_inline_moves"] = inline
    counters["quote_artifacts_moved_up"] = moved_up
    counters["quote_artifacts_moved_down"] = moved_down
    counters["quote_artifacts_collapsed"] = collapsed
    return "\n".join(lines)


# --------------------------------------------------------------------------
# Pass 2.15 — comma/quote spacing (reference Step2_formatting_v14.py:49-53)
# --------------------------------------------------------------------------

_COMMA_QUOTE_GAP = re.compile(r',\s+"\s')


def normalize_comma_quote_gap(text: str, counters: dict) -> str:
    text, n = _COMMA_QUOTE_GAP.subn('," ', text)
    counters["comma_space_quote_space_normalized"] = n
    return text


# --------------------------------------------------------------------------
# Pass 2.16 — quote-island block removal
# (reference Step2_formatting_v14.py:126-147)
# --------------------------------------------------------------------------

_LONE_QUOTE_FORMS = {'"', '""', "“", "”"}


def drop_quote_islands(text: str, counters: dict) -> str:
    lines = text.splitlines()
    out: list[str] = []
    i = 0
    removed = 0
    while i < len(lines):
        if (
            i + 2 < len(lines)
            and lines[i].strip() == ""
            and lines[i + 1].strip() in _LONE_QUOTE_FORMS
            and lines[i + 2].strip() == ""
        ):
            if not out or out[-1].strip() != "":
                out.append("")
            removed += 1
            i += 3
            while i < len(lines) and lines[i].strip() == "":
                i += 1
            continue
        out.append(lines[i])
        i += 1
    counters["quote_island_blocks_removed"] = removed
    return "\n".join(out)


# --------------------------------------------------------------------------
# Pass 2.17 — new-speaker split (reference Step2_formatting_v14.py:483-501)
# --------------------------------------------------------------------------

_SPEAKER_TURN = re.compile(r'([.!?]")\s+(")([A-Z])')


def split_speaker_turns(text: str, counters: dict) -> str:
    hits = 0

    def para_break(m: re.Match) -> str:
        nonlocal hits
        hits += 1
        return m.group(1) + "\n\n" + m.group(2) + m.group(3)

    text = _SPEAKER_TURN.sub(para_break, text)
    counters.setdefault("dialogue_splits_new_speaker", 0)
    counters["dialogue_splits_new_speaker"] += hits
    return text


# --------------------------------------------------------------------------
# Pass 2.18 — intraline whitespace (reference Step2_formatting_v14.py:114-124)
# --------------------------------------------------------------------------

_INNER_SPACE_RUN = re.compile(r"(?<=\S) {2,}(?=\S)")


def tidy_intraline_spaces(text: str, counters: dict) -> str:
    total = 0
    out = []
    for line in text.splitlines():
        if "\t" in line:
            line = line.replace("\t", " ")
        if "  " in line:  # pattern requires a 2-space run
            line, n = _INNER_SPACE_RUN.subn(" ", line)
            total += n
        out.append(line)
    counters["intraline_space_runs_normalized"] = total
    return "\n".join(out)


# --------------------------------------------------------------------------
# Pass 2.19 — "" collapse (reference Step2_formatting_v14.py:44-47)
# --------------------------------------------------------------------------

_ADJACENT_DQUOTES = re.compile(r'""')


def collapse_adjacent_dquotes(text: str, counters: dict) -> str:
    text, n = _ADJACENT_DQUOTES.subn('"', text)
    counters["double_doublequotes_collapsed"] = counters.get(
        "double_doublequotes_collapsed", 0
    ) + n
    return text


# --------------------------------------------------------------------------
# Stage driver (order from reference Step2_formatting_v14.py:514-547)
# --------------------------------------------------------------------------

def run_stage2(
    text: str,
    counters: dict | None = None,
    money_terms: frozenset[str] | set[str] = DEFAULT_MONEY_TERMS,
    speaker_turn_split: bool = True,
) -> str:
    """Full stage 2 in reference order (Step2_formatting_v14.py:514-547).

    ``speaker_turn_split=False`` is the legacy v13 pipeline byte-for-byte
    (Step2_formatting1_v13.py is exactly v14 minus the
    split_adjacent_dialogue_turns pass — confirmed by diff)."""
    if counters is None:
        counters = {}
    text = bare_mojibake_prepass(text, counters)
    text = sweep_mojibake_and_artifacts(text, counters)
    text = reflow_soft_breaks(text, counters)
    text = break_dialogue_paragraphs(text, counters)
    text = merge_residual_newlines(text, counters)
    text = collapse_midsentence_breaks(text, counters)
    text = resolve_lone_quote_lines(text, counters)
    text = close_prev_and_drop_stray_quote(text, counters)
    text = hoist_stray_quote_to_prev_line(text, counters)
    text = split_adjacent_quote_pairs(text, counters)
    text = collapse_spaced_quote_pairs(text, counters)
    text = straighten_doubled_singles(text, counters)
    text = drop_superscripts(text, counters)
    text = strip_footnote_digits(text, counters, money_terms)
    text = mend_quote_apostrophe_artifacts(text, counters)
    text = normalize_comma_quote_gap(text, counters)
    text = drop_quote_islands(text, counters)
    if speaker_turn_split:
        text = split_speaker_turns(text, counters)
    text = tidy_intraline_spaces(text, counters)
    text = collapse_adjacent_dquotes(text, counters)
    return text
