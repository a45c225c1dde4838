"""Differential fuzzing: random OCR-ish texts through our transform vs the
reference CLIs, byte-compared.  Catches parity divergences the structured
fixtures miss (odd whitespace shapes, unicode edge cases, pathological
quote/number layouts).

Deterministic (derandomized hypothesis profile) and bounded (subprocess per
example is expensive — the example budget is small but the generator is
dense in reference-relevant phenomena).
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib import (  # noqa: E402
    reassemble,
    segment_blocks,
    transform_text,
)

REF = pathlib.Path("/root/reference/text-processing")

# Alphabet dense in the phenomena the passes react to.
_TOKENS = st.sampled_from(
    [
        "word", "Volume", "VOLUME 3", "History of My Life", "CHAPTER",
        "Hıstory of My Life", "Hİstory of My Lİfe", "VOLUMİ", "volumı 3",
        "CHAPTER IV", "chapter ix", "12", "345", "1760", "2nd",
        "100 ducats", "•", "·", '"', "''", "' \"", "”", "“", "â", "â€¢",
        "Ã©", "Ã‚", "Â", "so-\nlong", "­\n", "Mr.", "!", "?", "I", "A",
        "THE END", "...", ",", ";", "\f", "¹", "²",
        "He said.", '"Quoted speech." "More speech."', "page",
    ]
)
_SEPS = st.sampled_from(
    [" ", "  ", "\n", "\n\n", "\n\n\n", "\t", " \n ", "\r\n", "\r", "\r\r"]
)


@st.composite
def ocr_texts(draw):
    n = draw(st.integers(min_value=0, max_value=60))
    parts = []
    for _ in range(n):
        parts.append(draw(_TOKENS))
        parts.append(draw(_SEPS))
    return "".join(parts)


def _reference_stage3(text: str, tmp: pathlib.Path) -> str:
    inp = tmp / "in.txt"
    inp.write_text(text, encoding="utf-8")
    s1, s2, s3 = tmp / "s1.txt", tmp / "s2.txt", tmp / "s3.txt"
    for script, a, b in (
        ("Step1_ocr_cleanup_v11.py", inp, s1),
        ("Step2_formatting_v14.py", s1, s2),
        ("Step3_structuring_v1.py", s2, s3),
    ):
        subprocess.run(
            [sys.executable, str(REF / script), str(a), str(b)],
            check=True, capture_output=True,
        )
    return s3.read_text(encoding="utf-8")


@pytest.mark.skipif(not REF.exists(), reason="reference not available")
@settings(
    max_examples=75,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(text=ocr_texts())
def test_differential_parity(text: str) -> None:
    import tempfile

    got, _ = transform_text(text)
    with tempfile.TemporaryDirectory() as tmp:
        expected = _reference_stage3(text, pathlib.Path(tmp))
    assert got == expected

    blocks = segment_blocks(got)
    assert reassemble(blocks) == got
    for i, b in enumerate(blocks):
        assert b.block_id == i
        assert got[b.span_start : b.span_end] == b.text


@settings(max_examples=100, deadline=None, derandomize=True)
@given(text=st.text(max_size=400))
def test_arbitrary_unicode_never_crashes(text: str) -> None:
    """Pure robustness: any unicode input transforms and re-tiles exactly."""
    got, counters = transform_text(text)
    blocks = segment_blocks(got)
    assert reassemble(blocks) == got


# ---------------------------------------------------------------------------
# Fast-path vs regex differential: formatting.py replaces five hot regex
# passes with literal-anchored str.find loops.  Each helper must be
# byte-identical to the regex it documents, on inputs dense in the exact
# phenomena the scanners branch on (whitespace-run shapes, consumed-tail
# adjacency, excluded-class boundaries).
# ---------------------------------------------------------------------------

from pdf_to_epub_spark.extractlib import formatting as _fmt  # noqa: E402

# Dense in: newline runs, hyphen wraps (upper/lower tails, chained), space
# and tab runs, punctuation after whitespace, mid-sentence break shapes
# (excluded group-1 chars, ws-inside-run group-1 candidates, latin-1 tails).
_FASTPATH_ATOMS = st.sampled_from(
    [
        "a", "b", "Z", "é", "à", "ö", "ø", "ÿ", "×", "÷", ".", "!", "?",
        ";", ":", ")", '"', ",", " ", "  ", "\t", "\t ", "\n", "\n\n",
        "\n\n\n", "\n\n\n\n", "-\n", "a-\nb", "a-\nB", "-\n-\n", "x-\ny-\nz",
        " \n\n ", "\n \n", "\x0b", "\xa0", " ,", "  .", "\n;", "\t!",
        "word", "Mr.", "\r\n",
    ]
)


@st.composite
def fastpath_texts(draw):
    n = draw(st.integers(min_value=0, max_value=40))
    return "".join(draw(_FASTPATH_ATOMS) for _ in range(n))


@settings(max_examples=300, deadline=None, derandomize=True)
@given(text=fastpath_texts())
def test_fastpath_differential(text: str) -> None:
    """Each literal-anchored fast path == the regex pass it replaced."""
    assert _fmt._collapse_blank_runs(text) == _fmt._BLANK_RUN.sub("\n\n", text)
    assert _fmt._dehyphenate_wraps(text) == _fmt._HYPHEN_WRAP.sub(
        _fmt._join_hyphen_wrap, text
    )
    assert _fmt._collapse_space_runs(text) == _fmt._SPACE_RUN.sub(" ", text)
    assert _fmt._strip_space_before_punct(text) == _fmt._SPACE_BEFORE_PUNCT.sub(
        r"\1", text
    )
    got_txt, got_n = _fmt._collapse_midsentence(text)
    exp_txt, exp_n = _fmt._MID_SENTENCE_BREAK.subn(r"\1 \2", text)
    assert (got_txt, got_n) == (exp_txt, exp_n)


@settings(max_examples=150, deadline=None, derandomize=True)
@given(text=st.text(max_size=300))
def test_fastpath_differential_arbitrary_unicode(text: str) -> None:
    """Same five equivalences on arbitrary unicode (ws classes beyond ASCII)."""
    assert _fmt._collapse_blank_runs(text) == _fmt._BLANK_RUN.sub("\n\n", text)
    assert _fmt._dehyphenate_wraps(text) == _fmt._HYPHEN_WRAP.sub(
        _fmt._join_hyphen_wrap, text
    )
    assert _fmt._collapse_space_runs(text) == _fmt._SPACE_RUN.sub(" ", text)
    assert _fmt._strip_space_before_punct(text) == _fmt._SPACE_BEFORE_PUNCT.sub(
        r"\1", text
    )
    got = _fmt._collapse_midsentence(text)
    assert got == _fmt._MID_SENTENCE_BREAK.subn(r"\1 \2", text)


from pdf_to_epub_spark.extractlib import cleanup as _cln  # noqa: E402

_MOJIBAKE_ATOMS = st.sampled_from(
    ["Ã©", "Ã‚", "Ã", "word", "ÃƒÂ©", "l'Ã©tÃ©", " ", "\n", "Ã-Ã", "'’-"]
)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(
    text=st.one_of(
        st.text(max_size=200),
        st.lists(_MOJIBAKE_ATOMS, max_size=30).map("".join),
    )
)
def test_repair_word_mojibake_identity_proof(text: str) -> None:
    """repair_word_mojibake is a proven no-op: the literal regex form
    (reference semantics) never changes any input, because every mojibake
    key contains a char outside the word-token class."""
    assert _cln._repair_word_mojibake_regex(text) == text
    assert _cln.repair_word_mojibake(text) == text


# ---------------------------------------------------------------------------
# sre-IGNORECASE vs casefold prescreen: the Turkish dotless/dotted I repros.
# re matches (?i)i against U+0131 (folds to itself) and U+0130 (folds to
# "i"+U+0307); a plain-casefold substring screen misses both, so
# strip_running_heads must fold them back to "i" before screening.
# ---------------------------------------------------------------------------

_TURKISH_I_DOCS = [
    "hıstory of my life\nVOL I\n\nBody text here follows.",
    "Hİstory of my life\n12\n\nBody text here follows.",
    "before\nvolumı II\n\nAfter body line.",
    "before\nVOLUMİ II\n\nAfter body line.",
    # universal-newline repros: the reference CLIs read in text mode, so
    # \r\n and lone \r are \n before Step 1 — the reinserted protected
    # block must not keep raw CRs nor change anchor/absorb decisions.
    'word Volume\n\' "\nVolume\r\n12 VOLUMİ ',
    "word Volume\n' \"\nVolume\r\n12 VOLUME ",
    "a\rb\rVolume\r12\r\rBody text here.",
]


@pytest.mark.skipif(not REF.exists(), reason="reference not available")
@pytest.mark.parametrize("text", _TURKISH_I_DOCS)
def test_turkish_i_prescreen_differential(text: str) -> None:
    """Pinned reference-CLI differential for the prescreen fix: inputs where
    (?i)history/(?i)volume match via sre's i≡ı/İ equivalences but a naive
    casefold substring screen returns early."""
    import tempfile

    got, _ = transform_text(text)
    with tempfile.TemporaryDirectory() as tmp:
        expected = _reference_stage3(text, pathlib.Path(tmp))
    assert got == expected
