"""Legacy operator surface (reference legacy/Step1_ocr_cleanup_v7.py):
golden parity against the legacy CLI itself, plus targeted unit cases."""

from __future__ import annotations

import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib.legacy import (  # noqa: E402
    is_year,
    kill_inline_volume_chapter,
    next_word_is_currency,
    rtf_to_text,
    strip_numbers_general,
    windowed_header_strip,
)

LEGACY_CLI = pathlib.Path("/root/reference/text-processing/legacy/Step1_ocr_cleanup_v7.py")

SAMPLES = [
    "Volume Seven\n. Chapter Three\nbody text stays here.\n",
    "Volume 7 Chapter III\n12\nHistory of My Life\nreal prose line.\n",
    "He paid 100 ducats and 55 more in 1760.\nA line 12 with, 34 numbers glued99 here.\n",
    "word-\nwrap and '' quotes ' \" mixed \" ' artifacts Â¹Â²Â³.\n",
    "12\nhistory of my life\nThen the story continued without pause.\n",
    'Volume Two\n•\nChapter Nine\n301\nThe real text begins "here" now.\n',
]


@pytest.mark.skipif(not LEGACY_CLI.exists(), reason="reference not available")
@pytest.mark.parametrize("idx", range(len(SAMPLES)))
def test_legacy_cli_parity(tmp_path, idx):
    """Our legacy pass sequence byte-matches the legacy CLI end-to-end."""
    inp = tmp_path / "in.txt"
    outp = tmp_path / "out.txt"
    inp.write_text(SAMPLES[idx], encoding="utf-8")
    subprocess.run(
        [sys.executable, str(LEGACY_CLI), str(inp), str(outp)],
        check=True, capture_output=True,
    )
    expected = outp.read_text(encoding="utf-8")

    from pdf_to_epub_spark.extractlib.legacy import run_legacy_cleanup

    assert run_legacy_cleanup(SAMPLES[idx]) == expected


def test_rtf_decode():
    raw = rb"{\rtf1 Hello\par World \'e9 and \u233? done}"
    out = rtf_to_text(raw)
    assert "Hello\n World" in out
    assert "é" in out
    assert "{" not in out and "}" not in out


def test_year_and_currency_guards():
    assert is_year("1760") and is_year("2099") and not is_year("1499")
    assert not is_year("176")
    assert next_word_is_currency("paid 100 ducats", len("paid 100"))
    assert next_word_is_currency("cost £ 50", len("cost "))
    assert not next_word_is_currency("page 100 of text", len("page 100"))


def test_inline_volume_chapter_kill():
    out = kill_inline_volume_chapter("before Volume Seven ... Chapter Three after\n")
    assert "Volume" not in out and "Chapter" not in out
    # protected: standalone CHAPTER without preceding Volume survives
    out2 = kill_inline_volume_chapter("CHAPTER III\nbody\n")
    assert "CHAPTER III" in out2


def test_windowed_header_strip():
    log: dict = {}
    text = "Volume Seven\nChapter Three\n45\nReal body prose here.\n"
    out = windowed_header_strip(text, log)
    assert "Real body prose here." in out
    assert "Volume Seven" not in out
    assert log["headers_removed"] >= 1


def test_strip_numbers_general_guards():
    log: dict = {}
    out = strip_numbers_general("It was 1760. He paid 100 ducats. Page 99\n", log)
    assert "1760" in out  # year guard
    assert "ducats" in out
    assert log["number_removals"]["deletions"]["standalone_line"] >= 0


def test_stage1_v10_parity():
    """run_stage1(protect_chapter_heading=False) is the legacy v10 pipeline
    byte-for-byte (v10 = v11 minus the protected-heading logic; goldens
    produced by tests/make_legacy_v10_goldens.py from the reference CLI)."""
    from pdf_to_epub_spark.extractlib.cleanup import run_stage1

    golden = pathlib.Path(__file__).resolve().parent / "golden"
    cases = sorted(p for p in golden.iterdir() if (p / "step1_v10.txt").is_file())
    assert len(cases) >= 24
    for doc_dir in cases:
        raw = (doc_dir / "input.txt").read_text(encoding="utf-8")
        expected = (doc_dir / "step1_v10.txt").read_text(encoding="utf-8")
        got = run_stage1(raw, {}, protect_chapter_heading=False)
        assert got == expected, doc_dir.name


def test_stage2_v13_parity():
    """run_stage2(speaker_turn_split=False) is the legacy v13 pipeline
    byte-for-byte (v13 = v14 minus split_adjacent_dialogue_turns; goldens
    from tests/make_legacy_v13_goldens.py via the reference CLI)."""
    from pdf_to_epub_spark.extractlib.formatting import run_stage2

    golden = pathlib.Path(__file__).resolve().parent / "golden"
    cases = sorted(p for p in golden.iterdir() if (p / "step2_v13.txt").is_file())
    assert len(cases) >= 24
    for doc_dir in cases:
        s1 = (doc_dir / "step1.txt").read_text(encoding="utf-8")
        expected = (doc_dir / "step2_v13.txt").read_text(encoding="utf-8")
        got = run_stage2(s1, {}, speaker_turn_split=False)
        assert got == expected, doc_dir.name
