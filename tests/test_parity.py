"""Byte-parity of extractlib stages vs reference-CLI golden files.

Golden files were produced by running the reference Step1/2/3 CLIs directly
(see make_goldens.py); these tests assert our pure-Python stages reproduce
them byte-for-byte — the `north_rule` per-row invariant.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib import (  # noqa: E402
    reassemble,
    run_stage1,
    run_stage2,
    run_stage3,
    segment_blocks,
    transform_text,
)

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
CASES = sorted(p.name for p in GOLDEN.iterdir() if (p / "input.txt").exists())


def _read(case: str, name: str) -> str:
    return (GOLDEN / case / name).read_text(encoding="utf-8")


@pytest.mark.parametrize("case", CASES)
def test_stage1_parity(case: str) -> None:
    got = run_stage1(_read(case, "input.txt"))
    assert got == _read(case, "step1.txt")


@pytest.mark.parametrize("case", CASES)
def test_stage2_parity(case: str) -> None:
    got = run_stage2(_read(case, "step1.txt"))
    assert got == _read(case, "step2.txt")


@pytest.mark.parametrize("case", CASES)
def test_stage3_parity(case: str) -> None:
    got = run_stage3(_read(case, "step2.txt"))
    assert got == _read(case, "step3.txt")


@pytest.mark.parametrize("case", CASES)
def test_full_transform_parity(case: str) -> None:
    got, counters = transform_text(_read(case, "input.txt"))
    assert got == _read(case, "step3.txt")


@pytest.mark.parametrize("case", CASES)
def test_block_reassembly_invariant(case: str) -> None:
    stage3 = _read(case, "step3.txt")
    blocks = segment_blocks(stage3)
    assert reassemble(blocks) == stage3
    # spans: exact slices, dense ids, monotone & non-overlapping
    for i, b in enumerate(blocks):
        assert b.block_id == i
        assert stage3[b.span_start : b.span_end] == b.text
        assert b.span_start < b.span_end or stage3 == ""
        if i:
            assert b.span_start == blocks[i - 1].span_end
