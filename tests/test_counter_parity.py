"""Metric parity: our pass counters equal the reference CLI's JSON logs.

The reference emits a JSON log per stage (``--log``); the golden harness
captured them.  The lineage/metrics table (`north_rule`) is built from the
same counters, so they must match the reference exactly — including the
truncated example lists.
"""

from __future__ import annotations

import json
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib import run_stage1, run_stage2  # noqa: E402

GOLDEN = pathlib.Path(__file__).resolve().parent / "golden"
CASES = sorted(
    p.name for p in GOLDEN.iterdir() if (p / "step1.log.json").exists()
)

# Keys the reference writes about the CLI invocation itself, not the passes.
_CLI_KEYS = {"status", "infile", "outfile", "length_in", "length_out"}


@pytest.mark.parametrize("case", CASES)
def test_stage1_counters(case: str) -> None:
    text = (GOLDEN / case / "input.txt").read_text(encoding="utf-8")
    counters: dict = {}
    run_stage1(text, counters)
    expected = json.loads((GOLDEN / case / "step1.log.json").read_text())
    expected = {k: v for k, v in expected.items() if k not in _CLI_KEYS}
    assert counters == expected


@pytest.mark.parametrize("case", CASES)
def test_stage2_counters(case: str) -> None:
    text = (GOLDEN / case / "step1.txt").read_text(encoding="utf-8")
    counters: dict = {}
    run_stage2(text, counters)
    expected = json.loads((GOLDEN / case / "step2.log.json").read_text())
    assert counters == expected
