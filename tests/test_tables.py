"""Replacement tables byte-equal to the reference dict literals.

The mojibake maps contain invisible characters (U+0080, U+008F, U+009C,
U+FFFD, NBSP…) that hand transcription silently corrupts, so the tables are
verified by AST-parsing the reference sources and comparing item-for-item
(order included — replacement order is load-bearing).  Skipped when the
reference checkout is absent.
"""

from __future__ import annotations

import ast
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

REF = pathlib.Path("/root/reference/text-processing")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference not available")


def _assigned(path: pathlib.Path, name: str):
    tree = ast.parse(path.read_text(encoding="utf-8"))
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id == name
        ):
            return ast.literal_eval(node.value)
    raise AssertionError(f"{name} not found in {path}")


def test_step2_tables():
    from pdf_to_epub_spark.extractlib import formatting as f

    src = REF / "Step2_formatting_v14.py"
    assert list(f.MOJIBAKE_PAIRS) == list(_assigned(src, "MOJI_MAP").items())
    assert list(f.PROPER_NOUN_PAIRS) == list(_assigned(src, "SPECIAL_FR").items())
    assert list(f.ARTIFACT_TOKENS) == list(_assigned(src, "ARTIFACTS"))
    assert list(f.QUOTE_SHAPES) == list(_assigned(src, "QUOTE_VARIANTS").items())


def test_step1_mapping():
    from pdf_to_epub_spark.extractlib import cleanup as c

    src = REF / "Step1_ocr_cleanup_v11.py"
    assert list(c._STAGE1_MOJIBAKE) == list(_assigned(src, "mapping").items())


def test_step2_prepass_keys():
    """The pre-pass keys are â+U+0080(+¢): literally invisible in editors."""
    src = (REF / "Step2_formatting_v14.py").read_text(encoding="utf-8")
    assert 'text.replace("â¢", "")' in src.replace("text = ", "", 1) or (
        "â¢" in src and "â" in src
    )
    from pdf_to_epub_spark.extractlib.formatting import bare_mojibake_prepass

    # U+0080 forms are rewritten; the visible â€¢ (U+20AC) is untouched here
    assert bare_mojibake_prepass("xâ¢y zâw", {}) == 'xy z"w'
    assert bare_mojibake_prepass("â€¢", {}) == "â€¢"


def test_legacy_tables():
    from pdf_to_epub_spark.extractlib import legacy as L

    src = REF / "legacy" / "Step1_ocr_cleanup_v7.py"
    assert list(L._LEGACY_QUOTE_VARIANTS) == list(_assigned(src, "variants").items())
    assert list(L._V7_MOJIBAKE) == list(_assigned(src, "mapping").items())


def test_default_money_terms():
    import re

    from pdf_to_epub_spark.extractlib import formatting as f

    src = (REF / "Step2_formatting_v14.py").read_text(encoding="utf-8")
    m = re.search(r"return \{\n(.*?)\n    \}", src, re.DOTALL)
    assert set(f.DEFAULT_MONEY_TERMS) == ast.literal_eval("{" + m.group(1) + "}")
