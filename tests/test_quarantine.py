"""Giant-document cap and error isolation (north_rule skew/lineage items)."""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.extractlib.pipeline import extract_document  # noqa: E402


def test_oversize_doc_quarantined():
    res = extract_document("x" * 1000, max_doc_chars=100)
    assert res.status == "quarantined"
    assert res.blocks == []
    assert res.counters["quarantined_chars"] == 1000
    assert "exceeds" in res.error


def test_normal_doc_under_cap():
    res = extract_document("CHAPTER I\n\nFINE TEXT here.\n", max_doc_chars=100)
    assert res.status == "ok"
    assert res.blocks


def test_exception_isolated():
    res = extract_document(None)  # type: ignore[arg-type]
    assert res.status == "error"
    assert res.blocks == []
