"""EPUB export sink (S12/T34/T35): valid zip layout, chapters-only TOC."""

from __future__ import annotations

import pathlib
import sys
import zipfile
import io

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.export import epub_bytes  # noqa: E402
from pdf_to_epub_spark.extractlib import segment_blocks, transform_text  # noqa: E402
from pdf_to_epub_spark.sources.synth import make_document_text  # noqa: E402


def _make_blocks():
    stage3, _ = transform_text(make_document_text(3, seed=42))
    return segment_blocks(stage3)


def test_epub_zip_layout():
    payload = epub_bytes(_make_blocks(), title="T", author="A", url="u://x")
    z = zipfile.ZipFile(io.BytesIO(payload))
    names = z.namelist()
    # spec: mimetype first and STORED
    assert names[0] == "mimetype"
    info = z.getinfo("mimetype")
    assert info.compress_type == zipfile.ZIP_STORED
    assert z.read("mimetype") == b"application/epub+zip"
    assert "META-INF/container.xml" in names
    assert "OEBPS/content.opf" in names
    assert "OEBPS/nav.xhtml" in names


def test_epub_chapters_and_toc():
    blocks = _make_blocks()
    payload = epub_bytes(blocks, title="T", url="u://x")
    z = zipfile.ZipFile(io.BytesIO(payload))
    nav = z.read("OEBPS/nav.xhtml").decode()
    n_headings = sum(1 for b in blocks if b.block_type == "heading")
    assert nav.count("<li>") >= n_headings  # chapters (+ possible front matter)
    opf = z.read("OEBPS/content.opf").decode()
    assert opf.count("<itemref") == nav.count("<li>")
    # deterministic: same input → same bytes
    assert payload == epub_bytes(blocks, title="T", url="u://x")


def test_epub_empty_doc():
    payload = epub_bytes([], title="empty", url="u://e")
    z = zipfile.ZipFile(io.BytesIO(payload))
    assert "OEBPS/Text/chap_001.xhtml" in z.namelist()


def test_epub_bytes_deterministic_across_seconds():
    """Byte-determinism must not depend on wall clock: zip entry dates are
    fixed, so the same blocks give the same bytes even across a second
    boundary (retries/re-runs reproduce the artifact bit-for-bit)."""
    import time

    blocks = _make_blocks()
    a = epub_bytes(blocks, title="T", url="u://x")
    time.sleep(1.1)
    assert epub_bytes(blocks, title="T", url="u://x") == a
