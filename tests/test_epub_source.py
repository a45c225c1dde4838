"""EPUB source (`sources/epub.py`) — inverse of the export sink.

Round-trip law: export a document's blocks with `export.epub_bytes`,
re-ingest through `parse_epub_bytes` / `parse_epub_payloads`, recover
exactly the exporter's chapter list (heading + space-normalized
paragraph texts in spine order).  Plus the wild-file tolerances the
parser promises: OPF in a subdirectory, attribute-laden / nested inline
markup in chapter bodies, and the three error-isolation markers
(error / unsupported / empty) on the Spark path.
"""

from __future__ import annotations

import io
import pathlib
import sys
import zipfile

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_to_epub_spark.export import _paragraphs, epub_bytes  # noqa: E402
from pdf_to_epub_spark.extractlib import (  # noqa: E402
    segment_blocks,
    transform_text,
)
from pdf_to_epub_spark.extractlib.blocks import chapter_struct  # noqa: E402
from pdf_to_epub_spark.sources.epub import (  # noqa: E402
    UnsupportedEpub,
    parse_epub_bytes,
    parse_epub_payloads,
)
from pdf_to_epub_spark.sources.synth import make_document_text  # noqa: E402


def _make_blocks(seed: int = 42):
    stage3, _ = transform_text(make_document_text(3, seed=seed))
    return segment_blocks(stage3)


def _expected_chapters(blocks):
    """The exporter's chapter list, derived from block structure alone
    (same derivation the driver oracle uses — no zip/XHTML involved)."""
    dicts = [b._asdict() for b in blocks]
    doc = chapter_struct(blocks)
    chapters = []
    if doc["front_matter"]:
        paras = _paragraphs(doc["front_matter"])
        if paras:
            chapters.append(("Front Matter", paras))
    for ch in doc["chapters"]:
        chapters.append((ch["heading"], _paragraphs(ch["blocks"])))
    if not chapters:
        chapters.append(("Body", _paragraphs(dicts)))
    return chapters


def test_roundtrip_recovers_chapters():
    blocks = _make_blocks()
    doc = parse_epub_bytes(
        epub_bytes(blocks, title="T", author="A", lang="fr", url="u://x")
    )
    assert doc["title"] == "T"
    assert doc["author"] == "A"
    assert doc["lang"] == "fr"
    assert doc["identifier"].startswith("urn:sha256:")
    expected = _expected_chapters(blocks)
    assert [
        (c["heading"], c["paras"]) for c in doc["chapters"]
    ] == [(" ".join(h.split()), p) for h, p in expected]
    # spine order is 1-based and gapless
    assert [c["idx"] for c in doc["chapters"]] == list(
        range(1, len(expected) + 1)
    )


def test_roundtrip_entity_escaping_inverse():
    blocks = [
        {
            "block_id": 0,
            "block_type": "paragraph",
            "text": 'a < b & "c" > d',
            "span_start": 0,
            "span_end": 15,
        }
    ]
    doc = parse_epub_bytes(epub_bytes(blocks, title="<&>", url="u://e"))
    assert doc["title"] == "<&>"
    assert doc["chapters"][0]["paras"] == ['a < b & "c" > d']


def test_wild_html_tolerance():
    """Chapter bodies with attributes, nested inline markup, and
    non-well-formed XML (unclosed <br>) still parse."""
    chapter = (
        "<html><body><h1 class='t' id=x>A <em>Big</em>\nTitle</h1>"
        "<p style='x'>one <b>bold<br></b> word</p>"
        "<p></p><p>two &amp; three</p></body></html>"
    )
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<dc:title>W</dc:title></metadata>"
        '<manifest><item id="c1" href="ch.xhtml"'
        ' media-type="application/xhtml+xml"/></manifest>'
        '<spine><itemref idref="c1"/></spine></package>'
    )
    container = (
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="sub/pkg.opf"'
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("META-INF/container.xml", container)
        z.writestr("sub/pkg.opf", opf)  # OPF in a subdirectory
        z.writestr("sub/ch.xhtml", chapter)  # href resolved relative to it
    doc = parse_epub_bytes(buf.getvalue())
    assert doc["title"] == "W"
    assert doc["chapters"] == [
        {
            "idx": 1,
            "href": "ch.xhtml",
            "heading": "A Big Title",
            "paras": ["one bold word", "two & three"],
        }
    ]


def test_non_epub_zip_raises_unsupported():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "not an epub")
    with pytest.raises(UnsupportedEpub):
        parse_epub_bytes(buf.getvalue())


def test_non_zip_raises_badzip():
    with pytest.raises(zipfile.BadZipFile):
        parse_epub_bytes(b"\x00\x01 not a zip at all")


def test_payloads_error_isolation(spark):
    good = epub_bytes(_make_blocks(), title="ok", url="u://ok")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("x", "no container")
    not_epub = buf.getvalue()
    # valid EPUB whose only spine doc yields no chapters: empty blocks
    empty = epub_bytes([], title="e", url="u://e")
    rows = [
        (1, bytearray(good)),
        (2, bytearray(b"garbage, not a zip")),
        (3, bytearray(not_epub)),
        (4, None),
        (5, bytearray(empty)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, epub binary")
    out = parse_epub_payloads(df).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.doc_id, []).append(r)
    assert all(r.status == "ok" for r in by_id[1])
    assert len(by_id[1]) == len(_expected_chapters(_make_blocks()))
    assert [r.status for r in by_id[2]] == ["error"]
    assert [r.status for r in by_id[3]] == ["unsupported"]
    assert [r.status for r in by_id[4]] == ["error"]
    # blocks=[] still renders a "Body" chapter with zero paragraphs
    assert [r.status for r in by_id[5]] == ["ok"]
    assert by_id[5][0].n_paras == 0
    # doc ids never vanish
    assert set(by_id) == {1, 2, 3, 4, 5}


def test_payloads_is_pure_map_stage(spark):
    """No Exchange in the parse plan — at 10^12 docs this must stay a
    map-only stage over the store's native partitioning."""
    df = spark.createDataFrame(
        [(1, bytearray(b"x"))], "doc_id long, epub binary"
    )
    plan = parse_epub_payloads(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_wild_href_encoding_and_fragment():
    """Manifest hrefs are IRIs: %20-encoded names and #fragment suffixes
    must still resolve to the zip member."""
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<dc:title>E</dc:title></metadata>"
        '<manifest><item id="c1" href="my%20chapter.xhtml#sec1"'
        ' media-type="application/xhtml+xml"/></manifest>'
        '<spine><itemref idref="c1"/></spine></package>'
    )
    container = (
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="pkg.opf"'
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("META-INF/container.xml", container)
        z.writestr("pkg.opf", opf)
        z.writestr("my chapter.xhtml", "<h1>T</h1><p>body</p>")
    doc = parse_epub_bytes(buf.getvalue())
    assert doc["chapters"][0]["paras"] == ["body"]


def test_bare_angle_brackets_html5_faithful():
    """Tag stripping follows HTML5 tokenization: '<' + ASCII letter
    starts a tag (so '<n and j>' IS a tag, as in every browser), while
    '<' before space/digit/'=' is literal text and must survive."""
    from pdf_to_epub_spark.sources.epub import _clean

    assert _clean("valid for i < n and j > k") == "valid for i < n and j > k"
    assert _clean("i<3 you; a<=b") == "i<3 you; a<=b"
    assert _clean("valid for i<n and j>k") == "valid for ik"  # browser-alike
    assert _clean("a <em>b</em> <!-- note --> c") == "a b c"


def test_zip_bomb_member_is_unsupported():
    """A member inflating past the read cap yields UnsupportedEpub (a
    marker row on the Spark path), never an unbounded allocation."""
    import pdf_to_epub_spark.sources.epub as epub_mod

    container = (
        '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
        '<rootfiles><rootfile full-path="pkg.opf"'
        ' media-type="application/oebps-package+xml"/></rootfiles>'
        "</container>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("META-INF/container.xml", container)
        z.writestr("pkg.opf", b"\x00" * (4 << 20))  # highly compressible
    old = epub_mod._MAX_MEMBER_BYTES
    epub_mod._MAX_MEMBER_BYTES = 1 << 20
    try:
        with pytest.raises(UnsupportedEpub, match="read cap"):
            parse_epub_bytes(buf.getvalue())
    finally:
        epub_mod._MAX_MEMBER_BYTES = old


def test_payloads_string_id_passthrough(spark):
    """A url-typed id column passes through under its own name and type
    (no hard-coded int64)."""
    good = epub_bytes(_make_blocks(), title="ok", url="u://ok")
    df = spark.createDataFrame(
        [("u://ok", bytearray(good)), ("u://bad", bytearray(b"nope"))],
        "url string, epub binary",
    )
    out = parse_epub_payloads(df, id_col="url").collect()
    assert {r.url for r in out} == {"u://ok", "u://bad"}
    assert all(isinstance(r.url, str) for r in out)
    assert [r.status for r in out if r.url == "u://bad"] == ["error"]
