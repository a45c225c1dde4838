"""PDF source (sources/pdf.py): writer/parser round-trips, xref-driven
object lookup, text-operator coverage, reading-order reconstruction, and
the honest unsupported path."""

from __future__ import annotations

import re
import zlib

import pytest

from pdf_to_epub_spark.sources.pdf import (
    LINES_PER_PAGE,
    WORDS_PER_LINE,
    UnsupportedPdf,
    blocks_in_reading_order,
    doc_to_pdf,
    documents_as_pdfs,
    extract_pdf_blocks,
    make_pdf_bytes,
    parse_pdf_payloads,
)

PAGES = [
    [(72.0, 720.0, 18.0, "Title (with) parens \\ and backslash"),
     (72.0, 680.0, 11.0, "body one")],
    [(72.0, 720.0, 11.0, "second page"), (200.0, 720.0, 11.0, "right block")],
]


def test_writer_parser_roundtrip():
    raw = make_pdf_bytes(PAGES)
    assert raw.startswith(b"%PDF-1.4")
    got = extract_pdf_blocks(raw)
    expected = [
        (pi, x, y, s, t)
        for pi, blocks in enumerate(PAGES)
        for (x, y, s, t) in blocks
    ]
    assert got == expected


def test_xref_is_the_lookup_path():
    """The parser must resolve objects through the xref table — offsets in
    the table are authoritative.  Corrupting startxref forces the scan
    fallback, which must still parse (same result)."""
    raw = make_pdf_bytes(PAGES)
    ref = extract_pdf_blocks(raw)
    broken = raw.replace(b"startxref", b"startxrfX")
    assert extract_pdf_blocks(broken) == ref


def test_stream_bytes_ending_in_newline_survive():
    """/Length-exact stream extents: a compressed stream whose last byte
    is 0x0A must not be EOL-trimmed (a rstrip-based parser corrupts it)."""
    for seed in range(200):
        text = "word%d " % seed * (seed % 37 + 1)
        raw = make_pdf_bytes([[(72.0, 720.0, 11.0, text.strip())]])
        got = extract_pdf_blocks(raw)
        assert got == [(0, 72.0, 720.0, 11.0, text.strip())]


def test_tj_array_and_hex_strings_parse():
    content = (
        b"BT /F1 12 Tf 10 700 Td [(he) -20 (llo)] TJ ET\n"
        b"BT /F1 9 Tf 1 0 0 1 50 600 Tm <776f726c64> Tj ET\n"
        b"BT /F1 9 Tf 10 500 Td (a) Tj 0 -40 Td (b) Tj ET\n"
    )
    stream = zlib.compress(content)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(stream)
        + stream + b"\nendstream\nendobj\n"
    )
    got = extract_pdf_blocks(body)  # no xref: exercises the scan fallback
    assert got == [
        (0, 10.0, 700.0, 12.0, "hello"),
        (0, 50.0, 600.0, 9.0, "world"),
        (0, 10.0, 500.0, 9.0, "a"),
        (0, 10.0, 460.0, 9.0, "b"),  # relative Td accumulates
    ]


def test_unsupported_paths():
    with pytest.raises(UnsupportedPdf):
        extract_pdf_blocks(b"not a pdf at all")
    raw = make_pdf_bytes(PAGES)
    with pytest.raises(UnsupportedPdf):
        extract_pdf_blocks(raw + b"<< /Encrypt 9 0 R >>")
    lzw = raw.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(UnsupportedPdf):
        extract_pdf_blocks(lzw)


def test_doc_mapping_scrambles_content_order():
    """doc_to_pdf must emit blocks in non-reading content order for at
    least some docs — otherwise the reading-order stage is untested."""
    scrambled = 0
    for doc_id in range(20):
        text = " ".join("w%d" % i for i in range(40))
        raw = doc_to_pdf(doc_id, text)
        content_order = [t for _, _, _, _, t in extract_pdf_blocks(raw)]
        reading = sorted(
            extract_pdf_blocks(raw), key=lambda b: (b[0], -b[2], b[1])
        )
        if content_order != [t for _, _, _, _, t in reading]:
            scrambled += 1
    assert scrambled > 10


def test_spark_roundtrip_reading_order_and_classification(spark):
    rows = [
        (0, ("alpha beta gamma " * 20).strip()),
        (1, ""),
        (2, "one two"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    blocks = blocks_in_reading_order(parse_pdf_payloads(documents_as_pdfs(docs)))
    got = blocks.select("doc_id", "block_id", "page", "block_type", "text").collect()
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["block_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: 60 words -> 8 lines + title = 9 blocks over 2 pages
    d0 = by_doc[0]
    assert len(d0) == 9
    assert d0[0]["block_type"] == "heading" and d0[0]["text"] == "Document 0"
    assert all(r["block_type"] == "paragraph" for r in d0[1:])
    assert [r["page"] for r in d0] == [0] * LINES_PER_PAGE + [1] * 3
    joined = " ".join(r["text"] for r in d0[1:])
    assert joined == rows[0][1].strip()
    # empty doc: title only
    assert [r["text"] for r in by_doc[1]] == ["Document 1"]
    assert [r["text"] for r in by_doc[2]] == ["Document 2", "one two"]


def test_spark_unsupported_payload_isolated(spark):
    docs = spark.createDataFrame(
        [(0, bytearray(b"%PDF-1.4 garbage with no objects"))],
        "doc_id long, pdf binary",
    )
    got = parse_pdf_payloads(docs).collect()
    assert len(got) == 1 and got[0]["status"] == "unsupported"
    assert got[0]["text"] is None


def test_constants_match_entry_oracle():
    import __spark_entry__ as e

    assert e._PDF_WPL == WORDS_PER_LINE
    assert e._PDF_LPP == LINES_PER_PAGE


def test_parse_plan_is_narrow(spark):
    """The parse stage must be a single narrow mapInArrow pass — no
    shuffle before the reading-order window's one exchange."""
    docs = spark.createDataFrame(
        [(i, "w " * 50) for i in range(10)], "doc_id long, text string"
    )
    blocks = blocks_in_reading_order(parse_pdf_payloads(documents_as_pdfs(docs)))
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:3000]
    assert len(re.findall(r"\bArrowEvalPython|\bMapInArrow|\bPythonMapInArrow", plan)) >= 2


def test_contents_array_concatenation():
    """/Contents as an ARRAY of stream refs is one logical stream: Tf/Td
    state carries across the boundary and blocks appear in array order."""
    s1 = zlib.compress(b"BT /F1 12 Tf 10 700 Td (first) Tj ET\nBT /F1 9 Tf 10 660 Td ")
    s2 = zlib.compress(b"(second) Tj ET\n")
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(s1)
        + s1 + b"\nendstream\nendobj\n"
        + b"5 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(s2)
        + s2 + b"\nendstream\nendobj\n"
    )
    got = extract_pdf_blocks(body)
    assert got == [
        (0, 10.0, 700.0, 12.0, "first"),
        (0, 10.0, 660.0, 9.0, "second"),  # size/pos set in stream 1
    ]


def test_parser_never_crashes_on_garbage():
    """Any mutation of a valid PDF must either parse (possibly partially)
    or raise UnsupportedPdf — never any other exception (the Spark stage
    maps UnsupportedPdf to an isolated row)."""
    import random

    base = make_pdf_bytes(PAGES)
    for seed in range(150):
        rng = random.Random(seed)
        raw = bytearray(base)
        mode = seed % 4
        if mode == 0:      # truncate
            raw = raw[: rng.randint(0, len(raw))]
        elif mode == 1:    # flip bytes
            for _ in range(rng.randint(1, 12)):
                raw[rng.randrange(len(raw))] = rng.getrandbits(8)
        elif mode == 2:    # splice random garbage
            at = rng.randrange(len(raw))
            raw = raw[:at] + bytes(rng.getrandbits(8) for _ in range(64)) + raw[at:]
        else:              # pure noise with a pdf-ish header
            raw = bytearray(b"%PDF-1.4\n") + bytearray(
                rng.getrandbits(8) for _ in range(rng.randint(0, 600))
            )
        try:
            extract_pdf_blocks(bytes(raw))
        except UnsupportedPdf:
            pass


def test_unicode_utf16_string_form_roundtrip():
    """Non-latin text rides the spec's BOM-prefixed UTF-16BE hex string
    form and round-trips exactly (bullets, CJK, accents)."""
    pages = [[(72.0, 720.0, 11.0, "Prêt • 中文 (mix) déjà")]]
    got = extract_pdf_blocks(make_pdf_bytes(pages))
    assert got == [(0, 72.0, 720.0, 11.0, "Prêt • 中文 (mix) déjà")]


def test_indirect_length_falls_back_to_endstream():
    """'/Length 9 0 R' is an OBJECT REFERENCE, not a byte count: treating
    it as one truncates the stream.  The parser must fall back to the
    endstream scan and still decode."""
    raw = make_pdf_bytes(PAGES)
    ref = extract_pdf_blocks(raw)
    mutated = re.sub(rb"/Length \d+", b"/Length 99 0 R", raw)
    # xref offsets shift with the edit, so force the scan path too
    mutated = mutated.replace(b"startxref", b"startxrfX")
    assert extract_pdf_blocks(mutated) == ref


def test_malformed_operand_skips_op_not_task():
    """'BT (a) 5 Td (x) Tj ET' has a string where Td expects a number —
    the op must be skipped (position unchanged), never a ValueError out
    of the Spark worker."""
    content = b"BT /F1 9 Tf 10 500 Td (ok) Tj (a) 5 Td (x) Tj ET"
    stream = zlib.compress(content)
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + b"4 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(stream)
        + stream + b"\nendstream\nendobj\n"
    )
    got = extract_pdf_blocks(body)
    assert [t for *_, t in got] == ["ok", "x"]


def test_blank_pdf_emits_empty_marker_row(spark):
    """A valid PDF with no text must surface as a status='empty' row, not
    silently vanish from the output (doc accounting at scale)."""
    blank = make_pdf_bytes([[]])
    docs = spark.createDataFrame(
        [(0, bytearray(blank)), (1, bytearray(b"junk"))],
        "doc_id long, pdf binary",
    )
    got = {r["doc_id"]: r["status"] for r in parse_pdf_payloads(docs).collect()}
    assert got == {0: "empty", 1: "unsupported"}


def test_coordinate_ties_break_by_content_order(spark):
    """Two shows at one position (Tj Tj, no move between) must get
    deterministic block_ids in content order — matching the Python-side
    stable sort."""
    pages = [[(72.0, 700.0, 11.0, "first"), (72.0, 700.0, 11.0, "second")]]
    raw = make_pdf_bytes(pages)
    docs = spark.createDataFrame([(0, bytearray(raw))], "doc_id long, pdf binary")
    ordered = blocks_in_reading_order(parse_pdf_payloads(docs))
    got = [r["text"] for r in ordered.orderBy("block_id").collect()]
    assert got == ["first", "second"]


def test_outline_roundtrip_and_backcompat():
    from pdf_to_epub_spark.sources.pdf import (
        _doc_pages, doc_outline, doc_to_pdf, extract_pdf_blocks,
        extract_pdf_outline, make_pdf_bytes)

    text = " ".join(f"w{i}" for i in range(200))
    # no outline: parser returns [], blocks unchanged
    plain = doc_to_pdf(7, text)
    assert extract_pdf_outline(plain) == []
    ol = doc_outline(7, text)
    raw = make_pdf_bytes(_doc_pages(7, text), ol)
    assert extract_pdf_outline(raw) == ol
    # attaching an outline does not perturb text extraction
    assert extract_pdf_blocks(raw) == extract_pdf_blocks(plain)


def test_outline_nesting_unicode_and_level_jumps():
    from pdf_to_epub_spark.sources.pdf import (
        extract_pdf_outline, make_pdf_bytes)

    pages = [[(72.0, 700.0, 11.0, "x")] for _ in range(4)]
    tricky = [
        (0, "Räksmörgås — 中文", 0),    # UTF-16BE hex title
        (1, "a", 1),
        (2, "b", 2),
        (2, "c (paren) \\ back", 3),    # escaped literal
        (0, "z", 3),                     # level drop back to root
    ]
    assert extract_pdf_outline(make_pdf_bytes(pages, tricky)) == tricky


def test_outline_cycle_and_bad_dest_are_survivable():
    import re
    from pdf_to_epub_spark.sources.pdf import (
        extract_pdf_outline, make_pdf_bytes)

    pages = [[(72.0, 700.0, 11.0, "x")]]
    raw = make_pdf_bytes(pages, [(0, "a", 0), (0, "b", 0)])
    # corrupt item b's /Next to point back at item a -> cycle must stop
    # items are objects 6 (root), 7 (a), 8 (b) for a 1-page doc
    looped = raw.replace(
        b"/Parent 6 0 R /Dest [3 0 R /XYZ 0 792 0] /Prev 7 0 R >>",
        b"/Parent 6 0 R /Dest [3 0 R /XYZ 0 792 0] /Prev 7 0 R /Next 7 0 R >>",
    )
    assert looped != raw
    got = extract_pdf_outline(looped)
    assert [t for _l, t, _p in got] == ["a", "b"]
    # a dest pointing at a non-page object id -> page None, no crash
    bad = re.sub(rb"/Dest \[3 0 R", rb"/Dest [99 0 R", raw, count=1)
    got2 = extract_pdf_outline(bad)
    assert got2[0][2] is None and got2[1][2] == 0


def test_parse_pdf_outlines_marker_rows(spark):
    from pdf_to_epub_spark.sources.pdf import (
        doc_to_pdf, make_pdf_bytes, parse_pdf_outlines)

    pages = [[(72.0, 700.0, 11.0, "x")]]
    ok = make_pdf_bytes(pages, [(0, "a", 0)])
    rows = spark.createDataFrame(
        [
            (1, bytearray(ok)),
            (2, bytearray(doc_to_pdf(2, "no outline here"))),
            (3, bytearray(b"not a pdf at all")),
            (4, None),
        ],
        "doc_id long, pdf binary",
    )
    got = {r["doc_id"]: r for r in parse_pdf_outlines(rows).collect()}
    assert got[1]["status"] == "ok" and got[1]["title"] == "a"
    assert got[2]["status"] == "none"
    assert got[3]["status"] == "unsupported"
    assert got[4]["status"] == "unsupported"


def test_pdf_chapters_ranges_and_level_filter(spark):
    from pdf_to_epub_spark.operators import pdf_chapters

    outline = spark.createDataFrame(
        [
            (1, 0, 0, "Doc", 0, "ok"),
            (1, 1, 1, "Part 1", 1, "ok"),
            (1, 2, 2, "Detail", 1, "ok"),   # level 2: not a chapter
            (1, 3, 1, "Part 3", 3, "ok"),
            (2, None, None, None, None, "none"),  # marker row ignored
        ],
        "doc_id long, seq int, level int, title string, page int, status string",
    )
    blocks = spark.createDataFrame(
        [(1, p, "x" * (p + 1), "ok") for p in range(5)]
        + [(1, None, None, "error")],
        "doc_id long, page int, text string, status string",
    )
    got = {r["chapter_seq"]: r for r in
           pdf_chapters(outline, blocks).collect()}
    assert set(got) == {0, 1, 3}
    assert (got[0]["first_page"], got[0]["last_page"]) == (0, 0)
    assert (got[1]["first_page"], got[1]["last_page"]) == (1, 2)
    # final chapter closed by the document's max block page
    assert (got[3]["first_page"], got[3]["last_page"]) == (3, 4)
    assert got[1]["n_blocks"] == 2 and got[1]["n_chars"] == 2 + 3
    assert got[3]["n_chars"] == 4 + 5
