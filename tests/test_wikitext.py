"""sources/wikitext.py — writer/parser round-trip, markup edge cases."""

from __future__ import annotations

from pdf_to_epub_spark.sources.wikitext import (
    doc_wiki_blocks,
    documents_as_wikitext,
    extract_wikitext_links,
    make_wikitext,
    parse_wikitext,
    parse_wikitext_payloads,
)

TOKS_200 = " ".join(f"tok{i}" for i in range(200))  # 7 chunks, 2 headings


def test_roundtrip_blocks():
    blocks, _ = parse_wikitext(make_wikitext(5, TOKS_200))
    assert blocks == doc_wiki_blocks(5, TOKS_200)
    types = [t for t, _ in blocks]
    assert types.count("h2") == 1 and types.count("h3") == 1
    assert types.count("para") == 7


def test_empty_doc_yields_opening_heading():
    assert parse_wikitext(make_wikitext(1, ""))[0] == [
        ("h2", "Heading 1.0")
    ]


def test_link_extraction_targets_and_anchors():
    _, links = parse_wikitext(make_wikitext(2, TOKS_200))
    # chunk 0: plain links at i%11==0 → tok0, tok11, tok22
    assert links[0] == ("tok0", "tok0")
    # piped at i%11==5 → target prefixed
    assert ("T:tok5", "tok5") in links
    # all anchors are bare tokens (no markup leakage)
    assert all("[" not in a and "|" not in a for _, a in links)


def test_nested_templates_strip_to_fixpoint():
    blocks, _ = parse_wikitext("one {{outer|{{inner|x=1}}|y=2}} two")
    assert blocks == [("para", "one two")]


def test_self_closing_and_spanning_refs():
    raw = "a <ref name=x/> b <ref>dropped {{tmpl}} text</ref> c"
    blocks, _ = parse_wikitext(raw)
    assert blocks == [("para", "a b c")]


def test_heading_levels_and_bait():
    blocks, _ = parse_wikitext("== Two ==\n\n=== Three ===\n\n==== Four ====")
    assert blocks == [("h2", "Two"), ("h3", "Three"), ("h4", "Four")]
    # a '== x' without the closing run is a paragraph, not a heading
    blocks, _ = parse_wikitext("== not closed")
    assert blocks == [("para", "== not closed")]


def test_emphasis_quotes_removed_content_kept():
    blocks, _ = parse_wikitext("'''bold''' and ''italic'' words")
    assert blocks == [("para", "bold and italic words")]


def test_spark_operators_roundtrip(spark):
    docs = spark.createDataFrame(
        [(1, TOKS_200), (2, None)], "doc_id long, text string"
    )
    wiki = documents_as_wikitext(docs)
    blocks = parse_wikitext_payloads(wiki).collect()
    got = [
        (r.block_type, r.text)
        for r in sorted(
            (r for r in blocks if r.doc_id == 1),
            key=lambda r: r.block_id,
        )
    ]
    assert got == doc_wiki_blocks(1, TOKS_200)
    # None text → single opening heading
    assert [(r.block_type, r.text) for r in blocks if r.doc_id == 2] == [
        ("h2", "Heading 2.0")
    ]
    links = extract_wikitext_links(wiki)
    assert links.where("doc_id = 1").count() > 0
    assert links.columns == ["doc_id", "link_id", "target", "anchor"]
