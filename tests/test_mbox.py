"""sources/mbox.py — thread writer/parser, quote/signature/escape rules."""

from __future__ import annotations

from pdf_to_epub_spark.sources.mbox import (
    documents_as_mbox,
    expected_messages,
    make_mbox,
    parse_mbox,
    parse_mbox_payloads,
)

TOKS_130 = " ".join(f"tk{i}" for i in range(130))  # 3 messages


def test_roundtrip_thread():
    got = parse_mbox(make_mbox(3, TOKS_130))
    assert got == expected_messages(3, TOKS_130)
    assert len(got) == 3
    assert got[0][0] == "Thread 3" and got[1][0] == "Re: Thread 3"
    # replies count exactly their one quoted line
    assert [q for _, q, _ in got] == [0, 1, 1]


def test_from_escape_roundtrips():
    raw = make_mbox(1, "alpha beta")
    # the writer must escape the opener …
    assert "\n>From the desk of user 0\n" in raw
    body = parse_mbox(raw)[0][2]
    # … and the parser must restore it
    assert body.splitlines()[0] == "From the desk of user 0"
    assert ">From" not in body


def test_signature_and_quotes_stripped():
    raw = make_mbox(2, " ".join(f"x{i}" for i in range(60)))
    for _, _, body in parse_mbox(raw):
        assert "-- " not in body
        assert "example.invalid" not in body
        assert not any(line.startswith(">") for line in body.splitlines())


def test_handcrafted_edge_cases():
    raw = (
        "From alice@example.invalid Thu Jan  1 00:00:00 1970\n"
        "Subject: hello\n"
        "X-Other: ignored\n"
        "\n"
        "real content\n"
        "> quoted one\n"
        "> quoted two\n"
        ">From escaped line\n"
        "-- \n"
        "sig line that must vanish\n"
    )
    msgs = parse_mbox(raw)
    assert msgs == [("hello", 2, "real content\nFrom escaped line")]


def test_headers_without_blank_line_yield_empty_body():
    raw = "From bob@example.invalid Thu Jan  1 00:00:00 1970\nSubject: s\n"
    assert parse_mbox(raw) == [("s", 0, "")]


def test_spark_operator(spark):
    docs = spark.createDataFrame(
        [(1, TOKS_130), (2, None)], "doc_id long, text string"
    )
    rows = parse_mbox_payloads(documents_as_mbox(docs)).collect()
    d1 = sorted((r for r in rows if r.doc_id == 1), key=lambda r: r.msg_id)
    assert [(r.subject, r.n_quoted, r.body) for r in d1] == expected_messages(
        1, TOKS_130
    )
    # None text → single-message thread with just the opener
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].body == "From the desk of user 0"
