"""sources/sedump.py — Posts.xml writer/parser, double-escape, Q&A argmax."""

from __future__ import annotations

from pdf_to_epub_spark.sources.sedump import (
    _score,
    documents_as_sedump,
    expected_posts,
    make_sedump,
    parse_sedump,
    parse_sedump_payloads,
    qa_best_answer_pairs,
)

TOKS_130 = " ".join(f"tk{i}" for i in range(130))  # 4 posts: q + 3 answers


def test_roundtrip_posts():
    got = parse_sedump(make_sedump(3, TOKS_130))
    assert got == expected_posts(3, TOKS_130)
    assert len(got) == 4
    assert got[0][1] == 1 and all(r[1] == 2 for r in got[1:])
    # answers all point at the question
    assert all(r[2] == 1 for r in got[1:])


def test_double_escape_roundtrips():
    raw = make_sedump(1, "alpha beta")
    # attribute layer: the HTML entity itself is escaped once more
    assert "&amp;amp;" in raw and "&amp;lt;" in raw
    body = parse_sedump(raw)[0][6]
    assert body.splitlines()[0] == 'A & B <c> "0"'


def test_accepted_answer_is_argmax():
    for doc_id in range(7):
        posts = expected_posts(doc_id, TOKS_130)
        accepted = posts[0][3]
        answers = posts[1:]
        best = max(answers, key=lambda r: (r[4], -r[0]))
        assert accepted == best[0]
        # tiebreak: no earlier answer shares the winning score
        for r in answers:
            if r[0] < best[0]:
                assert r[4] < best[4]


def test_min_two_posts_on_empty_text():
    got = parse_sedump(make_sedump(9, ""))
    assert len(got) == 2
    assert got[0][1] == 1 and got[1][1] == 2
    assert got[1][6] == 'A & B <c> "1"'


def test_handcrafted_foreign_dump():
    raw = (
        '<?xml version="1.0" encoding="utf-8"?>\n<posts>\n'
        '  <row Id="7" PostTypeId="1" Score="4" Title="T &amp; U"'
        ' Body="&lt;p&gt;x &amp;amp; y&lt;/p&gt;&lt;p&gt;z&lt;/p&gt;" />\n'
        '  <row Id="8" PostTypeId="2" ParentId="7" Score="-1" />\n'
        "</posts>\n"
    )
    got = parse_sedump(raw)
    assert got[0] == (7, 1, None, None, 4, "T & U", "x & y\nz")
    assert got[1] == (8, 2, 7, None, -1, None, "")


def test_spark_parse_and_pairs(spark):
    data = [(i, " ".join(f"w{i}x{j}" for j in range(17 * i))) for i in range(8)]
    data.append((99, None))
    d = spark.createDataFrame(data, "doc_id long, text string")
    posts = parse_sedump_payloads(documents_as_sedump(d))
    rows = {
        r["doc_id"]: r
        for r in posts.filter(posts.post_type == 1).collect()
    }
    for doc_id, text in data:
        exp = expected_posts(doc_id, text or "")
        got = rows[doc_id]
        assert (got["post_id"], got["accepted_id"], got["title"]) == (
            exp[0][0],
            exp[0][3],
            exp[0][5],
        )
        assert got["body"] == exp[0][6]

    pairs = qa_best_answer_pairs(posts)
    got_pairs = pairs.collect()
    assert len(got_pairs) == len(data)
    for r in got_pairs:
        assert r["is_accepted"] is True
        assert r["n_answers"] >= 1
        assert r["title"] == f"Question {r['doc_id']}"
        assert r["best_score"] == max(
            _score(r["doc_id"], m) for m in range(1, r["n_answers"] + 1)
        )


def test_multi_question_document_pairs_per_question(spark):
    # one document carrying TWO questions: the windows must key on
    # (doc_id, q_post_id), yielding one pair per question with
    # per-question n_answers — not one pair per document
    rows = [
        # (doc_id, post_id, post_type, parent_id, accepted_id, score, title, body)
        (1, 1, 1, None, 3, None, "Q one", "how one?"),
        (1, 2, 2, 1, None, 5, None, "ans 1a"),
        (1, 3, 2, 1, None, 9, None, "ans 1b"),
        (1, 5, 1, None, 6, None, "Q two", "how two?"),
        (1, 6, 2, 5, None, 2, None, "ans 2a"),
    ]
    posts = spark.createDataFrame(
        rows,
        "doc_id long, post_id int, post_type int, parent_id int,"
        " accepted_id int, score int, title string, body string",
    )
    pairs = {r["title"]: r for r in qa_best_answer_pairs(posts).collect()}
    assert set(pairs) == {"Q one", "Q two"}
    assert pairs["Q one"].response == "ans 1b"  # argmax score
    assert pairs["Q one"].n_answers == 2 and pairs["Q one"].best_score == 9
    assert pairs["Q two"].response == "ans 2a"
    assert pairs["Q two"].n_answers == 1
    assert pairs["Q one"].is_accepted and pairs["Q two"].is_accepted
